"""Missing-vs-null parity for static columns: the reference document is a
mutable map where `ctx.f = null` leaves the key PRESENT (containsKey true)
while `ctx.remove('f')` deletes it (IngestDuplexMarshaller.java:144-152).
The flat-column engine tracks explicit-null writes per row in the
``__nullset`` registry; these tests pin the observable ES behaviors."""

from tests.conftest import run_one


def test_script_null_write_makes_field_present(spark, registry):
    out = run_one(spark, registry, [
        {"script": {"source": "ctx.x = null;", "if": "ctx.id == 1"}},
        {"set": {"field": "hasx", "value": "Y",
                 "if": "ctx.containsKey('x')"}},
    ], [(1, "a"), (2, None)], "id long, other string")
    by = {r["id"]: r.get("hasx") for r in out}
    # row 1: explicit null -> present; row 2: never written -> missing
    assert by == {1: "Y", 2: None}


def test_remove_succeeds_on_explicit_null_fails_on_missing(spark, registry):
    out = run_one(spark, registry, [
        {"script": {"source": "ctx.x = null;", "if": "ctx.id == 1"}},
        {"remove": {"field": "x"}},
    ], [(1, "a", "v"), (2, "b", None)], "id long, other string, x string")
    by = {r["id"]: (r.get("tags") or []) for r in out}
    assert by[1] == []                      # present-null: removable
    assert "_ingest_pipeline_failure" in by[2]  # missing: remove fails


def test_interpreter_null_vs_remove_containskey(spark, registry):
    out = run_one(spark, registry, [
        {"script": {"source":
                    "for (int i=0;i<1;i++){} "
                    "if (ctx.id == 1) { ctx.x = null; } "
                    "else { ctx.remove('x'); } "
                    "ctx.chk = ctx.containsKey('x') ? 'has' : 'no';"}},
    ], [(1, "v1"), (2, "v2")], "id long, x string")
    assert sorted((r["id"], r["chk"]) for r in out) == [(1, "has"),
                                                        (2, "no")]


def test_nullset_crosses_processors_into_interpreter(spark, registry):
    """A compiled-engine null write is visible to a LATER interpreter
    script's containsKey through the shipped __nullset registry."""
    out = run_one(spark, registry, [
        {"script": {"source": "ctx.x = null;", "if": "ctx.id == 1"}},
        {"script": {"source":
                    "for (int i=0;i<1;i++){} "
                    "ctx.chk = ctx.containsKey('x') ? 'has' : 'no';"}},
    ], [(1, "seed1"), (2, "seed2")], "id long, other string")
    assert sorted((r["id"], r["chk"]) for r in out) == [(1, "has"),
                                                        (2, "no")]


def test_remove_clears_present_null_status(spark, registry):
    out = run_one(spark, registry, [
        {"script": {"source": "ctx.x = null;"}},
        {"remove": {"field": "x"}},
        {"set": {"field": "hasx", "value": "Y",
                 "if": "ctx.containsKey('x')"}},
    ], [(1, "v")], "id long, x string")
    assert out[0].get("hasx") is None


def test_set_copy_from_null_marks_present(spark, registry):
    out = run_one(spark, registry, [
        {"set": {"field": "dst", "copy_from": "maybe"}},
        {"set": {"field": "hasdst", "value": "Y",
                 "if": "ctx.containsKey('dst')"}},
    ], [(1, None), (2, "v")], "id long, maybe string")
    by = {r["id"]: r.get("hasdst") for r in out}
    # both rows SET dst (null and 'v') -> both present per ES SetProcessor
    assert by == {1: "Y", 2: "Y"}


def test_null_literal_write_keeps_column_type(spark, registry):
    """`ctx.x = null` on some rows must not degrade the column to VOID or
    wipe inactive rows' values (regression: coerce_old NullType guard)."""
    out = run_one(spark, registry, [
        {"script": {"source": "ctx.x = null;", "if": "ctx.id == 1"}},
    ], [(1, "gone"), (2, "kept")], "id long, x string")
    by = {r["id"]: r["x"] for r in out}
    assert by == {1: None, 2: "kept"}
