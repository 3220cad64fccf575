"""Pipeline-level matrices ported from the reference's SmokeTest
(/root/reference/src/test/java/.../SmokeTest.java) and its local fixture
pipelines (src/test/resources/.../{simple-mutate,nesting,reroute}-pipelines).
Fixtures are re-expressed inline (not copied) with the same semantics.
"""

import pytest
from pyspark.sql import functions as F

from logstash_filter_elastic_integration_spark.plans import (
    PipelineRegistry, run_pipeline)
from logstash_filter_elastic_integration_spark.router import Router


# --- simple-mutate matrix (SmokeTest.java:72-159) ---------------------------
SIMPLE_MUTATE = {
    "processors": [
        {"set": {"field": "my-long-field", "value": 10}},
        {"set": {"field": "nested.my-boolean-field", "value": True}},
        {"lowercase": {"field": "nested.field-to-lowercase", "ignore_missing": True}},
        {"remove": {"field": "required-field-to-remove", "ignore_missing": False}},
        {"remove": {"field": "nested.field-to-remove", "ignore_missing": True}},
    ]
}


@pytest.fixture()
def smreg():
    reg = PipelineRegistry()
    reg.register("simple-mutate", SIMPLE_MUTATE)
    return reg


def _collect(df):
    return [r.asDict(recursive=True) for r in df.collect()]


def test_simple_mutate_all_effects(spark, smreg):
    df = spark.createDataFrame(
        [("UPPER", "req", "gone")],
        "`nested.field-to-lowercase` string, `required-field-to-remove` string, "
        "`nested.field-to-remove` string")
    r = _collect(run_pipeline(df, "simple-mutate", smreg))[0]
    assert r["my-long-field"] == 10
    assert r["nested.my-boolean-field"] is True
    assert r["nested.field-to-lowercase"] == "upper"
    assert r["required-field-to-remove"] is None
    assert r["nested.field-to-remove"] is None
    assert r["target_ingest_pipeline"] == "_none"


def test_simple_mutate_failure_keeps_original(spark, smreg):
    # missing required-field-to-remove -> failure tag + ZERO partial
    # transforms (SmokeTest golden: original event preserved)
    df = spark.createDataFrame(
        [("UPPER", None, "gone")],
        "`nested.field-to-lowercase` string, `required-field-to-remove` string, "
        "`nested.field-to-remove` string")
    r = _collect(run_pipeline(df, "simple-mutate", smreg))[0]
    assert "_ingest_pipeline_failure" in r["tags"]
    assert r["my-long-field"] is None          # set did NOT leak
    assert r["nested.field-to-lowercase"] == "UPPER"
    assert r["nested.field-to-remove"] == "gone"
    assert r["_ingest_pipeline_failure"]["pipeline"] == "simple-mutate"


def test_simple_mutate_ignore_missing(spark, smreg):
    df = spark.createDataFrame(
        [(None, "req", None)],
        "`nested.field-to-lowercase` string, `required-field-to-remove` string, "
        "`nested.field-to-remove` string")
    r = _collect(run_pipeline(df, "simple-mutate", smreg))[0]
    assert r["my-long-field"] == 10
    assert (r["tags"] or []) == []


# --- nesting matrix (SmokeTest.java:162-238) --------------------------------
def nesting_registry():
    reg = PipelineRegistry()
    reg.register("inner", {"processors": [
        {"set": {"field": "handled-by-inner", "value": True}},
        {"pipeline": {"name": "outer{{ intentional_template_miss }}",
                      "if": "ctx?.recursive != null"}},
    ]})
    reg.register("outer", {"processors": [
        {"set": {"field": "handled-by-outer-init", "value": True}},
        {"pipeline": {"name": "inner"}},
        {"pipeline": {"name": "my-undefined-pipeline",
                      "ignore_missing_pipeline": True,
                      "if": "ctx?.ignore_missing"}},
        {"pipeline": {"name": "my-undefined-pipeline",
                      "ignore_missing_pipeline": False,
                      "if": "!(ctx?.ignore_missing)"}},
        {"set": {"field": "handled-by-outer-done", "value": True}},
    ]})
    return reg


def test_nesting_happy_path_with_ignored_missing(spark):
    reg = nesting_registry()
    df = spark.createDataFrame([(True, None)],
                               "ignore_missing boolean, recursive string")
    r = _collect(run_pipeline(df, "outer", reg))[0]
    assert r["handled-by-outer-init"] is True
    assert r["handled-by-inner"] is True
    assert r["handled-by-outer-done"] is True
    assert (r["tags"] or []) == []


def test_nesting_required_missing_pipeline_fails(spark):
    reg = nesting_registry()
    df = spark.createDataFrame([(False, None)],
                               "ignore_missing boolean, recursive string")
    r = _collect(run_pipeline(df, "outer", reg))[0]
    assert "_ingest_pipeline_failure" in r["tags"]
    assert "non-existent pipeline" in r["_ingest_pipeline_failure"]["message"]
    # originals preserved: no partial transform leak
    assert r["handled-by-outer-init"] is None


def test_nesting_recursion_cycle_fails(spark):
    reg = nesting_registry()
    # recursive != null routes inner -> outer{{miss}} -> 'outer' (on the
    # compile stack) -> per-row Cycle detected failure
    df = spark.createDataFrame([(True, "yes")],
                               "ignore_missing boolean, recursive string")
    r = _collect(run_pipeline(df, "outer", reg))[0]
    assert "_ingest_pipeline_failure" in r["tags"]
    assert "Cycle detected" in r["_ingest_pipeline_failure"]["message"]


# --- reroute matrix (SmokeTest.java:267-388) --------------------------------
def reroute_router():
    reg = PipelineRegistry()
    reg.register("logs-test-smoke-pipeline", {"processors": [
        {"set": {"field": "handled-by-root-init", "value": True}},
        {"reroute": {"destination": "none",
                     "if": "ctx?.id?.equals('reroute-hardcoded-none')"}},
        {"reroute": {"destination": "downstream",
                     "if": "ctx?.id?.equals('reroute-hardcoded-downstream')"}},
        {"reroute": {"dataset": "verify",
                     "if": "ctx?.id?.equals('reroute-dataset-verify')"}},
        {"reroute": {"dataset": "missing",
                     "if": "ctx?.id?.equals('reroute-dataset-missing')"}},
        {"reroute": {"namespace": "fire",
                     "if": "ctx?.id?.equals('reroute-namespace-fire')"}},
        {"reroute": {"namespace": "recursive",
                     "if": "ctx?.id?.equals('reroute-namespace-recursive')"}},
        {"set": {"field": "handled-by-root-done", "value": True}},
    ]})
    reg.register("downstream-pipeline", {"processors": [
        {"set": {"field": "handled-by-downstream-init", "value": True}},
        {"set": {"field": "handled-by-downstream-done", "value": True}},
    ]})
    reg.register("logs-verify-smoke-pipeline", {"processors": [
        {"set": {"field": "handled-by-logs-verify-smoke-init", "value": True}},
        {"set": {"field": "handled-by-logs-verify-smoke-done", "value": True}},
    ]})
    reg.register("logs-test-fire-pipeline", {"processors": [
        {"set": {"field": "handled-by-logs-test-fire-init", "value": True}},
        {"set": {"field": "handled-by-logs-test-fire-done", "value": True}},
    ]})
    reg.register("logs-test-recursive-pipeline", {"processors": [
        {"set": {"field": "handled-by-logs-test-recursion-init", "value": True}},
        {"reroute": {"namespace": "smoke"}},
        {"set": {"field": "handled-by-root-done2", "value": True}},
    ]})
    routing = {
        "logs-test-smoke": "logs-test-smoke-pipeline",
        "downstream": "downstream-pipeline",
        "logs-verify-smoke": "logs-verify-smoke-pipeline",
        "logs-test-fire": "logs-test-fire-pipeline",
        "logs-test-recursive": "logs-test-recursive-pipeline",
    }
    return Router(registry=reg, routing=routing, max_hops=3)


def _run_reroute(spark, event_id):
    router = reroute_router()
    df = spark.createDataFrame(
        [(event_id, "logs", "test", "smoke")],
        "id string, `data_stream.type` string, `data_stream.dataset` string, "
        "`data_stream.namespace` string")
    df = df.withColumn("_index", F.concat_ws("-", "`data_stream.type`",
                                             "`data_stream.dataset`",
                                             "`data_stream.namespace`"))
    return _collect(router.execute(df))[0]


def test_reroute_hardcoded_downstream(spark):
    r = _run_reroute(spark, "reroute-hardcoded-downstream")
    assert r["handled-by-root-init"] is True
    assert r["handled-by-root-done"] is None     # processors after reroute skipped
    assert r["handled-by-downstream-done"] is True
    assert r["__sink"] == "downstream"


def test_reroute_dataset_verify(spark):
    r = _run_reroute(spark, "reroute-dataset-verify")
    assert r["data_stream.dataset"] == "verify"
    assert r["__sink"] == "logs-verify-smoke"
    assert r["handled-by-logs-verify-smoke-done"] is True
    assert r["handled-by-root-done"] is None


def test_reroute_dataset_missing_passthrough(spark):
    # target index has no pipeline -> event lands unprocessed in that sink
    r = _run_reroute(spark, "reroute-dataset-missing")
    assert r["__sink"] == "logs-missing-smoke"
    assert (r["tags"] or []) == []


def test_reroute_namespace_fire(spark):
    r = _run_reroute(spark, "reroute-namespace-fire")
    assert r["__sink"] == "logs-test-fire"
    assert r["handled-by-logs-test-fire-done"] is True


def test_reroute_none_destination(spark):
    r = _run_reroute(spark, "reroute-hardcoded-none")
    assert r["__sink"] == "none"
    assert r["handled-by-root-done"] is None


def test_reroute_recursive_cycle_fails(spark):
    r = _run_reroute(spark, "reroute-namespace-recursive")
    assert "_ingest_pipeline_failure" in (r["tags"] or [])
    assert "cycle" in r["_ingest_pipeline_failure"]["message"].lower()


def test_no_reroute_plain(spark):
    r = _run_reroute(spark, "no-reroute")
    assert r["handled-by-root-init"] is True
    assert r["handled-by-root-done"] is True
    assert r["__sink"] == "logs-test-smoke"
