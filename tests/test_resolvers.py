"""Event->pipeline-name override resolvers: sprintf templates and
field-value resolution (SprintfTemplateEventToPipelineNameResolver.java:
32-60 + its test matrix; FieldValueEventToPipelineNameResolver.java).
The override bypasses index-based routing; unresolvable rows pass through
unmodified (EventProcessor.java:128-132)."""

from logstash_filter_elastic_integration_spark.plans import PipelineRegistry
from logstash_filter_elastic_integration_spark.router import Router


def _registry():
    reg = PipelineRegistry()
    reg.register("always", {"processors": [
        {"set": {"field": "mark", "value": "always-ran"}}]})
    reg.register("this-TTHHAATT-thang", {"processors": [
        {"set": {"field": "mark", "value": "template-ran"}}]})
    reg.register("from-field", {"processors": [
        {"set": {"field": "mark", "value": "field-ran"}}]})
    return reg


def test_sprintf_constant(spark):
    """from("always"): no %{ -> constant resolver."""
    router = Router(_registry(), routing={}, pipeline_name="always")
    df = spark.createDataFrame([("x",)], "msg string")
    rows = [r.asDict() for r in router.execute(df).collect()]
    assert rows[0]["mark"] == "always-ran"


def test_sprintf_fully_resolved(spark):
    """this-%{that}-%{[another][thing]} with both fields set."""
    router = Router(_registry(), routing={},
                    pipeline_name="this-%{that}-%{[another][thing]}")
    df = spark.createDataFrame([("TTHHAATT", "thang")],
                               "that string, `another.thing` string")
    rows = [r.asDict() for r in router.execute(df).collect()]
    assert rows[0]["mark"] == "template-ran"


def test_sprintf_partially_resolved_passes_through(spark):
    """A template referencing a missing field resolves empty -> the event
    passes through unmodified (no pipeline, no failure)."""
    router = Router(_registry(), routing={},
                    pipeline_name="this-%{that}-%{[another][thing]}")
    df = spark.createDataFrame([("TTHHAATT",)], "that string")
    rows = [r.asDict() for r in router.execute(df).collect()]
    assert rows[0].get("mark") is None
    assert (rows[0]["tags"] or []) == []


def test_sprintf_null_value_passes_through(spark):
    """A present column that is NULL on a row leaves the template
    unresolved for that row only."""
    router = Router(_registry(), routing={}, pipeline_name="%{p}")
    df = spark.createDataFrame(
        [("always", "a"), (None, "b")], "p string, msg string")
    rows = {r["msg"]: r.asDict() for r in router.execute(df).collect()}
    assert rows["a"]["mark"] == "always-ran"
    assert rows["b"].get("mark") is None


def test_field_value_resolver(spark):
    router = Router(_registry(), routing={}, pipeline_field="route_to")
    df = spark.createDataFrame(
        [("from-field", "a"), (None, "b")], "route_to string, msg string")
    rows = {r["msg"]: r.asDict() for r in router.execute(df).collect()}
    assert rows["a"]["mark"] == "field-ran"
    assert rows["b"].get("mark") is None


def test_override_resolving_to_unloaded_pipeline_fails_row(spark):
    """Override resolves to a name that isn't registered: reference emits
    the original event + 'pipeline not loaded' failure."""
    router = Router(_registry(), routing={}, pipeline_field="route_to")
    df = spark.createDataFrame([("nope-pipe", "a")],
                               "route_to string, msg string")
    rows = [r.asDict() for r in router.execute(df).collect()]
    assert "_ingest_pipeline_failure" in (rows[0]["tags"] or [])
