from logstash_filter_elastic_integration_spark.engine import SparkIngestFilter


def test_sprintf_template_resolution_and_none_bypass(spark):
    eng = SparkIngestFilter(
        pipelines={"svc-a": {"processors": [
            {"set": {"field": "handled", "value": "a"}}]}},
        pipeline_name="svc-%{[service]}")
    df = spark.createDataFrame(
        [("a", "x"), ("b", "y"), (None, "z")], "service string, payload string")
    out = {r["payload"]: r.asDict() for r in eng.filter(df).collect()}
    assert out["x"]["handled"] == "a"
    # resolved to unregistered 'svc-b' -> passthrough (template path does
    # not hard-fail; the reference skips unresolvable pipelines)
    assert out["y"]["handled"] is None
    assert (out["y"]["tags"] or []) == []
    # unresolved field -> skip
    assert out["z"]["handled"] is None


def test_directory_registration(spark, tmp_path):
    (tmp_path / "p1.json").write_text(
        '{"processors": [{"set": {"field": "via", "value": "dir"}}]}')
    eng = SparkIngestFilter(pipelines=str(tmp_path),
                            routing={"logs-x-default": "p1"})
    df = spark.createDataFrame([("logs-x-default",)], "_index string")
    r = eng.filter(df).collect()[0]
    assert r["via"] == "dir"
    assert r["__sink"] == "logs-x-default"
