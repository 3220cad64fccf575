"""Physical-plan regression guards: the compiled pipeline must stay a
narrow, JVM-only projection (the whole performance story at 100 TB).
These fail if a change reintroduces Python row processing or a shuffle
into the parse/route path."""

from pyspark.sql import functions as F

from logstash_filter_elastic_integration_spark.flagship import (
    build_router, with_datastream)
from logstash_filter_elastic_integration_spark.sources.datagen import transcripts


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_flagship_plan_is_narrow_jvm_only(spark, tmp_path):
    src = str(tmp_path / "t")
    transcripts(spark, 500).write.parquet(src)
    tdf = spark.read.parquet(src)
    out = build_router(spark).execute(with_datastream(tdf))
    plan = _executed_plan(out)
    # no Python execution nodes: grok lowered to JVM regex
    assert "EvalPython" not in plan
    # no shuffle: broadcast joins only (BroadcastExchange is fine)
    import re
    shuffles = re.findall(r"Exchange (?!.*broadcast)", plan.replace(
        "BroadcastExchange", "BCX"))
    assert "ShuffleExchange" not in plan
    assert plan.count("Exchange") == plan.count("BCX") if "BCX" in plan else True
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_sink_counts_is_partial_final_hash_agg(spark, tmp_path):
    src = str(tmp_path / "t2")
    transcripts(spark, 500).write.parquet(src)
    tdf = spark.read.parquet(src)
    router = build_router(spark)
    out = router.execute(with_datastream(tdf))
    plan = _executed_plan(router.sink_counts(out))
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert "SortAggregate" not in plan


def test_scan_prunes_columns(spark, tmp_path):
    """Column pruning reaches the parquet scan for a projecting query."""
    src = str(tmp_path / "t3")
    transcripts(spark, 500).write.parquet(src)
    df = spark.read.parquet(src).select("conv_id").filter(
        F.col("conv_id") == "conv-00000000")
    plan = _executed_plan(df)
    assert "ReadSchema: struct<conv_id:string>" in plan
    assert "PushedFilters: [IsNotNull(conv_id), EqualTo(conv_id" in plan
