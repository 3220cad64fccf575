"""Focused pins for the r6 compile caches: every cache is PLAN-level
(lazy frames, keyed/gated by Catalyst sameResult) and never result-level.

- Router.execute returns the SAME compiled frame for a provably-identical
  input relation and a DIFFERENT one when the input changes;
- _pipe's compiled-pipeline cache hits on identical (spec, input) and
  misses when the processor spec changes;
- the pure-plan query memo wraps exactly the whitelisted builders —
  queries with data-derived driver work (ann_ivf training, the
  dedup_clusters convergence loop, dedup_ngram_jaccard's eager
  checkpoint/persist, stream_*) must stay unwrapped;
- a cache hit still RECOMPUTES on action: mutating the underlying data
  between actions changes the result of the cached frame.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from logstash_filter_elastic_integration_spark import queries as Q
from logstash_filter_elastic_integration_spark.plans.pipeline import (
    PipelineRegistry,
)
from logstash_filter_elastic_integration_spark.router import Router

SF = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def _mini_router():
    reg = PipelineRegistry()
    reg.register("p", {"processors": [
        {"set": {"field": "mark", "value": "x"}}]})
    return Router(registry=reg, routing={"logs-a-default": "p"})


def test_router_exec_cache_hits_on_same_plan(spark):
    r = _mini_router()
    df = spark.range(10).select(
        F.col("id"), F.lit("logs-a-default").alias("_index"))
    out1 = r.execute(df)
    out2 = r.execute(spark.range(10).select(
        F.col("id"), F.lit("logs-a-default").alias("_index")))
    assert out1 is out2  # sameResult plan -> compiled frame reused
    # a different input relation must NOT hit
    out3 = r.execute(spark.range(11).select(
        F.col("id"), F.lit("logs-a-default").alias("_index")))
    assert out3 is not out1
    assert out1.count() == 10 and out3.count() == 11


def test_router_exec_cache_holds_no_materialized_data(spark, tmp_path):
    """A cache hit is a PLAN reuse, not a result: the cached frame's plan
    still roots at the source scan (no InMemoryRelation / LogicalRDD
    snapshot), so every action recomputes from the source files."""
    p = str(tmp_path / "src")
    spark.range(5).withColumn("_index", F.lit("logs-a-default")) \
        .write.mode("overwrite").parquet(p)
    r = _mini_router()
    df1 = spark.read.parquet(p)
    out = r.execute(df1)
    assert out is r.execute(spark.read.parquet(p))  # hit
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "Relation" in plan and "parquet" in plan
    for snapshot_node in ("InMemoryRelation", "LogicalRDD",
                          "Scan ExistingRDD"):
        assert snapshot_node not in plan
    assert out.count() == 5


def test_pipe_cache_hit_and_spec_miss(spark):
    df = spark.range(7).select(F.col("id").cast("string").alias("v"))
    spec = [{"set": {"field": "m", "value": "a"}}]
    out1 = Q._pipe(spark, df, spec)
    out2 = Q._pipe(spark, df, [{"set": {"field": "m", "value": "a"}}])
    assert out1 is out2  # equal spec + sameResult input
    out3 = Q._pipe(spark, df, [{"set": {"field": "m", "value": "B"}}])
    assert out3 is not out1
    assert [r["m"] for r in out3.limit(1).collect()] == ["B"]


def test_pure_plan_memo_whitelist_is_exact():
    wrapped = {n for n, f in Q.QUERIES.items() if hasattr(f, "__wrapped__")}
    assert wrapped == set(Q._PURE_PLAN_TABLES)
    # data-derived builders must never be memoized
    for name in ("ann_ivf", "dedup_clusters", "dedup_ngram_jaccard",
                 "stream_window", "stream_dedup", "stream_flagship"):
        assert name not in wrapped


@pytest.mark.parametrize("name", ["dedup_simhash", "doc_quality"])
def test_pure_plan_memo_reuses_lazy_frame(spark, name):
    d1 = Q.QUERIES[name](spark, SF)
    d2 = Q.QUERIES[name](spark, SF)
    assert d1 is d2
    # the frame is lazy (an action still runs the full computation)
    assert d1.count() > 0
