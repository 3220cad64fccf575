"""Resumable batch runner: first run processes everything, second is a
no-op, and a partially-completed manifest resumes only pending files."""

from pyspark.sql import functions as F

from logstash_filter_elastic_integration_spark.flagship import (
    build_router, with_datastream)
from logstash_filter_elastic_integration_spark.jobs import run_batch
from logstash_filter_elastic_integration_spark.sources.checkpoint import (
    CheckpointManifest)
from logstash_filter_elastic_integration_spark.sources.datagen import transcripts


def test_run_batch_and_resume(spark, tmp_path):
    src = str(tmp_path / "in")
    transcripts(spark, 2000).repartition(4).write.parquet(src)
    router = build_router(spark)
    wh, run = str(tmp_path / "wh"), str(tmp_path / "run")

    r1 = run_batch(spark, router, src, wh, run, prepare_df=with_datastream)
    assert r1["status"] == "ok" and r1["files"] == 4
    total_after_full = spark.read.parquet(wh + "/sinks").count()
    assert total_after_full > 0

    r2 = run_batch(spark, router, src, wh, run, prepare_df=with_datastream)
    assert r2["status"] == "up-to-date"

    # simulate a partial run: forget two files, resume processes only them
    import json
    m = CheckpointManifest(run)
    entries = json.load(open(m.path))
    json.dump(entries[:2], open(m.path, "w"))
    r3 = run_batch(spark, router, src, wh, str(tmp_path / "run"),
                   prepare_df=with_datastream)
    assert r3["status"] == "ok" and r3["files"] == 2
    # the resumed run must not clobber output of the files already done
    # (ADVICE r1 high: plain overwrite lost them permanently): per-run
    # dynamic partition overwrite keeps totals exact, no loss and no dupes
    assert spark.read.parquet(wh + "/sinks").count() == total_after_full


def test_run_batch_incremental_appends(spark, tmp_path):
    """New input files arriving after a completed run land BESIDE the
    previous run's output; reprocessing the same files is idempotent."""
    src = str(tmp_path / "in")
    transcripts(spark, 1000).repartition(2).write.parquet(src)
    router = build_router(spark)
    wh, run = str(tmp_path / "wh"), str(tmp_path / "run")
    run_batch(spark, router, src, wh, run, prepare_df=with_datastream)
    n1 = spark.read.parquet(wh + "/sinks").count()

    # two more files arrive (disjoint conv ids so rows are distinguishable)
    extra = transcripts(spark, 500).withColumn(
        "conv_id", F.concat(F.lit("late-"), "conv_id"))
    extra.repartition(2).write.mode("append").parquet(src)
    r = run_batch(spark, router, src, wh, run, prepare_df=with_datastream)
    assert r["status"] == "ok" and r["files"] == 2
    sinks = spark.read.parquet(wh + "/sinks")
    n2 = sinks.count()
    assert n2 > n1  # old rows kept, new rows added
    assert sinks.filter(~F.col("conv_id").startswith("late-")).count() == n1
