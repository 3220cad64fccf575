"""Resumable batch runner: first run processes everything, second is a
no-op, and a partially-completed manifest resumes only pending files."""

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
