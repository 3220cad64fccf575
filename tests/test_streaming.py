"""Structured Streaming: the same compiled pipeline + router driven by
readStream/foreachBatch (availableNow trigger), exactly-once via checkpoint."""

import glob

import pytest
from pyspark.sql import functions as F

from logstash_filter_elastic_integration_spark.flagship import (
    build_router, with_datastream)
from logstash_filter_elastic_integration_spark.sources.catalog import Catalog
from logstash_filter_elastic_integration_spark.sources.datagen import transcripts
from logstash_filter_elastic_integration_spark.streaming import stream_pipeline


def test_stream_pipeline_availablenow(spark, tmp_path):
    src = str(tmp_path / "src")
    transcripts(spark, 1000).repartition(4).write.parquet(src)
    schema = spark.read.parquet(src).schema
    router = build_router(spark)
    catalog = Catalog(spark, str(tmp_path / "wh"))

    class DSRouter:
        """Adds datastream columns per micro-batch before routing."""
        def execute(self, batch_df):
            return router.execute(with_datastream(batch_df))
        write_fanout = staticmethod(router.write_fanout)
        sink_counts = staticmethod(router.sink_counts)

    q = stream_pipeline(spark, src, schema, DSRouter(), catalog,
                        str(tmp_path / "ck"))
    q.awaitTermination(300)
    written = glob.glob(str(tmp_path / "wh" / "sinks_stream" / "**" / "*.parquet"),
                        recursive=True)
    assert written
    total = spark.read.parquet(*sorted({p for p in written})).count()
    assert total == 1000


def test_stateful_sessionize_stream(spark, tmp_path):
    """applyInPandasWithState sessionizer: within-batch gaps close sessions
    (emitted); the trailing open session stays in state, then closes via
    event-time timeout once the watermark advances past it."""
    import datetime as dt

    from logstash_filter_elastic_integration_spark.streaming.stream import (
        sessionize_stream)

    src = str(tmp_path / "ev_in")
    base = dt.datetime(2024, 1, 1, 12, 0, 0)

    def t(mins):
        return base + dt.timedelta(minutes=mins)

    rows = [
        (1, t(0)), (1, t(5)), (1, t(10)),      # session A (3 events)
        (1, t(90)), (1, t(95)),                # >30min gap -> session B
        (2, t(0)),                             # single-event session
        (2, t(200)),                           # far later -> closes first
        # watermark driver: a dummy user far in the future pushes the
        # watermark beyond every session's timeout
        (99, t(2000)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    df.coalesce(1).write.parquet(src)

    out = sessionize_stream(
        spark.readStream.schema("user_id long, ts timestamp").parquet(src),
        gap_s=1800, watermark="0 seconds")
    q = (out.writeStream.format("memory").queryName("sessions")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["user_id"], r["n_events"])
           for r in spark.sql("SELECT * FROM sessions").collect()}
    # closed by in-batch gaps: user1 A(3), user2 first(1); closed by the
    # event-time TIMEOUT once the watermark (driven by user99's t+2000min
    # event) passed their end+gap: user1 B(2), user2 second(1)
    assert {(1, 3), (1, 2), (2, 1)} <= got
    # user99's own session is newer than the watermark -> still open in
    # state, not emitted
    assert (99, 1) not in got


def test_stream_checkpoint_restart_no_dupes(spark, tmp_path):
    """Resumability on the STREAMING side (north rule: resumable from
    checkpoints): run availableNow over the initial files, stop, land more
    files, restart with the SAME checkpoint location — the restarted query
    processes only the new files; total sink rows = input rows exactly
    (no loss, no double-processing)."""
    src = str(tmp_path / "src")
    whole = transcripts(spark, 1000).localCheckpoint(eager=True)
    wave1 = whole.filter(F.crc32(F.concat_ws("|", "conv_id", "turn_idx")) % 5 < 3)
    wave2 = whole.exceptAll(wave1)
    wave1.repartition(3).write.parquet(src)
    schema = spark.read.parquet(src).schema
    router = build_router(spark)
    catalog = Catalog(spark, str(tmp_path / "wh"))

    class DSRouter:
        def execute(self, batch_df):
            return router.execute(with_datastream(batch_df))
        write_fanout = staticmethod(router.write_fanout)
        sink_counts = staticmethod(router.sink_counts)

    ck = str(tmp_path / "ck")
    q1 = stream_pipeline(spark, src, schema, DSRouter(), catalog, ck)
    q1.awaitTermination(300)
    # second wave of files lands after the first run committed
    wave2.repartition(2).write.mode("append").parquet(src)
    q2 = stream_pipeline(spark, src, schema, DSRouter(), catalog, ck)
    q2.awaitTermination(300)
    written = glob.glob(str(tmp_path / "wh" / "sinks_stream" / "**" / "*.parquet"),
                        recursive=True)
    out = spark.read.parquet(*sorted({p for p in written}))
    assert out.count() == 1000
    # per-turn identity: every (conv_id, turn_idx) appears exactly once
    assert out.select("conv_id", "turn_idx").distinct().count() == 1000


def test_stream_flagship_counts_equal_batch_and_checkpoint_restart(spark):
    """North-rule streaming parity: the driver's stream_flagship query
    (compiled router under foreachBatch) must produce per-sink counts
    equal to the batch route_fanout run; and a RESTART from the same
    checkpoint over the same source must process zero new batches
    (exactly-once)."""
    import tempfile

    from logstash_filter_elastic_integration_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    stream_counts = {(r.sink, r.severity): r.n
                     for r in Q.q_stream_flagship(spark, sf).collect()}
    batch_counts = {(r["sink"], r["severity"]): r["n"]
                    for r in Q.q_route_fanout(spark, sf)
                    .groupBy("sink", "severity")
                    .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert stream_counts == batch_counts

    # restart semantics: same checkpoint, same source -> nothing replayed
    d = Q._events_stream_dir(sf)
    schema = spark.read.parquet(f"{sf}/events.parquet").schema
    ckpt = tempfile.mkdtemp(prefix="ckpt_restart_")
    seen = []

    def run_once():
        src = spark.readStream.schema(schema).parquet(d)
        q = (src.writeStream
             .foreachBatch(lambda df, _id: seen.append(df.count()))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run_once()
    first = list(seen)
    assert sum(first) > 0
    run_once()  # restart: checkpoint says the file is already committed
    assert seen == first


def test_pipeline_reloader_es_semantics(tmp_path):
    # ES CacheReloadService contract: interval gate, confirmed-same is a
    # no-op, changed defs rebuild, failed rebuild keeps the stale router
    from logstash_filter_elastic_integration_spark.streaming.stream import (
        PipelineReloader)
    d = tmp_path / "pipes"
    d.mkdir()
    (d / "p.json").write_text('{"processors": []}')
    clock = {"t": 0.0}
    built = {"n": 0}
    fail = {"on": False}

    def factory():
        if fail["on"]:
            raise RuntimeError("bad pipeline json")
        built["n"] += 1
        return f"router-v{built['n']}"

    r = PipelineReloader(str(d), factory, "router-v0",
                         reload_interval_s=60, clock=lambda: clock["t"])
    assert r.current() == "router-v0"          # within interval
    clock["t"] = 61
    assert r.current() == "router-v0"          # due but confirmed-same
    (d / "p.json").write_text('{"processors": [{"set": {"field": "x", "value": 1}}]}')
    clock["t"] = 200
    assert r.current() == "router-v1"          # changed -> rebuilt
    assert r.reloads == 1
    fail["on"] = True
    (d / "p.json").write_text('{"processors": [BROKEN')
    clock["t"] = 300
    assert r.current() == "router-v1"          # failure -> keep stale
    assert r.failed_reloads == 1
    fail["on"] = False
    clock["t"] = 400
    assert r.current() == "router-v2"          # recovers on next tick
