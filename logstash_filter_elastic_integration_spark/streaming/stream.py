"""Structured Streaming execution of the same compiled pipelines.

The reference is a pull-batch filter inside a running Logstash pipeline —
continuous ingestion.  The Spark-native equivalent is Structured Streaming:
``readStream`` on the transcript table/directory, the IDENTICAL compiled
processor-chain transform (it is a pure narrow projection, so it is
streaming-safe with no watermark needed), and ``foreachBatch`` driving the
same Router fan-out + per-sink aggregates per micro-batch — which also
gives exactly-once sink writes via the checkpoint location.

Windowed per-sink aggregates in *continuous* mode (with late data) use the
event-time watermark variant below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def stream_pipeline(spark: SparkSession, source_dir: str, schema,
                    router, catalog, checkpoint_dir: str,
                    trigger_once: bool = True):
    """File-source streaming run of a Router over arriving transcript
    parquet files.  Returns the started StreamingQuery."""
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 8)
              .parquet(source_dir))

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        executed = router.execute(batch_df)
        executed = executed.persist()
        try:
            router.write_fanout(executed, catalog,
                                table=f"sinks_stream/batch={batch_id}")
            catalog.write(router.sink_counts(executed),
                          f"sink_counts_stream/batch={batch_id}")
        finally:
            executed.unpersist()

    writer = (stream.writeStream.foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_counts_stream(stream_df: DataFrame, window: str = "1 hour",
                           watermark: str = "2 hours") -> DataFrame:
    """Event-time windowed per-role/tool counts with late-data handling —
    the streaming analogue of Router.sink_counts."""
    return (stream_df
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window)["start"].alias("ts_window"),
                     "role", "tool")
            .agg(F.count(F.lit(1)).alias("n")))


def sessionize_stream(stream_df: DataFrame, gap_s: int = 1800,
                      watermark: str = "2 hours") -> DataFrame:
    """Custom STATEFUL streaming operator (brief: applyInPandasWithState):
    per-user session assembly with an inactivity gap.  State = the open
    session (start/end epoch, event count); a batch's events extend or
    close sessions; closed sessions are EMITTED (append mode) and the open
    one stays in state until the event-time timeout fires after the
    watermark passes ``gap_s`` beyond its last event.

    Scale shape: state is partitioned by the group key (user), so the
    operator shards across executors with no driver involvement; the
    pandas kernel sees one user's micro-batch slice at a time."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = ("user_id LONG, session_start TIMESTAMP, "
                  "session_end TIMESTAMP, n_events LONG")
    state_schema = "start LONG, end LONG, n LONG"

    def fn(key, pdfs, state):
        import pandas as pd
        (uid,) = key
        closed = []
        if state.hasTimedOut:
            start, end, n = state.get
            closed.append((uid, start, end, n))
            state.remove()
        else:
            start, end, n = state.get if state.exists else (None, None, 0)
            ts_all = []
            for pdf in pdfs:
                ts_all.extend(
                    int(t.timestamp()) for t in pd.to_datetime(pdf["ts"]))
            for t in sorted(ts_all):
                if end is not None and t - end > gap_s:
                    closed.append((uid, start, end, n))
                    start, n = None, 0
                if start is None:
                    start = t
                end = t
                n += 1
            if n:
                state.update((start, end, n))
                state.setTimeoutTimestamp((end + gap_s) * 1000)
        if closed:
            # dtypes pinned explicitly: per-dict construction lets pandas
            # infer object columns and spams FutureWarnings through the
            # Arrow serializer on some batch shapes
            yield pd.DataFrame({
                "user_id": pd.Series([u for u, _, _, _ in closed],
                                     dtype="int64"),
                "session_start": pd.to_datetime(
                    [s for _, s, _, _ in closed], unit="s"),
                "session_end": pd.to_datetime(
                    [e for _, _, e, _ in closed], unit="s"),
                "n_events": pd.Series([c for _, _, _, c in closed],
                                      dtype="int64"),
            })

    return (stream_df.withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                fn, out_schema, state_schema, "append",
                GroupStateTimeout.EventTimeTimeout))
