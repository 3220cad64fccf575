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
