"""Watermarked event-time windowed aggregates over a transcript stream —
the Structured Streaming variant of the per-sink counts."""

from pyspark.sql import functions as F

from logstash_filter_elastic_integration_spark.sources.datagen import transcripts
from logstash_filter_elastic_integration_spark.streaming.stream import (
    windowed_counts_stream)


def test_windowed_counts_with_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    transcripts(spark, 2000).repartition(2).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    agg = windowed_counts_stream(stream, window="1 hour", watermark="2 hours")
    q = (agg.writeStream.format("memory").queryName("wincounts")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(300)
    got = spark.sql("SELECT sum(n) AS total FROM wincounts").first()["total"]
    assert got == 2000
    # same result as the batch aggregation
    batch = (spark.read.parquet(src)
             .groupBy(F.window("ts", "1 hour")["start"].alias("ts_window"),
                      "role", "tool")
             .agg(F.count(F.lit(1)).alias("n")))
    stream_rows = {tuple(r) for r in
                   spark.sql("SELECT ts_window, role, tool, n FROM wincounts").collect()}
    batch_rows = {tuple(r) for r in batch.collect()}
    assert stream_rows == batch_rows
