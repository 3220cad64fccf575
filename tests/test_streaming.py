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
