"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship north-rule job (parse -> enrich -> route ->
reroute fixpoint) through the full Router over a transcript-shaped view of
the sf0.001 events table.  ``queries``/``oracle_sql`` expose the operator
surface (SURVEY.md §2 + dedup/ANN/text extras) with DuckDB oracles — see
``logstash_filter_elastic_integration_spark/queries.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: events mapped to the
    transcript input shape, run through the flagship pipeline (grok parse +
    kv + broadcast enrich + fingerprint + reroute fan-out)."""
    from pyspark.sql import Window
    from logstash_filter_elastic_integration_spark.flagship import run_flagship

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    transcripts = ev.select(
        F.format_string("conv-%08d", F.col("user_id")).alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.element_at(F.array(F.lit("user"), F.lit("assistant"),
                             F.lit("system"), F.lit("tool")),
                     (F.col("event_id") % 4 + 1).cast("int")).alias("role"),
        F.format_string("%d.%d.%d.%d GET /api/ev/%d %d %d %s",
                        (F.col("user_id") % 223 + 1).cast("int"),
                        (F.col("event_id") % 255).cast("int"),
                        (F.col("event_id") * 3 % 255).cast("int"),
                        (F.col("user_id") % 254 + 1).cast("int"),
                        F.col("event_id"),
                        F.when(F.col("event_type") == "error", 500).otherwise(200),
                        F.floor("value").cast("long") + 1,
                        F.lit("0.5")).alias("text"),
        F.when(F.col("event_type") == "error", "code_exec")
         .otherwise("search").alias("tool"),
        F.col("ts"),
    )
    out = run_flagship(spark, transcripts)
    return out.select("conv_id", "turn_idx", "role", "tool", "__sink",
                      "client_ip", "http_status", "http_class",
                      F.col("_ingest_pipeline_failure").isNotNull().alias("failed"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from logstash_filter_elastic_integration_spark.queries import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from logstash_filter_elastic_integration_spark.queries import ORACLES
    return dict(ORACLES)
