"""Hot-conversation skew handling: salted repartition balances output
partitions despite the Zipf conversation distribution (north rule)."""

from pyspark.sql import functions as F

from logstash_filter_elastic_integration_spark.sources.datagen import transcripts


def test_salted_repartition_balances_hot_convs(spark):
    df = transcripts(spark, 20000)  # Zipf: conv-0 holds a large share
    top = (df.groupBy("conv_id").count().orderBy(F.desc("count")).first())
    assert top["count"] > 20000 / 50  # skew actually present

    # naive repartition by conv_id: the hot conv pins one partition
    naive = df.repartition(8, "conv_id") \
        .groupBy(F.spark_partition_id().alias("p")).count().collect()
    naive_max = max(r["count"] for r in naive)

    salted = df.repartition(
        8, "conv_id", F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(64))) \
        .groupBy(F.spark_partition_id().alias("p")).count().collect()
    salted_max = max(r["count"] for r in salted)
    salted_min = min(r["count"] for r in salted)

    assert salted_max < naive_max          # salting strictly improves balance
    assert salted_max <= 2.0 * max(salted_min, 1)
