"""Training-data curation end-to-end: the LLM-pipeline side of the
engine (brief: operations a large-scale training-data pipeline needs)
composed over the `documents` table —

    quality score -> language gate -> exact dedup (keep one per hash)
    -> deterministic 80% sample -> stratified source mixing
    -> corpus stats

Every step is a pure DataFrame transformation: one shuffle total (the
exact-dedup groupBy); the sampling/mixing decisions are stable md5-hash
functions of doc_id, so reruns, resumes, and different partitionings
keep the identical row set.  At 100 TB the same plan holds — the dedup
aggregate is partial+final, and there are no driver-side collects.

    python examples/curate_corpus.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import Window, functions as F

from logstash_filter_elastic_integration_spark import get_spark
from logstash_filter_elastic_integration_spark.operators.curate import (
    stable_sample, stratified_mix)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(cores=4)
    doc = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    # 1. quality heuristics (Gopher-style: length band, stopword
    #    evidence, symbol noise) — all codegen'd Column expressions
    words = F.split("text", " ")
    tokens = F.size(words)
    stop_n = F.size(F.filter(
        words, lambda x: x.isin("the", "a", "of", "and", "is", "to", "in")))
    punct = F.length("text") - F.length(
        F.regexp_replace("text", r"[^\w\s]", ""))
    score = (F.when((tokens >= 5) & (tokens <= 100000), 40).otherwise(0)
             + F.least(F.floor(stop_n * 100 / tokens), F.lit(30))
             + F.when(punct * 4 <= tokens, 20).otherwise(0))
    doc = doc.withColumn("quality", score)

    # 2. gates: quality floor + language
    doc = doc.filter((F.col("quality") >= 40) & (F.col("lang") == "en"))

    # 3. exact dedup: keep the lowest doc_id per content hash (one
    #    shuffle, partial+final agg via the window's hash partitioning)
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    doc = (doc.withColumn("__rank", F.row_number().over(w))
           .filter(F.col("__rank") == 1).drop("__rank"))

    # 4. deterministic sample + stratified source mixing (rerun-stable)
    doc = stable_sample(doc, "doc_id", 0.8, salt="v1")
    doc = stratified_mix(doc, "source", {"src1": 0.5, "src2": 0.0},
                         key="doc_id", salt="mix-v1")

    # 5. corpus stats
    stats = doc.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.size(F.split("text", " "))).alias("tokens_ws"),
        F.avg("quality").alias("mean_quality"))
    kept, tok, q = stats.collect()[0]
    print(f"kept={kept} tokens={tok} mean_quality={q:.1f}")
    per_src = (doc.groupBy("source").count()
               .orderBy("source").collect())
    print("by source:", {r["source"]: r["count"] for r in per_src})
    assert kept > 0
    spark.stop()


if __name__ == "__main__":
    main()
