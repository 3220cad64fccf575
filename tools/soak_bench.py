"""Large-scale soak (VERDICT r3 #6): sf1 flagship + scaled dedup/ANN +
sf10 flagship smoke, publishing wall time, throughput, and peak memory.

Every prior scale claim extrapolated from <= 8M rows; this runs the real
thing bigger on one box:

  1. flagship at sf1 (10,000,000 transcript turns), min-of-2;
  2. the iterative/stateful dedup queries (minhash LSH, n-gram Jaccard
     block->verify, connected-components clusters) + IVF ANN over a
     documents/embeddings set replicated ~200x (-> ~100k docs / 100k
     vectors), exercising the CC-loop localCheckpoints and the DISK_ONLY
     persists at two orders of magnitude above the driver tables;
  3. one flagship smoke at sf10 (100,000,000 turns), single pass.

Peak memory = ru_maxrss of the driver (python) + children (the local-mode
JVM holds all executor state; pyspark workers are children too).

Usage:  python tools/soak_bench.py [--sf10]   (~15-30 min with --sf10)
Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BIG_DIR = "/tmp/spark_graft_soak"


def peak_gb() -> float:
    """Sum of VmHWM (peak RSS) across this process and every LIVE
    descendant (the local-mode JVM + pyspark worker daemons).  getrusage
    RUSAGE_CHILDREN only counts reaped children, which misses the JVM
    entirely while it runs."""
    import glob
    ppid_of, hwm_kb = {}, {}
    for status in glob.glob("/proc/[0-9]*/status"):
        try:
            pid = int(status.split("/")[2])
            d = dict(line.split(":", 1) for line in
                     open(status).read().splitlines() if ":" in line)
            ppid_of[pid] = int(d.get("PPid", "0").strip())
            hwm_kb[pid] = int(d.get("VmHWM", "0 kB").strip().split()[0])
        except (OSError, ValueError):
            continue
    me = os.getpid()
    tree, frontier = {me}, {me}
    while frontier:
        frontier = {p for p, pp in ppid_of.items() if pp in frontier}
        tree |= frontier
    return round(sum(hwm_kb.get(p, 0) for p in tree) / 1024 / 1024, 2)


def build_big_docs(spark, src_dir: str, replicas: int) -> str:
    """Replicate the sf0.1 documents/embeddings tables `replicas`x with
    remapped ids.  Each replica's text gets a small deterministic suffix
    mutation, so copies are NEAR-duplicates (not exact — the exact-dedup
    pre-pass would otherwise collapse them) and the near-dup graph grows
    cross-replica components up to ~replicas wide: a strictly harder
    clustering input than the driver tables."""
    from pyspark.sql import functions as F
    out = f"{BIG_DIR}/docs_x{replicas}"
    if os.path.exists(f"{out}/documents.parquet/_SUCCESS"):
        return out
    docs = spark.read.parquet(f"{src_dir}/documents.parquet")
    n = docs.count()
    rep = spark.range(replicas).select(F.col("id").alias("rep"))
    big = (docs.crossJoin(F.broadcast(rep))
           .withColumn("doc_id", F.col("doc_id") + F.col("rep") * n)
           .withColumn("text", F.concat(F.col("text"), F.lit(" rv"),
                                        (F.col("rep") % 50).cast("string")))
           .drop("rep"))
    big.repartition(32).write.mode("overwrite") \
        .parquet(f"{out}/documents.parquet")
    emb = spark.read.parquet(f"{src_dir}/embeddings.parquet")
    ne = emb.count()
    idc = "doc_id" if "doc_id" in emb.columns else emb.columns[0]
    bige = (emb.crossJoin(F.broadcast(rep))
            .withColumn(idc, F.col(idc) + F.col("rep") * ne)
            .drop("rep"))
    bige.repartition(32).write.mode("overwrite") \
        .parquet(f"{out}/embeddings.parquet")
    return out


def main() -> None:
    do_sf10 = "--sf10" in sys.argv
    from logstash_filter_elastic_integration_spark import get_spark
    from logstash_filter_elastic_integration_spark.flagship import (
        build_router, with_datastream)
    from logstash_filter_elastic_integration_spark.sources.datagen import (
        transcripts)
    from logstash_filter_elastic_integration_spark import queries as Q

    spark = get_spark(app_name="soak", cores=32, shuffle_partitions=64)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
    report: dict = {"metric": "soak", "cpus": 32}

    # ---- 1. flagship @ sf1 (10M turns) --------------------------------
    p1 = f"{BIG_DIR}/transcripts_10m"
    if not os.path.exists(p1 + "/_SUCCESS"):
        transcripts(spark, 10_000_000).repartition(64) \
            .write.mode("overwrite").parquet(p1)
    tdf = spark.read.parquet(p1)
    router = build_router(spark)
    passes = []
    for _ in range(2):
        t0 = time.time()
        router.execute(with_datastream(tdf)) \
            .write.format("noop").mode("overwrite").save()
        passes.append(round(time.time() - t0, 2))
    report["flagship_sf1"] = {
        "rows": 10_000_000, "passes": passes, "wall_s": min(passes),
        "turns_per_sec": round(10_000_000 / min(passes), 1),
        "peak_rss_gb": peak_gb()}

    # ---- 2. dedup/ANN at ~200x the driver documents table -------------
    big = build_big_docs(spark, "/root/testdata/sf0.1", replicas=200)
    for name in ("dedup_minhash_lsh", "dedup_ngram_jaccard",
                 "dedup_clusters", "ann_ivf"):
        t0 = time.time()
        n = Q.QUERIES[name](spark, big).count()
        report[name] = {"wall_s": round(time.time() - t0, 2),
                        "out_rows": n, "peak_rss_gb": peak_gb()}

    # ---- 3. flagship smoke @ sf10 (100M turns) ------------------------
    if do_sf10:
        p10 = f"{BIG_DIR}/transcripts_100m"
        if not os.path.exists(p10 + "/_SUCCESS"):
            transcripts(spark, 100_000_000).repartition(256) \
                .write.mode("overwrite").parquet(p10)
        tdf10 = spark.read.parquet(p10)
        t0 = time.time()
        router.execute(with_datastream(tdf10)) \
            .write.format("noop").mode("overwrite").save()
        w = round(time.time() - t0, 2)
        report["flagship_sf10_smoke"] = {
            "rows": 100_000_000, "wall_s": w,
            "turns_per_sec": round(100_000_000 / w, 1),
            "peak_rss_gb": peak_gb()}

    print(json.dumps(report))


if __name__ == "__main__":
    main()
