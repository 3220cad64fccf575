"""Extra benchmarks for the optimization round (bench.py is FROZEN — this
file holds the noop-sink isolation runs, per-query pass lists, and plan
dumps used as evidence in OPTIMIZATION_r06.md).

Usage:
  python bench_extra.py [query ...]          # time queries (default: headline)
  python bench_extra.py --plans [query ...]  # dump explain(formatted) to plans/r06/
  python bench_extra.py --passes N           # passes per query (default 3)
  python bench_extra.py --flagship           # phase-isolated flagship timing

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = ["pipe_grok_typed", "pipe_user_agent", "pipe_mutate_chain",
            "route_fanout", "agg_sink_counts", "dedup_exact",
            "dedup_minhash_lsh", "dedup_simhash", "dedup_ngram_jaccard",
            "lang_id_trigram", "doc_quality", "ann_cosine_topk", "ann_ivf",
            "dedup_clusters", "multimodal_av", "multimodal_video",
            "token_rolling_hash", "sessionize", "decontaminate_ngram"]


def get_session(cpus: int):
    from logstash_filter_elastic_integration_spark import get_spark
    spark = get_spark(app_name="bench_extra", cores=cpus,
                      shuffle_partitions=cpus)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
    return spark


def time_queries(spark, sf_dir, names, passes):
    from logstash_filter_elastic_integration_spark import queries as Q
    out = {}
    for name in names:
        qp = []
        for i in range(passes):
            spark.sparkContext.setJobDescription(f"{name} pass {i}")
            t0 = time.time()
            df = Q.QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            qp.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = qp
        print(f"{name}: min={min(qp)} passes={qp}", file=sys.stderr)
    return out


def dump_plans(spark, sf_dir, names, suffix):
    from logstash_filter_elastic_integration_spark import queries as Q
    os.makedirs("plans/r06", exist_ok=True)
    for name in names:
        df = Q.QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        path = f"plans/r06/{name}_{suffix}.txt"
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}", file=sys.stderr)


def flagship_phases(spark, sf_dir, passes):
    """Phase-isolated flagship: execute+noop vs fanout write vs read+agg."""
    import shutil
    from logstash_filter_elastic_integration_spark.flagship import (
        build_router, with_datastream)
    from logstash_filter_elastic_integration_spark.sources.catalog import Catalog
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    rows = {"sf0.001": 10_000, "sf0.01": 100_000, "sf0.1": 1_000_000,
            "sf1": 10_000_000}.get(sf_name, 1_000_000)
    import bench
    tpath = bench.transcripts_cache(spark, sf_name, rows)
    tdf = spark.read.parquet(tpath)
    router = build_router(spark)
    # warm
    router.execute(with_datastream(tdf.limit(100_000))) \
        .write.format("noop").mode("overwrite").save()
    res = {"compute_noop": [], "fanout_write": [], "read_agg": [],
           "total": []}
    for _ in range(passes):
        out_root = "/tmp/spark_graft_bench/out_extra"
        shutil.rmtree(out_root, ignore_errors=True)
        catalog = Catalog(spark, out_root)
        t0 = time.time()
        executed = router.execute(with_datastream(tdf))
        spark.sparkContext.setJobDescription("flagship compute noop")
        executed.write.format("noop").mode("overwrite").save()
        t1 = time.time()
        executed2 = router.execute(with_datastream(tdf))
        spark.sparkContext.setJobDescription("flagship fanout write")
        router.write_fanout(executed2, catalog, table="sinks")
        t2 = time.time()
        spark.sparkContext.setJobDescription("flagship read+agg")
        written = catalog.read("sinks")
        catalog.write(router.sink_counts(written, dropped_filtered=True),
                      "sink_counts")
        t3 = time.time()
        res["compute_noop"].append(round(t1 - t0, 3))
        res["fanout_write"].append(round(t2 - t1, 3))
        res["read_agg"].append(round(t3 - t2, 3))
        res["total"].append(round(t3 - t0, 3))
        print(f"pass: compute={t1-t0:.2f} write={t2-t1:.2f} "
              f"agg={t3-t2:.2f}", file=sys.stderr)
    return res


def main():
    args = [a for a in sys.argv[1:]]
    passes = 3
    if "--passes" in args:
        i = args.index("--passes")
        passes = int(args[i + 1])
        del args[i:i + 2]
    do_plans = "--plans" in args
    if do_plans:
        args.remove("--plans")
    suffix = "before"
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        del args[i:i + 2]
    do_flagship = "--flagship" in args
    if do_flagship:
        args.remove("--flagship")
    names = args or HEADLINE

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_session(cpus)
    result = {}
    if do_flagship:
        result["flagship_phases"] = flagship_phases(spark, sf_dir, passes)
    elif do_plans:
        dump_plans(spark, sf_dir, names, suffix)
        return
    else:
        result["queries"] = time_queries(spark, sf_dir, names, passes)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
