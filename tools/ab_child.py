"""A/B bench child: drives ONE repo tree's flagship job, one timed pass
per RUN command on stdin (see tools/ab_bench.py).

Usage: python tools/ab_child.py <repo_root> <label> <transcripts_parquet>

Protocol (stdin/stdout, line-oriented):
  parent <- "READY"            after warmup
  parent -> "RUN"              execute one timed materializing pass
  parent <- "PASS <sec>"       wall seconds for that pass
  parent -> "QUIT"             exit

The child imports the PACKAGE FROM <repo_root> (sys.path precedence), so
the same script can drive both the checked-out HEAD and a `git worktree`
of an older round — the interleaved passes then see identical host
conditions and phase noise cancels out of the A/B ratio.
"""
from __future__ import annotations

import os
import shutil
import sys
import time


def main() -> None:
    repo_root, label, tpath = sys.argv[1], sys.argv[2], sys.argv[3]
    sys.path.insert(0, repo_root)
    os.chdir(repo_root)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from logstash_filter_elastic_integration_spark import get_spark
    from logstash_filter_elastic_integration_spark.flagship import (
        build_router, with_datastream)
    from logstash_filter_elastic_integration_spark.sources.catalog import Catalog

    spark = get_spark(app_name=f"ab_{label}", cores=cpus,
                      shuffle_partitions=cpus)
    spark.conf.set("spark.sql.files.maxPartitionBytes",
                   str(8 * 1024 * 1024))
    tdf = spark.read.parquet(tpath)

    router = build_router(spark)
    router.execute(with_datastream(tdf.limit(100_000))) \
        .write.format("noop").mode("overwrite").save()

    out_root = f"/tmp/spark_graft_ab/out_{label}"

    print("READY", flush=True)
    for line in sys.stdin:
        cmd = line.strip()
        if cmd == "QUIT":
            break
        if cmd != "RUN":
            continue
        shutil.rmtree(out_root, ignore_errors=True)
        catalog = Catalog(spark, out_root)
        t0 = time.time()
        executed = router.execute(with_datastream(tdf))
        router.write_fanout(executed, catalog, table="sinks")
        written = catalog.read("sinks")
        catalog.write(router.sink_counts(written, dropped_filtered=True),
                      "sink_counts")
        print(f"PASS {time.time() - t0:.3f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
