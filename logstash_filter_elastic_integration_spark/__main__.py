"""CLI entry point — the spark-submit deployment surface:

    spark-submit --py-files pkg.zip -m ... OR
    python -m logstash_filter_elastic_integration_spark \
        --input /data/transcripts --pipelines ./pipelines/ \
        --routing logs-agent.turns-default=transcripts-root \
        --warehouse /data/out --run-dir /data/run

Runs the checkpointed, resumable batch job (jobs.run_batch) with the given
pipeline-definition directory and routing table.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser(prog="logstash_filter_elastic_integration_spark")
    ap.add_argument("--input", required=True, help="input parquet dir")
    ap.add_argument("--pipelines", help="dir of pipeline JSON definitions "
                                        "(default: built-in flagship)")
    ap.add_argument("--routing", nargs="*", default=[],
                    help="index=pipeline entries ('prefix-*' allowed)")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--run-dir", required=True)
    ap.add_argument("--cores", default="*")
    ap.add_argument("--salt-partitions", type=int, default=None)
    args = ap.parse_args()

    from . import get_spark
    from .jobs import run_batch

    spark = get_spark(cores=args.cores if args.cores == "*" else int(args.cores))
    if args.pipelines:
        from .engine import SparkIngestFilter
        routing = dict(kv.split("=", 1) for kv in args.routing)
        router = SparkIngestFilter(pipelines=args.pipelines,
                                   routing=routing).router
        prepare = None
    else:
        from .flagship import build_router, with_datastream
        router = build_router(spark)
        prepare = with_datastream

    result = run_batch(spark, router, args.input, args.warehouse,
                       args.run_dir, prepare_df=prepare,
                       salt_partitions=args.salt_partitions)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
