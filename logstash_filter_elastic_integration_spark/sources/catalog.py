"""Table catalog: Iceberg-shaped API, parquet-backed in this sandbox.

Production target is Iceberg (``spark.read.format("iceberg")``, snapshot-
based checkpointing, commit metadata for lineage) — the sandbox ships no
Iceberg runtime jar, so the same API writes partitioned parquet directories
and keeps snapshot/lineage metadata in a ``_meta.json`` sidecar.  Swapping
``FORMAT`` to "iceberg" (plus catalog conf) is the only change needed on a
real cluster; all call sites go through this class.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


class Catalog:
    FORMAT = "parquet"  # -> "iceberg" on a cluster with the runtime jar

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def read(self, table: str) -> DataFrame:
        return self.spark.read.format(self.FORMAT).load(self.path(table))

    def write(self, df: DataFrame, table: str, mode: str = "overwrite",
              partition_by: list[str] | None = None,
              meta: dict | None = None, dynamic: bool = False) -> None:
        """dynamic=True uses dynamic partition overwrite: only partitions
        present in ``df`` are replaced, others are untouched — the parquet
        stand-in for an Iceberg REPLACE-partitions commit.  This is what
        makes incremental/resumed runs idempotent without clobbering
        previously committed output."""
        w = df.write.format(self.FORMAT).mode(mode)
        if dynamic:
            w = w.option("partitionOverwriteMode", "dynamic")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.save(self.path(table))
        self._append_meta(table, {"mode": mode, "ts": time.time(),
                                  "partition_by": partition_by or [],
                                  "dynamic": dynamic, **(meta or {})})

    def _append_meta(self, table: str, entry: dict) -> None:
        """Commit-metadata sidecar (stand-in for Iceberg snapshot summary)."""
        p = os.path.join(self.path(table), "_meta.json")
        log = []
        if os.path.exists(p):
            with open(p) as f:
                log = json.load(f)
        log.append(entry)
        with open(p, "w") as f:
            json.dump(log, f, indent=1)

    def exists(self, table: str) -> bool:
        p = self.path(table)
        return os.path.isdir(p) and any(
            f.endswith(".parquet") or f == "_SUCCESS" for f in os.listdir(p))
