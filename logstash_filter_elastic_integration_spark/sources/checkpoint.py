"""Per-partition checkpoint manifest -> resumable execution (north rule).

Unit of resumability = the *input file* (stable across runs, unlike Spark
partition ids).  A run records every completed input file in a manifest;
a restart anti-joins pending files and processes only those.  On Iceberg
this generalizes to data-file/snapshot granularity with the same logic.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, functions as F


class CheckpointManifest:
    def __init__(self, run_dir: str):
        self.run_dir = run_dir
        os.makedirs(run_dir, exist_ok=True)
        self.path = os.path.join(run_dir, "manifest.json")

    def completed_files(self) -> set[str]:
        if not os.path.exists(self.path):
            return set()
        with open(self.path) as f:
            return {e["file"] for e in json.load(f) if e.get("status") == "done"}

    def pending(self, df: DataFrame) -> DataFrame:
        """Filter the input down to files not yet completed.  The filter is
        on ``input_file_name()`` — a metadata column, so pruning happens
        before any transform work."""
        done = self.completed_files()
        if not done:
            return df
        return df.withColumn("__file", F.input_file_name()) \
                 .filter(~F.col("__file").isin(list(done))).drop("__file")

    def input_files(self, df: DataFrame) -> list[str]:
        return [r["f"] for r in
                df.select(F.input_file_name().alias("f")).distinct().collect()]

    def mark_done(self, files: list[str], stats: dict | None = None) -> None:
        log = []
        if os.path.exists(self.path):
            with open(self.path) as f:
                log = json.load(f)
        now = time.time()
        for fl in files:
            log.append({"file": fl, "status": "done", "ts": now,
                        **(stats or {})})
        with open(self.path, "w") as f:
            json.dump(log, f, indent=1)
