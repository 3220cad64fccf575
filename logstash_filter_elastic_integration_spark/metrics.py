"""Per-stage lineage + throughput metrics (north rule).

Uses ``pyspark.sql.Observation`` — metrics ride along the action that
writes the data (no extra count jobs), the Spark-idiomatic analogue of the
reference's per-batch accounting.  Each run emits a lineage JSON with
stage -> {rows, failed, dropped, wall_s, rows_per_s}.
"""

from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager

from pyspark.sql import DataFrame, Observation, functions as F


class RunMetrics:
    def __init__(self, run_dir: str):
        self.run_dir = run_dir
        os.makedirs(run_dir, exist_ok=True)
        self.stages: dict[str, dict] = {}
        self._observations: dict[str, Observation] = {}

    def observe(self, df: DataFrame, stage: str,
                failed_col: str | None = None,
                dropped_col: str | None = None) -> DataFrame:
        obs = Observation(stage)
        metrics = [F.count(F.lit(1)).alias("rows")]
        if failed_col and failed_col in df.columns:
            metrics.append(F.sum(F.col(failed_col).isNotNull().cast("long")).alias("failed"))
        if dropped_col and dropped_col in df.columns:
            metrics.append(F.sum(F.col(dropped_col).cast("long")).alias("dropped"))
        self._observations[stage] = obs
        return df.observe(obs, *metrics)

    @contextmanager
    def stage(self, name: str):
        t0 = time.time()
        yield
        wall = time.time() - t0
        entry = {"wall_s": round(wall, 3)}
        obs = self._observations.get(name)
        if obs is not None:
            got = dict(obs.get)
            entry.update(got)
            if wall > 0 and "rows" in got:
                entry["rows_per_s"] = round(got["rows"] / wall, 1)
        self.stages[name] = entry

    def write_lineage(self, extra: dict | None = None) -> str:
        path = os.path.join(self.run_dir, "lineage.json")
        with open(path, "w") as f:
            json.dump({"stages": self.stages, **(extra or {})}, f, indent=1)
        return path
