"""Two-parallelism scaling evidence (BASELINE.json north rule): run the
IDENTICAL flagship job on the IDENTICAL input at local[8] and local[32]
(the sandbox stand-in for N vs 4N executors), report turns/sec at both and
efficiency = (tput32 / tput8) / 4 into BENCH/BASELINE.md.

Each level runs in a fresh JVM (subprocess) so executor-thread counts are
honest.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int, sf_dir: str, rows: int | None) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_SF_DIR=sf_dir)
    if rows:
        env["SPARK_GRAFT_ROWS"] = str(rows)
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         env=env, capture_output=True, text=True, timeout=3600)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rows = int(os.environ["SPARK_GRAFT_ROWS"]) if "SPARK_GRAFT_ROWS" in os.environ else None
    r8 = run_level(8, sf_dir, rows)
    r32 = run_level(32, sf_dir, rows)
    tput8, tput32 = r8["turns_per_sec"], r32["turns_per_sec"]
    eff = (tput32 / tput8) / 4
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "w") as f:
        f.write(f"""# BENCH/BASELINE — scaling evidence (north rule)

Protocol (BASELINE.md): identical flagship job (parse -> enrich -> route ->
reroute -> fan-out write + per-sink aggregates), identical input
({r8['rows']} synthetic transcript turns, seed 42), two parallelism levels
in fresh JVMs — `local[8]` vs `local[32]` standing in for N vs 4N executors.

| level | wall (s) | turns/sec |
|---|---|---|
| local[8]  (N)  | {r8['value']} | {tput8} |
| local[32] (4N) | {r32['value']} | {tput32} |

**Scaling efficiency = (tput@32 / tput@8) / 4 = {eff:.3f}**
(north-rule threshold: >= 0.8)

Per-query seconds at local[32]:

```json
{json.dumps(r32['queries'], indent=1)}
```
""")
    print(json.dumps({"tput8": tput8, "tput32": tput32,
                      "efficiency": round(eff, 3), "report": path}))


if __name__ == "__main__":
    main()
