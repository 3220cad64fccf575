"""Interleaved A/B flagship benchmark: HEAD vs an older round's commit.

Round-over-round perf claims on this sandbox are polluted by 2-5x
hypervisor host phases (BENCH/BASELINE.md): two benchmarks run an hour
apart can differ 3x on identical code.  This harness removes that by
time-interleaving single passes of BOTH binaries (pattern A B B A A B
B A ...), each in its own warm JVM driven via tools/ab_child.py, so both
sides sample the same host phases and the RATIO is meaningful even when
the absolute numbers are not.

Usage:
  python tools/ab_bench.py [--base-ref <git ref>] [--passes N] \
      [--out BENCH/ab_rXX.json]

Defaults: base ref = the previous round's recorded commit, 4 passes per
side, sf0.1 transcripts (SPARK_GRAFT_SF_DIR / SPARK_GRAFT_ROWS as in
bench.py).
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def start_child(repo_root: str, label: str, tpath: str) -> subprocess.Popen:
    p = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tools", "ab_child.py"),
         repo_root, label, tpath],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True, bufsize=1)
    for line in p.stdout:
        if line.strip() == "READY":
            return p
    raise RuntimeError(f"child {label} died before READY")


def run_pass(p: subprocess.Popen) -> float:
    p.stdin.write("RUN\n")
    p.stdin.flush()
    for line in p.stdout:
        line = line.strip()
        if line.startswith("PASS "):
            return float(line.split()[1])
    raise RuntimeError("child died mid-pass")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-ref", default="9928573")
    ap.add_argument("--passes", type=int, default=4)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_name = os.path.basename(sf_dir.rstrip("/"))

    import bench
    n_rows = int(os.environ.get("SPARK_GRAFT_ROWS",
                                bench.SF_ROWS.get(sf_name, 1_000_000)))

    base_wt = f"/tmp/ab_base_wt_{args.base_ref}"
    if not os.path.exists(os.path.join(base_wt, "bench.py")):
        subprocess.run(["git", "-C", REPO, "worktree", "add", "--detach",
                        base_wt, args.base_ref], check=True)

    # one shared deterministic input for both sides (seeded datagen)
    from logstash_filter_elastic_integration_spark import get_spark
    spark = get_spark(app_name="ab_datagen", cores=8, shuffle_partitions=8)
    tpath = bench.transcripts_cache(spark, sf_name, n_rows)
    spark.stop()

    head_sha = subprocess.run(
        ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True).stdout.strip()

    print(f"starting children (base={args.base_ref}, head={head_sha})...",
          file=sys.stderr)
    base = start_child(base_wt, "base", tpath)
    head = start_child(REPO, "head", tpath)

    # balanced interleave: ABBA ABBA ... cancels linear host drift
    order = []
    for i in range(args.passes):
        order += (["base", "head"] if i % 2 == 0 else ["head", "base"])
    results: dict[str, list[float]] = {"base": [], "head": []}
    for who in order:
        sec = run_pass(base if who == "base" else head)
        results[who].append(sec)
        print(f"  {who}: {sec:.3f}s", file=sys.stderr)
    for p in (base, head):
        p.stdin.write("QUIT\n")
        p.stdin.flush()

    out = {
        "protocol": "interleaved ABBA, warm JVMs, single shared input",
        "base_ref": args.base_ref, "head_ref": head_sha,
        "sf": sf_name, "rows": n_rows,
        "ts": int(time.time()),
        "base_passes": results["base"], "head_passes": results["head"],
        "base_min": min(results["base"]), "head_min": min(results["head"]),
        "base_median": sorted(results["base"])[len(results["base"]) // 2],
        "head_median": sorted(results["head"])[len(results["head"]) // 2],
        "speedup_min": round(min(results["base"]) / min(results["head"]), 3),
        "speedup_median": round(
            sorted(results["base"])[len(results["base"]) // 2]
            / sorted(results["head"])[len(results["head"]) // 2], 3),
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(os.path.join(REPO, args.out), "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
