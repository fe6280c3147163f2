#!/usr/bin/env python3
"""sf1 soak: the round-close third-decade gate.

Builds a referential-integrity-preserving 10x scale-up of sf0.1 (once;
reused if present), runs every DATA-HEAVY oracled query (DuckDB warm time
>= 0.2s in tools/duckdb_times.json -- the ones whose cost actually moves
with data volume) through graft.Verify at sf1, then oracle-checks with a
300s watchdog. This is the only gate that can see third-decade plan
cliffs (round 12: q96's single-task hot block; round 13: the q98/q125
exponential CTE re-inlining) -- sf0.01/sf0.1 pass regardless.

Usage:  python3 tools/soak_sf1.py [--rebuild]
Expects: no other sbt process on the repo (build-lock).
Writes:  /tmp/graft_sf1 (data), /tmp/soak_sf1_out (dumps + report).
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = "/tmp/graft_sf1"
OUT = "/tmp/soak_sf1_out"
HEAVY_CUTOFF_S = 0.2


def run(cmd, **kw):
    print(f"[soak] $ {' '.join(cmd[:4])}{' ...' if len(cmd) > 4 else ''}",
          flush=True)
    subprocess.run(cmd, check=True, cwd=REPO, **kw)


def main():
    if "--rebuild" in sys.argv or not os.path.exists(f"{SF1}/lineitem.parquet"):
        run(["sbt", "-batch",
             f"runMain graft.tools.ScaleUp {REPO_SF01} {SF1} 10"])
    times = json.load(open(f"{REPO}/tools/duckdb_times.json"))["times"]
    heavy = sorted(n for n, t in times.items() if t >= HEAVY_CUTOFF_S)
    print(f"[soak] {len(heavy)} data-heavy queries (duckdb >= "
          f"{HEAVY_CUTOFF_S}s at sf0.1)")
    env = dict(os.environ, SPARK_GRAFT_CPUS="16")
    run(["sbt", "-batch",
         f"runMain graft.Verify {SF1} {OUT} {','.join(heavy)}"], env=env)
    # cwd=/tmp so a DuckDB spill lands outside the repo (a 70 GB .tmp in
    # the repo wedges git add and fills the partition)
    subprocess.run([sys.executable, f"{REPO}/tools/check.py", SF1, OUT,
                    "--timeout", "300"], check=True, cwd="/tmp")


REPO_SF01 = "/root/testdata/sf0.1"

if __name__ == "__main__":
    main()
