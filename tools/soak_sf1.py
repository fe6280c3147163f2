#!/usr/bin/env python3
"""sf1 soak: the round-close third-decade gate.

Builds a referential-integrity-preserving 10x scale-up of sf0.1 (once;
reused if present), runs every DATA-HEAVY oracled query (DuckDB warm time
>= 0.2s in tools/duckdb_times.json -- the ones whose cost actually moves
with data volume) through graft.Verify at sf1, then oracle-checks with a
300s watchdog. This is the only gate that can see third-decade plan
cliffs (round 12: q96's single-task hot block; round 13: the q98/q125
exponential CTE re-inlining) -- sf0.01/sf0.1 pass regardless.

Round-14 hardening:
 - the heavy set unions duckdb_times.json's `dnf` list and, via a cheap
   Verify --sql-only preflight, any oracle MISSING from duckdb_times.json
   entirely (exactly the newest/heaviest queries the gate exists to
   catch; before, both were silently omitted).
 - q67 (SemDeDup) is CHECKED at sf1 instead of documented as an
   oracle-side timeout: see _patch_q67_oracle / _q67_stratum_check.
 - per-query engine wall times (outDir/engine_times.json, written by
   Verify) are copied to BENCH_SF1.json so the third decade carries a
   perf trend line, not just a correctness bit.

Usage:  python3 tools/soak_sf1.py [--rebuild]
Expects: no other sbt process on the repo (build-lock).
Writes:  /tmp/graft_sf1 (data), /tmp/soak_sf1_out (dumps + report),
         BENCH_SF1.json (repo root, commit with the round close).
"""
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = "/tmp/graft_sf1"
OUT = "/tmp/soak_sf1_out"
HEAVY_CUTOFF_S = 0.2
REPO_SF01 = "/root/testdata/sf0.1"

# q67's committed oracle is EXACT SemDeDup -- the all-pairs cosine>=tau
# closure, Th(n^2) dots by definition (~200M pairs x 64 dims at sf1's 20k
# vectors), an irreducible oracle-side cost that DNFs the 300s watchdog.
# At sf1 the EXACT answer has a cheaper equivalent form, because ScaleUp
# replicates each sf0.1 embedding verbatim under 10 shifted vec_ids:
#   - replica pairs have cosine exactly 1 (>= tau);
#   - cross-original pairs have the SAME cosine as at sf0.1 (the vectors
#     are identical), and the sf0.1 gate hash-verifies the full brute
#     closure every round showing NO >=tau pair among distinct originals.
# So exact SemDeDup at sf1 == group-by-identical-embedding, canonical =
# min vec_id -- O(n), and _q67_stratum_check() re-validates the premise
# ON sf1 DATA with a bounded brute closure over a deterministic stratum
# (vec_id % 7 = 0, ~3k vectors => ~4M pairs): the >=tau pair set within
# the stratum must equal the identical-embedding pair set exactly.
Q67 = "q67_semantic_dedup"
Q67_SF1_ORACLE = """
WITH grp AS (
  SELECT vec_id, MIN(vec_id) OVER (PARTITION BY embedding) AS lbl
  FROM embeddings)
SELECT vec_id, lbl AS canonical_id,
  CASE WHEN lbl <> vec_id THEN 1 ELSE 0 END AS is_dup
FROM grp ORDER BY vec_id"""

Q67_STRATUM_SQL = """
WITH sub AS MATERIALIZED (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 7 = 0),
flat AS MATERIALIZED (
  SELECT vec_id, unnest(range(1, len(embedding)+1)) AS i,
         unnest(embedding)::DOUBLE AS v FROM sub),
norms AS MATERIALIZED (
  SELECT vec_id,
         CAST(SUM(CAST(floor(v * v * 1e15) AS BIGINT)) AS BIGINT) AS norm
  FROM flat GROUP BY vec_id),
dots AS (
  SELECT a.vec_id AS va, b.vec_id AS vb,
         CAST(SUM(CAST(floor(a.v * b.v * 1e15) AS BIGINT)) AS BIGINT) AS dot
  FROM flat a JOIN flat b ON a.i = b.i AND a.vec_id < b.vec_id
  GROUP BY 1, 2),
close AS MATERIALIZED (
  SELECT d.va, d.vb FROM dots d
  JOIN norms na ON na.vec_id = d.va JOIN norms nb ON nb.vec_id = d.vb
  WHERE CAST(d.dot AS DOUBLE)
    / (sqrt(CAST(na.norm AS DOUBLE)) * sqrt(CAST(nb.norm AS DOUBLE))) >= 0.9),
ident AS MATERIALIZED (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM sub a JOIN sub b
    ON a.embedding = b.embedding AND a.vec_id < b.vec_id)
SELECT
  (SELECT count(*) FROM sub) AS n_stratum,
  (SELECT count(*) FROM close) AS n_close,
  (SELECT count(*) FROM ident) AS n_ident,
  (SELECT count(*) FROM (SELECT * FROM close EXCEPT SELECT * FROM ident) q)
    AS close_not_ident,
  (SELECT count(*) FROM (SELECT * FROM ident EXCEPT SELECT * FROM close) q)
    AS ident_not_close"""


def run(cmd, **kw):
    print(f"[soak] $ {' '.join(cmd[:4])}{' ...' if len(cmd) > 4 else ''}",
          flush=True)
    subprocess.run(cmd, check=True, cwd=REPO, **kw)


def _heavy_set(env):
    """Data-heavy names: measured >= cutoff, PLUS duckdb-side DNFs, PLUS
    any oracle duckdb_times.json has never seen (both classes are exactly
    the heaviest/newest queries; before round 14 they were silently
    dropped from the soak)."""
    d = json.load(open(f"{REPO}/tools/duckdb_times.json"))
    times, dnf = d["times"], d.get("dnf", [])
    run(["sbt", "-batch", f"runMain graft.Verify {SF1} {OUT} --sql-only"],
        env=env)
    all_names = sorted(json.load(open(f"{OUT}/oracle_sql.json")))
    unknown = [n for n in all_names if n not in times and n not in dnf]
    if unknown:
        print(f"[soak] WARNING: {len(unknown)} oracles unknown to "
              f"tools/duckdb_times.json (stale -- rerun tools/"
              f"time_oracles.py): {' '.join(unknown)}; soaking them anyway")
    heavy = sorted({n for n, t in times.items() if t >= HEAVY_CUTOFF_S}
                   | set(dnf) | set(unknown))
    print(f"[soak] {len(heavy)} data-heavy queries (duckdb >= "
          f"{HEAVY_CUTOFF_S}s at sf0.1, + {len(dnf)} dnf, "
          f"+ {len(unknown)} unmeasured)")
    return heavy


def _patch_q67_oracle(outdir):
    """Swap q67's brute-closure oracle for the sf1-equivalent structural
    form (see module comment) so check.py verifies all 20k rows in O(n)
    instead of TIMEOUTing on 200M dots."""
    p = f"{outdir}/oracle_sql.json"
    oracles = json.load(open(p))
    if Q67 in oracles:
        oracles[Q67] = Q67_SF1_ORACLE
        json.dump(oracles, open(p, "w"))
        print(f"[soak] {Q67}: oracle swapped to the sf1 structural form "
              "(identical-embedding grouping; premise re-validated by the "
              "stratum brute check)")


def _q67_stratum_check():
    """Brute-force the >=tau closure over a deterministic ~1/7 stratum of
    sf1 embeddings and require it to equal the identical-embedding pair
    set exactly -- validating, on sf1 data, the premise that makes the
    structural q67 oracle the exact answer."""
    import duckdb
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{SF1}/embeddings.parquet'")
    row = con.sql(Q67_STRATUM_SQL).fetchone()
    n_stratum, n_close, n_ident, extra, missing = row
    print(f"[soak] q67 stratum: {n_stratum} vectors, {n_close} pairs >= "
          f"tau, {n_ident} identical-embedding pairs, "
          f"{extra} close-not-ident, {missing} ident-not-close")
    if not (n_close > 0 and extra == 0 and missing == 0):
        print("[soak] FAIL: q67 stratum brute closure disagrees with the "
              "identical-embedding premise -- the structural oracle is "
              "NOT valid on this data; investigate before trusting q67")
        return False
    return True


def main():
    env = dict(os.environ, SPARK_GRAFT_CPUS="16")
    if "--rebuild" in sys.argv or not os.path.exists(f"{SF1}/lineitem.parquet"):
        run(["sbt", "-batch",
             f"runMain graft.tools.ScaleUp {REPO_SF01} {SF1} 10"])
    heavy = _heavy_set(env)
    run(["sbt", "-batch",
         f"runMain graft.Verify {SF1} {OUT} {','.join(heavy)}"], env=env)
    _patch_q67_oracle(OUT)
    ok = _q67_stratum_check()
    # per-query engine wall at sf1 -> committed artifact (perf trend for
    # the third decade; Bench only runs at the driver's sf)
    et = f"{OUT}/engine_times.json"
    if os.path.exists(et):
        times = json.load(open(et))
        # trend gate, not a snapshot: diff against the PREVIOUS round's
        # committed walls before overwriting, so a query whose sf1 cost
        # regressed >1.5x is flagged at the round close, not discovered
        # two rounds later
        prev_path = f"{REPO}/BENCH_SF1.json"
        if os.path.exists(prev_path):
            prev = json.load(open(prev_path)).get("queries", {})
            grown = sorted(
                ((n, prev[n], t) for n, t in times.items()
                 if n in prev and prev[n] >= 1.0 and t > 1.5 * prev[n]),
                key=lambda x: -x[2] / x[1])
            if grown:
                print(f"[soak] WARNING: {len(grown)} queries grew >1.5x "
                      "vs the committed BENCH_SF1.json (ambient load? "
                      "re-run in a quiet window before believing it):")
                for n, p, t in grown:
                    print(f"[soak]   {n}: {p:.1f}s -> {t:.1f}s "
                          f"({t / p:.1f}x)")
            else:
                print("[soak] trend vs committed BENCH_SF1.json: no "
                      "query grew >1.5x (of those >=1s before)")
        art = {"metric": "sf1_engine_total",
               "value": round(sum(times.values()), 3), "unit": "sec",
               "queries": times, "sf": SF1, "cpus": 16,
               "note": "graft.Verify wall per query at sf1 "
                       "(plan+execute+write one coalesced parquet)"}
        json.dump(art, open(f"{REPO}/BENCH_SF1.json", "w"), indent=1)
        top = sorted(times.items(), key=lambda kv: -kv[1])[:10]
        print("[soak] slowest engine queries at sf1: " +
              ", ".join(f"{k}={v:.1f}s" for k, v in top))
        print(f"[soak] wrote BENCH_SF1.json (engine total "
              f"{art['value']}s over {len(times)} queries)")
    # cwd=/tmp so a DuckDB spill lands outside the repo (a 70 GB .tmp in
    # the repo wedges git add and fills the partition)
    rc = subprocess.run([sys.executable, f"{REPO}/tools/check.py", SF1, OUT,
                         "--timeout", "300"], cwd="/tmp").returncode
    if rc or not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
