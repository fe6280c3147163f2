#!/usr/bin/env python3
"""Oracle-typing lint: catch the DuckDB HUGEINT widening bug class.

Rounds 6 and 8 each lost a gate row to the same defect: an oracle SQL
whose output column types as DuckDB HUGEINT (windowed/plain SUM over
BIGINT widens; `x // y` on a HUGEINT stays HUGEINT) while the Spark side
emits LONG — values identical, hash mismatched.  This lint DESCRIBEs
every oracle against the real sf tables and fails if any output column
has a type Spark cannot emit (HUGEINT, UHUGEINT, unsigned ints, INT128).

Usage: python3 tools/lint_oracles.py <sfDir> <oracle_sql.json>
   or: python3 tools/lint_oracles.py <sfDir>            # runs graft.Verify's
                                                        # last dump if present
Exit 0 = all oracles clean; exit 1 = offending columns listed.
"""
import sys, json, os
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

# DuckDB types with no LONG/INT/DOUBLE/DECIMAL(<=38) Spark counterpart.
BAD_TYPES = ("HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT",
             "UTINYINT", "INT128")


def main():
    sf_dir = sys.argv[1]
    oracle_path = sys.argv[2] if len(sys.argv) > 2 else None
    if oracle_path is None:
        for cand in ("/tmp/graft_verify/oracle_sql.json",
                     os.path.join(os.path.dirname(__file__), "..",
                                  "target", "verify", "oracle_sql.json")):
            if os.path.exists(cand):
                oracle_path = cand
                break
    if oracle_path is None or not os.path.exists(oracle_path):
        print("lint_oracles: no oracle_sql.json found (run graft.Verify first)")
        sys.exit(2)

    oracles = json.load(open(oracle_path))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    # guard the guard: a lint that silently stopped detecting HUGEINT
    # would green-light the exact bug class it exists for — prove on a
    # known-widening query that detection still fires before trusting a
    # clean pass
    probe = con.execute(
        "DESCRIBE SELECT SUM(x) AS s FROM (SELECT CAST(1 AS BIGINT) AS x)"
    ).fetchall()
    assert any(any(b in typ.upper() for b in BAD_TYPES)
               for _, typ, *_ in probe), (
        "lint self-test failed: SUM(BIGINT) no longer DESCRIBEs as a "
        "bad type — update BAD_TYPES for this DuckDB version")

    bad, errs = [], []
    for name, sql in sorted(oracles.items()):
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            errs.append((name, str(e).splitlines()[0][:200]))
            continue
        for col, typ, *_ in desc:
            if any(b in typ.upper() for b in BAD_TYPES):
                bad.append((name, col, typ))

    for name, col, typ in bad:
        print(f"BAD TYPE  {name}.{col}: {typ} (add CAST(... AS BIGINT) "
              f"in the oracle SQL)")
    for name, err in errs:
        print(f"DESCRIBE FAILED  {name}: {err}")
    print(f"lint_oracles: {len(oracles)} oracles, {len(bad)} bad-typed "
          f"columns, {len(errs)} describe errors")
    sys.exit(1 if (bad or errs) else 0)


if __name__ == "__main__":
    main()
