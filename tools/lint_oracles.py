#!/usr/bin/env python3
"""Oracle-typing lint: catch the DuckDB gate-bridge typing bug classes.

Rounds 6 and 8 each lost a gate row to the same defect: an oracle SQL
whose output column types as DuckDB HUGEINT (windowed/plain SUM over
BIGINT widens; `x // y` on a HUGEINT stays HUGEINT) while the Spark side
emits LONG — values identical, hash mismatched.  Round 10 found the
same class one layer deeper: a DECIMAL(p,0) output with p > 18 crosses
DuckDB's dataframe bridge as float64 ("6377550.0") while Spark emits the
exact decimal — again values identical, hash mismatched (q58).  This
lint DESCRIBEs every oracle against the real sf tables and fails if any
output column has a type the gate bridge cannot round-trip.

Gate-safe output types (empirically, from 250+ green gate rows):
BIGINT / INTEGER / SMALLINT / TINYINT / DOUBLE / FLOAT / VARCHAR /
DATE / TIMESTAMP / BOOLEAN / DECIMAL(p<=18, 0) / DECIMAL(p, s>0)
(money-style sums bridge fine).  Unsafe: HUGEINT family (not
Spark-emittable at all) and DECIMAL(p>18, 0) (bridges as float64).
House rule for wide integer math: keep the DECIMAL guard INSIDE the
expression, CAST the final output column to BIGINT on BOTH sides —
under ANSI mode Spark fails loudly if a value ever exceeds 2^63.

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

import re
# DECIMAL(p,0) with p > 18: Spark emits it exactly but DuckDB's
# dataframe bridge renders it as float64 — the q58 (round 10) red class.
_WIDE_DEC = re.compile(r"DECIMAL\((\d+),\s*0\)")


def is_bad_type(typ):
    """(is_bad, reason) for a DESCRIBEd DuckDB column type string."""
    u = typ.upper()
    if any(b in u for b in BAD_TYPES):
        return True, "not Spark-emittable; add CAST(... AS BIGINT) in the oracle SQL"
    m = _WIDE_DEC.search(u)
    if m and int(m.group(1)) > 18:
        return True, ("scale-0 decimal wider than 18 digits bridges as "
                      "float64; CAST the final column to BIGINT on BOTH sides")
    return False, None


# ---------------------------------------------------------------------------
# Unrolled-CTE multiplicity lint (round 13): DuckDB re-inlines a plain CTE
# at every reference, so a chain of rounds whose CTEs are referenced >1x
# multiplies — q125's e0 re-ran its lineitem scan 125x (5 refs/round ^ 3
# rounds) and spilled 70+ GB at sf1 while hash-green at sf0.1.  This lint
# computes each CTE body's EVALUATION COUNT under inline-per-reference
# semantics (AS MATERIALIZED pins a body to one evaluation) and flags any
# oracle where a body evaluates more than INLINE_BUDGET times — catching
# the q84/q98/q125/q129/q155 class at authoring time, the way the type
# lint catches HUGEINT widening.

# Calibration (round 13, DuckDB 1.0.0 — EXPLAIN shows real per-reference
# inlining, 16 parquet scans in q88's plan): the sf1-DNF oracles measured
# 44x (old q98 `edges`) and 250x (old q125 `e0`); everything <= 24x passed
# the sf1 soak inside the 300s watchdog. 32 splits the decades with margin
# both ways.
INLINE_BUDGET = 32

# `name AS (` or column-aliased `name(c1, c2) AS (` — the alias-list form
# (q244/q247/q255/q259's VALUES weight tables) was invisible to the first
# regex, silently exempting those bodies and everything referencing them
# from the multiplicity walk (round-13 advice).
# KNOWN LIMITATION (conservative direction): reference counting matches
# the bare name anywhere outside `x.`/`.x` positions, so a single-letter
# CTE name that collides with an unqualified COLUMN name (`h` in
# q159/q176) counts the column uses too — it can only over-count, i.e.
# false-flag, never miss a real superlinear chain.
_CTE_DEF = re.compile(
    r"\b(\w+)\s*(?:\([^()]*\))?\s+AS\s+(MATERIALIZED\s+)?\(",
    re.IGNORECASE)


def _split_ctes(sql):
    """[(name, materialized, body)] in definition order, plus the main
    query text. Heuristic parse: `name AS [MATERIALIZED] (` at paren
    depth tracked from the start; robust for generated oracle SQL."""
    ctes, pos, main_start = [], 0, 0
    while True:
        m = _CTE_DEF.search(sql, pos)
        if not m:
            break
        # body = balanced-paren span from the opening paren
        depth, i = 1, m.end()
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        ctes.append((m.group(1).lower(), bool(m.group(2)),
                     sql[m.end():i - 1]))
        pos = i
        main_start = i
    return ctes, sql[main_start:]


def cte_eval_counts(sql):
    """{cte_name: times its body evaluates} under inline semantics."""
    ctes, main = _split_ctes(sql)
    names = [n for n, _, _ in ctes]
    mult = {}
    # walk DEFINITION order reversed: a CTE can only be referenced by
    # later CTEs or the main query, whose mults are then already known
    refs_in = {}
    for idx, (name, _, _) in enumerate(ctes):
        # a reference = the name in table position: exclude qualified
        # column uses (`pn.id`, `dx.deg`) on either side of a dot
        pat = re.compile(rf"(?<![\w.]){re.escape(name)}\b(?!\s*\.)",
                         re.IGNORECASE)
        refs_in[name] = {
            "__main__": len(pat.findall(main)),
            **{later: len(pat.findall(body))
               for later, _, body in ctes[idx + 1:]},
        }
    mult["__main__"] = 1
    for name, materialized, _ in reversed(ctes):
        evals = sum(cnt * mult[ctx] for ctx, cnt in refs_in[name].items()
                    if ctx in mult)
        mult[name] = 1 if materialized else max(evals, 1)
    mult.pop("__main__")
    return mult


def lint_cte_multiplicity(oracles):
    flagged = []
    for name, sql in sorted(oracles.items()):
        if not re.search(r"\bWITH\b", sql, re.IGNORECASE):
            continue
        for cte, n in cte_eval_counts(sql).items():
            if n > INLINE_BUDGET:
                flagged.append((name, cte, n))
    return flagged


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
    assert any(is_bad_type(typ)[0] for _, typ, *_ in probe), (
        "lint self-test failed: SUM(BIGINT) no longer DESCRIBEs as a "
        "bad type — update BAD_TYPES for this DuckDB version")
    # second probe: the round-10 q58 signature — a wide scale-0 decimal
    # product (DECIMAL(19,0) * BIGINT -> DECIMAL(38,0)) must be flagged,
    # while DECIMAL(18,0) and DECIMAL(38,6) must pass
    probe2 = con.execute(
        "DESCRIBE SELECT CAST(2 AS DECIMAL(19,0)) * CAST(3 AS BIGINT) AS w, "
        "CAST(1 AS DECIMAL(18,0)) AS ok1, CAST(1.5 AS DECIMAL(38,6)) AS ok2"
    ).fetchall()
    verdicts = {col: is_bad_type(typ)[0] for col, typ, *_ in probe2}
    assert verdicts == {"w": True, "ok1": False, "ok2": False}, (
        f"lint self-test failed: wide scale-0 decimal detection broken "
        f"({verdicts}) — update is_bad_type for this DuckDB version")

    bad, errs = [], []
    for name, sql in sorted(oracles.items()):
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            errs.append((name, str(e).splitlines()[0][:200]))
            continue
        for col, typ, *_ in desc:
            is_bad, reason = is_bad_type(typ)
            if is_bad:
                bad.append((name, col, typ, reason))

    # guard the guard (CTE lint): a q125-shaped plain chain must be
    # flagged, its MATERIALIZED twin must pass
    _chain = ("WITH e0 AS {m}(SELECT 1 AS x), "
              "d0 AS {m}(SELECT x FROM (SELECT x FROM e0 UNION ALL "
              "SELECT x FROM e0) q JOIN e0 USING(x) JOIN e0 e USING(x) "
              "JOIN e0 f USING(x)), "
              "d1 AS {m}(SELECT x FROM (SELECT x FROM d0 UNION ALL "
              "SELECT x FROM d0) q JOIN d0 USING(x) JOIN d0 e USING(x) "
              "JOIN d0 f USING(x)), "
              "d2 AS {m}(SELECT x FROM (SELECT x FROM d1 UNION ALL "
              "SELECT x FROM d1) q JOIN d1 USING(x) JOIN d1 e USING(x) "
              "JOIN d1 f USING(x)) SELECT * FROM d2")
    assert lint_cte_multiplicity({"p": _chain.format(m="")}), (
        "lint self-test failed: plain exponential CTE chain not flagged "
        "— update _split_ctes/cte_eval_counts")
    assert not lint_cte_multiplicity(
        {"p": _chain.format(m="MATERIALIZED ")}), (
        "lint self-test failed: MATERIALIZED chain falsely flagged")
    # third probe: the column-aliased definition form `w(a, b) AS (...)`
    # must parse as a CTE named w — the pre-round-14 regex skipped the
    # alias list and bound the LAST alias column as the CTE name, so
    # aliased bodies (and chains through them) escaped the walk
    _aliased = _chain.format(m="").replace("e0 AS (SELECT 1 AS x)",
                                           "e0(x) AS (SELECT 1)", 1)
    assert "e0(x)" in _aliased
    _names = [n for n, _, _ in _split_ctes(_aliased)[0]]
    assert _names[0] == "e0" and lint_cte_multiplicity({"p": _aliased}), (
        "lint self-test failed: column-aliased CTE definition not parsed "
        f"(names={_names}) — update _CTE_DEF")
    supers = lint_cte_multiplicity(oracles)

    for name, col, typ, reason in bad:
        print(f"BAD TYPE  {name}.{col}: {typ} ({reason})")
    for name, err in errs:
        print(f"DESCRIBE FAILED  {name}: {err}")
    for name, cte, n in supers:
        print(f"SUPERLINEAR CTE  {name}: `{cte}` inlines {n}x "
              f"(> {INLINE_BUDGET}) — add AS MATERIALIZED to the "
              f"multi-referenced CTEs (the q98/q125 sf1-DNF class)")
    print(f"lint_oracles: {len(oracles)} oracles, {len(bad)} bad-typed "
          f"columns, {len(errs)} describe errors, "
          f"{len(supers)} superlinear CTEs")
    sys.exit(1 if (bad or errs or supers) else 0)


if __name__ == "__main__":
    main()
