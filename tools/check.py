#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir> [--timeout SECS]
Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over the
<sfDir> tables, sorts columns by name + rows by all columns, and compares
values exactly (with a float near-miss report to distinguish order-dependent
float drift from real bugs).

--timeout SECS (cross-sf soak mode): interrupt any oracle running longer
than SECS and report it as TIMEOUT (counted separately, not a FAIL) — at
sf1 a handful of all-pairs oracles are DuckDB-side DNFs while the engine
result is fine; without the watchdog one such oracle stalls the sweep.
"""
import sys, json, math, threading
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def cmp_col(a, b):
    """exact-equal, near-equal (floats), or mismatch"""
    if len(a) != len(b):
        return "len"
    av, bv = a.to_numpy(), b.to_numpy()
    try:
        if np.array_equal(av, bv):
            return "exact"
    except Exception:
        pass
    # elementwise with NaN handling
    exact = True
    near = True
    for x, y in zip(av, bv):
        if x is None and y is None:
            continue
        if isinstance(x, float) and isinstance(y, float):
            if math.isnan(x) and math.isnan(y):
                continue
            if x == y:
                continue
            exact = False
            if not math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-12):
                near = False
        else:
            if x != y:
                return "mismatch"
    if exact:
        return "exact"
    return "near" if near else "mismatch"

def main(sfdir, outdir, timeout=None):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    fails = 0
    timeouts = []
    import os
    for name in sorted(oracle):
        sql = oracle[name]
        if not os.path.exists(f"{outdir}/{name}"):
            # partial dev run (Verify with a name filter): only judge what
            # was dumped
            continue
        try:
            got = norm(pd.read_parquet(f"{outdir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: no spark result ({e})"); fails += 1; continue
        timer = None
        timed_out = []
        # per-query cursor: a stale watchdog interrupt can then only hit
        # THIS query's cursor, never leak into the next oracle on the
        # shared connection (which would be misreported as FAIL — its
        # fresh timed_out list wouldn't classify it as TIMEOUT)
        cur = con.cursor()
        if timeout:
            done = threading.Event()
            def watchdog(c=cur, flag=timed_out, ev=done):
                if not ev.is_set():
                    flag.append(1)
                    c.interrupt()
            timer = threading.Timer(timeout, watchdog)
            timer.start()
        try:
            exp = norm(cur.sql(sql).df())
        except Exception as e:
            if timed_out:
                print(f"TIMEOUT {name}: oracle exceeded {timeout}s (not a FAIL)")
                timeouts.append(name)
                continue
            print(f"FAIL {name}: oracle error: {e}"); fails += 1; continue
        finally:
            if timeout: done.set()
            if timer: timer.cancel()
            cur.close()
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            fails += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fails += 1; continue
        bad = []
        for c in got.columns:
            r = cmp_col(got[c], exp[c])
            if r != "exact":
                bad.append((c, r))
        if bad:
            print(f"FAIL {name}: {bad}")
            for c, r in bad[:3]:
                g, e = got[c].to_numpy(), exp[c].to_numpy()
                for i in range(len(g)):
                    geq = (g[i] == e[i]) or (isinstance(g[i], float) and isinstance(e[i], float)
                          and math.isnan(g[i]) and math.isnan(e[i]))
                    if not geq:
                        print(f"   {c}[{i}]: spark={g[i]!r} duck={e[i]!r}")
                        break
            fails += 1
        else:
            print(f"OK   {name} ({len(got)} rows)")
    extra = f", {len(timeouts)} oracle timeouts ({' '.join(timeouts)})" if timeouts else ""
    print(f"\n{len(oracle)-fails-len(timeouts)}/{len(oracle)} queries match{extra}")
    return 1 if fails else 0

if __name__ == "__main__":
    tmo = None
    argv = sys.argv[1:]
    if "--timeout" in argv:
        i = argv.index("--timeout")
        tmo = float(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    sys.exit(main(argv[0], argv[1], timeout=tmo))
