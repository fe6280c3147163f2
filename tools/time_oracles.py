#!/usr/bin/env python3
"""Time every oracle SQL in DuckDB at a given scale factor — the judge's
proxy-benchmark methodology (min-of-N warm, 32 threads, same parquet) —
and compare against BENCH_DETAIL.json warm Spark times.

Usage: python3 tools/time_oracles.py <sfDir> <oracle_sql.json> [seconds_cap_per_query]
Writes tools/duckdb_times.json: {"times": {name: sec}, "dnf": [...]}.
"""
import sys, json, time, threading, os
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def main(sfdir, oraclepath, cap=45.0):
    oracle = json.load(open(oraclepath))
    times, dnf = {}, []
    for name in sorted(oracle):
        con = duckdb.connect()
        con.sql("SET threads TO 32")
        for t in TABLES:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
        sql = oracle[name]
        best = None
        # warmup + 2 timed runs, min; a watchdog interrupts past the cap
        try:
            for i in range(3):
                done = [False]
                def watchdog():
                    t0 = time.time()
                    while not done[0]:
                        if time.time() - t0 > cap:
                            con.interrupt(); return
                        time.sleep(0.25)
                w = threading.Thread(target=watchdog, daemon=True); w.start()
                t0 = time.time()
                con.sql(sql).fetchall()
                el = time.time() - t0
                done[0] = True
                if i > 0:
                    best = el if best is None else min(best, el)
        except Exception as e:
            done[0] = True
            w.join(timeout=2)
            dnf.append(name)
            print(f"DNF  {name}: {str(e)[:80]}")
            try: con.close()
            except Exception: pass
            continue
        con.close()
        times[name] = round(best, 3)
        print(f"{times[name]:8.3f}  {name}")
    # anchor to the script dir: the runner may cwd elsewhere (e.g. /tmp so
    # DuckDB spill can't land inside the repo)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "duckdb_times.json")
    json.dump({"times": times, "dnf": dnf}, open(out, "w"), indent=0)
    print(f"\n{len(times)} timed, {len(dnf)} DNF, total {sum(times.values()):.1f}s")

if __name__ == "__main__":
    cap = float(sys.argv[3]) if len(sys.argv) > 3 else 45.0
    main(sys.argv[1], sys.argv[2], cap)
