#!/usr/bin/env python3
"""Streaming soak runner: drives graft.StreamSoak (incremental minhash
dedup + drift + rollup over the corpus as micro-batches through real
Structured Streaming foreachBatch), captures the per-batch walls and the
stream-vs-batch equivalence verdicts, and writes STREAM_SOAK.json.

The scale signal to read: per-batch wall must stay FLAT as the standing
signature index grows (the standing corpus is never re-read); the two
equivalence booleans must be true (the incremental decomposition is
exact). Usage:

    python3 tools/soak_streaming.py [sf_dir] [n_batches]
"""
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    batches = sys.argv[2] if len(sys.argv) > 2 else "12"
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_SOAK_BATCHES=batches)
    p = subprocess.run(
        ["sbt", "-batch", "runMain graft.StreamSoak"],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=3600)
    sys.stdout.write("\n".join(
        l for l in p.stdout.splitlines() if "SOAK" in l) + "\n")
    m = re.search(r"SOAK_SUMMARY (\{.*\})", p.stdout)
    if not m:
        sys.stderr.write(p.stdout[-3000:] + "\n" + p.stderr[-2000:] + "\n")
        sys.exit(f"no SOAK_SUMMARY line (rc {p.returncode})")
    summary = json.loads(m.group(1))
    out = os.path.join(ROOT, "STREAM_SOAK.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    ok = summary["pairs_equal_batch"] and summary["rollup_equal_batch"]
    # batch 0 pays JIT/codegen, so "flat" is judged against the
    # post-warmup median — and against the MAX post-warmup batch, not
    # just the last one, so a mid-run state-growth spike (or growth that
    # dips on a small final slice) cannot pass undetected
    walls = [b["wall_s"] for b in summary["batch_lines"]][1:]
    med = sorted(walls)[len(walls) // 2] if walls else 0.0
    worst = max(walls) if walls else 0.0
    flat = worst <= 2.0 * max(med, 0.5)
    print(f"soak: {summary['batches']} batches over {summary['docs']} docs, "
          f"walls first/last/max = {summary['wall_first_s']}/"
          f"{summary['wall_last_s']}/{summary['wall_max_s']}s, "
          f"pairs={summary['pairs_total']} equal={ok} flat={flat} -> {out}")
    if not ok:
        sys.exit("stream/batch equivalence FAILED")
    if not flat:
        sys.exit(f"per-batch wall grew >2x over the post-warmup median "
                 f"(worst {worst}s vs median {med}s) — state growth leak?")


if __name__ == "__main__":
    main()
