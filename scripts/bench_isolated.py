#!/usr/bin/env python3
"""Isolated-timing lane for the bench harness.

Interleaved suite numbers (one JVM running every query back-to-back)
carry cache-pressure cross-talk: a query can look 2-3x slower purely
because 260 other queries churned the block manager and page cache
around it. This script makes the isolated column a standing artifact:

  1. run (or reuse) the full interleaved bench -> bench_last.json
  2. take the N slowest queries
  3. re-run each ALONE in a fresh JVM, min of SPARK_GRAFT_BENCH_N=5
     passes (scripts/run.sh graft.Bench with SPARK_GRAFT_BENCH_ONLY)
  4. emit {interleaved, isolated} per slow query plus the full
     interleaved map into BENCH_LOCAL_r<N>.json

Usage: python3 scripts/bench_isolated.py <round> [n_slowest=8]
       [--reuse bench_last.json]  (skip step 1 if a fresh one exists)
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
       SPARK_GRAFT_CPUS (default 8)
"""
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(env_extra, out_path):
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env.setdefault("SPARK_GRAFT_CPUS", "8")
    env.update(env_extra)
    env["SPARK_GRAFT_BENCH_OUT"] = out_path
    subprocess.run([os.path.join(REPO, "scripts/run.sh"), "graft.Bench"],
                   cwd=REPO, env=env, check=True,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    with open(out_path) as f:
        return json.load(f)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    rnd = args[0] if args else "0"
    n_slow = int(args[1]) if len(args) > 1 else 8
    reuse = None
    for i, a in enumerate(sys.argv):
        if a == "--reuse":
            reuse = sys.argv[i + 1]

    if reuse:
        with open(reuse) as f:
            inter = json.load(f)
        print(f"[isolated] reusing interleaved run from {reuse}")
    else:
        print("[isolated] running full interleaved bench ...")
        inter = run_bench({}, os.path.join(REPO, "bench_last.json"))

    qs = {k: v for k, v in inter["queries"].items() if v >= 0}
    slowest = sorted(qs, key=qs.get, reverse=True)[:n_slow]
    print(f"[isolated] {len(qs)} queries, re-running {n_slow} slowest "
          f"in fresh JVMs (min of 5): {slowest}")

    isolated = {}
    for q in slowest:
        with tempfile.NamedTemporaryFile(suffix=".json") as tf:
            r = run_bench({"SPARK_GRAFT_BENCH_ONLY": q,
                           "SPARK_GRAFT_BENCH_N": "5"}, tf.name)
        # BENCH_ONLY matches by prefix; take the exact name
        isolated[q] = r["queries"].get(q, r["value"])
        print(f"[isolated] {q}: interleaved={qs[q]:.2f}s "
              f"isolated={isolated[q]:.2f}s")

    out = {
        "metric": inter["metric"], "value": inter["value"],
        "unit": inter["unit"], "n_queries": inter.get("n_queries"),
        "sf": inter["sf"], "n": inter["n"], "failed": inter["failed"],
        "skew": inter.get("skew"), "action": inter["action"],
        "queries": inter["queries"],
        "isolated": {q: {"interleaved": qs[q], "isolated": isolated[q]}
                     for q in slowest},
        "isolated_method":
            "fresh JVM per query, min of 5 passes, same sf/cpus",
    }
    dest = os.path.join(REPO, f"BENCH_LOCAL_r{rnd}.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[isolated] wrote {dest}")


if __name__ == "__main__":
    main()
