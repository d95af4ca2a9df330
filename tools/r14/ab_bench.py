#!/usr/bin/env python3
"""Interleaved A/B bench: baseline tree vs optimized tree, same weather.

The host's idle-box noise band is wide (hypervisor steal drifts 0-8% across
an afternoon), so separate before/after bench runs mostly measure weather.
This harness interleaves COLD child samples (bench.py's own child mode --
identical measurement) from TWO checkouts, alternating A/B order per round,
so both trees see the same noise distribution; per-query medians and the
A/B ratio then attribute differences to CODE, not host state.

Usage:
  python tools/r14/ab_bench.py --baseline /tmp/r14_baseline [--rounds 4]
          [--out /tmp/ab_bench.json]

The baseline dir is a plain git worktree of the pre-optimization commit.
Each child is `python bench.py` with SPARK_GRAFT_BENCH_CHILD=1 run with
that tree's bench.py, so each tree imports its own engine code. Steal% and
load are recorded per sample; no gating (interleaving replaces it) but the
per-sample steal stays in the artifact for adjudication.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time


def run_child(tree: str) -> dict:
    bench = os.path.join(tree, "bench.py")
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, bench],
        env={**os.environ, "SPARK_GRAFT_BENCH_CHILD": "1"},
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=tree,
    )
    if proc.returncode != 0:
        print(proc.stderr[-4000:], file=sys.stderr)
        raise RuntimeError(f"child in {tree} failed rc={proc.returncode}")
    payload = json.loads(proc.stdout.strip().splitlines()[-1])
    payload["wall"] = round(time.time() - t0, 1)
    return payload


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--baseline", required=True, help="worktree of the before commit")
    ap.add_argument("--optimized", default="/root/repo")
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--out", default="/tmp/ab_bench.json")
    args = ap.parse_args()

    samples: dict[str, list[dict]] = {"A": [], "B": []}
    for r in range(args.rounds):
        # alternate order so slow drift hits both trees symmetrically
        order = [("A", args.baseline), ("B", args.optimized)]
        if r % 2:
            order.reverse()
        for label, tree in order:
            p = run_child(tree)
            samples[label].append(p)
            print(
                f"round {r} {label}: total="
                f"{round(sum(p['queries'].values()), 2)}s steal={p.get('steal_pct')}%",
                file=sys.stderr,
                flush=True,
            )

    names = sorted(samples["A"][0]["queries"])
    table = {}
    for n in names:
        a = statistics.median(s["queries"][n] for s in samples["A"])
        b = statistics.median(s["queries"][n] for s in samples["B"])
        table[n] = {
            "before": round(a, 3),
            "after": round(b, 3),
            "ratio": round(b / a, 3) if a else None,
        }
    tot_a = statistics.median(sum(s["queries"].values()) for s in samples["A"])
    tot_b = statistics.median(sum(s["queries"].values()) for s in samples["B"])
    out = {
        "rounds": args.rounds,
        "per_query": table,
        "total_before": round(tot_a, 3),
        "total_after": round(tot_b, 3),
        "total_ratio": round(tot_b / tot_a, 3),
        "steals_before": [s.get("steal_pct") for s in samples["A"]],
        "steals_after": [s.get("steal_pct") for s in samples["B"]],
        "raw": samples,
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "raw"}, indent=1))


if __name__ == "__main__":
    main()
