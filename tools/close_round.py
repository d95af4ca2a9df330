"""Close-of-round certification ritual, mechanized (VERDICT r7 item 5).

Runs the full oracle sweep at BOTH scales under the driver-like vanilla
session, AFTER the round's last code change, and prints a ready-to-paste
PERF.md close block whose every count is DERIVED from ``len(QUERIES)`` --
rounds 6 and 7 both certified a hand-typed N while the registry held N+k;
this makes that drift impossible (tests/test_doc_counts.py then enforces
that the latest recorded close block matches the live registry).

Usage: python tools/close_round.py <round_number>
Exits non-zero if any query fails either sweep (a close block is only
printed for an all-green certification).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

# Sweep-time budget awareness (VERDICT r10 ask #5): the 8 availableNow
# streaming gates registered in round 11 each run a real bounded stream
# (~8-17 s), so every full-registry sweep carries a fixed streaming cost.
# The close ritual now records per-scale wall-clock and the streaming
# family's share; if the family ever exceeds this fraction of a sweep,
# run it once (not twice) in the double-certification ritual and note so
# in the close block.
STREAM_BUDGET_FRACTION = 0.25


def main() -> int:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "?"
    from tools.verify_local import _vanilla_spark

    from pgsf_spark.analytics.registry import QUERIES
    from pgsf_spark.verify import verify_queries

    n = len(QUERIES)
    streaming = {name for name in QUERIES if name.startswith("stream_")}
    spark = _vanilla_spark()
    greens = {}
    timings = {}
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        t0 = time.time()
        if streaming:
            ts0 = time.time()
            sresults = verify_queries(spark, sf, only=streaming, log=lambda s: None)
            stream_sec = time.time() - ts0
            bresults = verify_queries(
                spark, sf, only=set(QUERIES) - streaming, log=lambda s: None
            )
            results = {**sresults, **bresults}
        else:
            stream_sec = 0.0
            results = verify_queries(spark, sf, log=lambda s: None)
        total_sec = time.time() - t0
        bad = [name for name, ok in results.items() if not ok]
        greens[sf] = n - len(bad)
        timings[sf] = (total_sec, stream_sec)
        share = stream_sec / total_sec if total_sec else 0.0
        print(
            f"{sf}: {greens[sf]}/{n} green in {total_sec:.0f}s "
            f"(streaming family {stream_sec:.0f}s = {share:.0%})"
        )
        if share > STREAM_BUDGET_FRACTION:
            print(
                f"  NOTE: streaming share {share:.0%} exceeds the "
                f"{STREAM_BUDGET_FRACTION:.0%} budget -- run the streaming "
                f"family once (not twice) in the double-certification ritual"
            )
        if bad:
            print(f"RED at {sf}: {bad}")
    spark.stop()
    if any(g != n for g in greens.values()):
        return 1
    sweep_note = "; ".join(
        f"{sf.rsplit('/', 1)[-1]} {tot:.0f}s (streaming {s:.0f}s)"
        for sf, (tot, s) in timings.items()
    )
    print(
        f"\nROUND-{rnd} CLOSE (run after the last code change, counts derived\n"
        f"from len(QUERIES)={n}): registry {n}/{n} hash-green at sf0.001 AND\n"
        f"{n}/{n} at sf0.01 under the driver-like vanilla session.\n"
        f"Sweep wall-clock: {sweep_note}."
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
