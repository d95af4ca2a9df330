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

sys.path.insert(0, "/root/repo")


def main() -> int:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "?"
    from tools.verify_local import _vanilla_spark

    from pgsf_spark.analytics.registry import QUERIES
    from pgsf_spark.verify import verify_queries

    n = len(QUERIES)
    spark = _vanilla_spark()
    greens = {}
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        results = verify_queries(spark, sf, log=lambda s: None)
        bad = [name for name, ok in results.items() if not ok]
        greens[sf] = n - len(bad)
        print(f"{sf}: {greens[sf]}/{n} green")
        if bad:
            print(f"RED at {sf}: {bad}")
    spark.stop()
    if any(g != n for g in greens.values()):
        return 1
    print(
        f"\nROUND-{rnd} CLOSE (run after the last code change, counts derived\n"
        f"from len(QUERIES)={n}): registry {n}/{n} hash-green at sf0.001 AND\n"
        f"{n}/{n} at sf0.01 under the driver-like vanilla session."
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
