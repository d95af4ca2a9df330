"""Local mini-driver: run every queries() entry on Spark and its oracle on
DuckDB, compare row count + column names + order-insensitive value hash.

Usage: python tools/verify_local.py [sf_dir] [query ...]

Thin wrapper over pgsf_spark.verify (the same comparison the CLI's
``verify`` subcommand runs); approximates the round driver's CORRECTNESS
check so mismatches are caught before the round ends.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pgsf_spark.session import get_spark  # noqa: E402
from pgsf_spark.verify import verify_queries  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("verify_local")
    results = verify_queries(spark, sf_dir, only=only)
    n_pass = sum(1 for v in results.values() if v)
    n_fail = len(results) - n_pass
    print(f"\n{n_pass} pass, {n_fail} fail")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
