"""Per-query phase profiler for the headline set (diagnostic, NOT official).

For each query, in one warm session (bench-identical config):
  build_s  -- time to construct the DataFrame (driver-side fn() call)
  run1_s   -- first .count()/collect() (what bench times, minus its build)
  run2_s   -- second run (warm codegen; isolates JIT/codegen from compute)
  jobs     -- Spark jobs triggered by one run (extra driver actions show up)

Usage: python tools/r14/profile_queries.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pgsf_spark.session import get_spark  # noqa: E402
from tools.r14.capture_plans import HEADLINE  # noqa: E402


def main():
    names = sys.argv[1:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("pgsf_spark_profile")
    sc = spark.sparkContext
    from pgsf_spark.analytics.registry import QUERIES
    from pgsf_spark.tables import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    tracker = sc.statusTracker()
    print(f"{'query':28s} {'build_s':>8s} {'run1_s':>8s} {'run2_s':>8s} {'jobs':>5s}")
    for name in names:
        fn = QUERIES[name].fn
        sc.setJobDescription(f"profile:{name}")
        t0 = time.time()
        df = fn(spark, sf_dir)
        t1 = time.time()
        j0 = tracker.getJobIdsForGroup(None)
        n0 = df.count() if name != "cosine_topk" else len(df.collect())
        t2 = time.time()
        # jobs for one full fn()+count pass: rebuild to count the extra
        # driver actions inside fn() too
        df2 = fn(spark, sf_dir)
        _ = df2.count() if name != "cosine_topk" else len(df2.collect())
        t3 = time.time()
        j1 = tracker.getJobIdsForGroup(None)
        print(
            f"{name:28s} {t1 - t0:8.2f} {t2 - t1:8.2f} {t3 - t2:8.2f} "
            f"{len(set(j1) - set(j0)):5d}   rows={n0}"
        )
        sc.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
