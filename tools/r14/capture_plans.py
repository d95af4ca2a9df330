"""Capture .explain('formatted') for the headline queries into plans/r14/.

Usage: python tools/r14/capture_plans.py <suffix> [query ...]
  suffix = 'before' | 'after' (file name suffix)

Uses the SAME session config as bench.py (pgsf_spark.session.get_spark) so
the captured plans are the plans the bench actually runs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from pgsf_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "pricing_summary",
    "revenue_by_nation",
    "region_volume",
    "top_orders_per_customer",
    "sessionize",
    "merge_upsert_customer",
    "dedup_exact",
    "minhash_lsh_pairs",
    "cosine_topk",
    "quality_score",
    "kmeans_clusters",
    "pagerank_neardup",
    "prefix_filter_pairs",
    "lsh_jaccard_verified",
]


def main():
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = "/root/repo/plans/r14"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("pgsf_spark_plan_capture")
    from pgsf_spark.analytics.registry import QUERIES

    for name in names:
        df = QUERIES[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
