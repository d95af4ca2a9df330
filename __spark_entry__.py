"""Driver contract for the spark-graft builder (PySpark target).

entry()      -- flagship query smoke check at sf0.001.
queries()    -- every implemented operator from SURVEY.md §2 + the extended
                analytics layer, keyed by name; callables take (spark, sf_dir).
oracle_sql() -- matching DuckDB SQL per key (same aliases, exact-decimal
                aggregation for float parity). See pgsf_spark/analytics/registry.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the driver may import this module from any cwd
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pgsf_spark.analytics.registry import QUERIES

    return QUERIES["revenue_by_nation"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pgsf_spark.analytics.registry import QUERIES

    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from pgsf_spark.analytics.registry import QUERIES

    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}
