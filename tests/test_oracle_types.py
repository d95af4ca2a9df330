"""Bind-time lint over every registry oracle's DuckDB output types.

Round-5 driver lesson: DuckDB types ``SUM(INTEGER)``/``SUM(BIGINT)`` and
``//`` of BIGINT as HUGEINT (int128).  The round driver's value hasher
serializes HUGEINT differently from BIGINT, so two numerically-equal
results hash unequal and the query goes red even though both faces agree
(CORRECTNESS_r05: source_token_budget, record_linkage,
rolling_median_revenue, incremental_lsh_dedup).  Every such aggregate must
be wrapped in ``CAST(... AS BIGINT)`` in the oracle SQL.

This test makes that failure class structurally impossible: it *binds*
(never executes) all oracles against the sf0.001 views and fails if any
output column is typed HUGEINT/UHUGEINT.  Reverting one of the casts in
``registry.py`` turns this red.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from pgsf_spark.analytics.registry import QUERIES

SF_DIR = os.environ.get("PGSF_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Types whose cross-engine serialization is not bit-stable in the driver's
# hasher.  HUGEINT is the proven offender; the rest are banned on the same
# principle (no oracle should ever emit them).
BANNED = ("HUGEINT", "UHUGEINT", "UINTEGER", "UBIGINT", "USMALLINT", "UTINYINT")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    yield c
    c.close()


_WITH_ORACLE = [name for name, spec in QUERIES.items() if spec.oracle is not None]


def test_every_query_has_an_oracle_or_is_whitelisted():
    # keep the no-oracle set deliberate: every new query should ship with one
    missing = sorted(name for name, spec in QUERIES.items() if spec.oracle is None)
    assert missing == [], f"queries without oracle SQL: {missing}"


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_binds_and_types_are_hashable(con, name):
    rel = con.sql(QUERIES[name].oracle)  # bind only -- no execution
    offenders = [
        (col, str(typ))
        for col, typ in zip(rel.columns, rel.types)
        if any(b in str(typ).upper() for b in BANNED)
    ]
    assert offenders == [], (
        f"{name}: oracle emits driver-unhashable column types {offenders}; "
        f"wrap the aggregate in CAST(... AS BIGINT)"
    )
