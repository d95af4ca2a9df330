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
# hasher.  HUGEINT is the proven offender (round 5); DECIMAL is the round-6
# one -- DuckDB's pandas conversion renders DECIMAL as float64 ("1.0") while
# Spark DecimalType arrives as Decimal('1.000000000'), so a trailing-zero
# value hashes unequal despite being the same number
# (hits_hubs_authorities, CORRECTNESS_r06).  The rest are banned on the same
# principle (no oracle should ever emit them).
BANNED = (
    "HUGEINT",
    "UHUGEINT",
    "UINTEGER",
    "UBIGINT",
    "USMALLINT",
    "UTINYINT",
    "DECIMAL",
)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    yield c
    c.close()


_WITH_ORACLE = [name for name, spec in QUERIES.items() if spec.oracle is not None]


def test_registry_has_no_duplicate_keys():
    # a duplicate dict key is silently shadowed by Python -- round 7 found
    # event_trigrams defined twice (the older spec dead).  Lint the source.
    import re
    from collections import Counter

    import pgsf_spark.analytics.registry as reg

    src = open(reg.__file__).read()
    names = re.findall(r'"([a-z0-9_]+)": QuerySpec', src)
    dupes = sorted(n for n, c in Counter(names).items() if c > 1)
    assert dupes == [], f"duplicate registry keys (first spec silently dead): {dupes}"


def test_round_front_is_the_first_fifty():
    # the correctness driver gates the first 50 dict entries; the round
    # front list must BE that prefix or the rotation plan silently skews
    import pgsf_spark.analytics.registry as reg

    # always gate on the LATEST round's front (highest-numbered list), so
    # this test can't silently pin a stale rotation
    rounds = sorted(
        int(a[len("_ROUND") : -len("_FRONT")])
        for a in dir(reg)
        if a.startswith("_ROUND") and a.endswith("_FRONT")
    )
    front = getattr(reg, f"_ROUND{rounds[-1]}_FRONT")
    assert list(reg.QUERIES)[: len(front)] == front


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
        f"wrap the aggregate in CAST(... AS BIGINT) (ints) or "
        f"CAST(... AS DOUBLE) (decimals)"
    )


def test_banned_decimal_output_is_actually_caught(con):
    # canary: prove the lint would flag a DECIMAL-output oracle, so a
    # future edit that narrows BANNED can't silently reopen the class
    rel = con.sql("SELECT CAST(1 AS DECIMAL(18,9)) AS authority")
    assert any("DECIMAL" in str(t).upper() for t in rel.types)
    assert any(b in str(rel.types[0]).upper() for b in BANNED)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_pandas_dtypes_are_hash_stable(con, name):
    """Value-level canary beyond type names: execute each oracle at sf0.001
    and assert no output column materializes as Python ``Decimal``/``int128``
    objects in pandas.  Catches any future DuckDB type the name-based BANNED
    tuple doesn't enumerate (the round-6 verdict's item 3)."""
    df = con.sql(QUERIES[name].oracle).df()
    from decimal import Decimal

    for col in df.columns:
        s = df[col]
        if s.dtype == object and len(s) > 0:
            sample = next((v for v in s if v is not None), None)
            assert not isinstance(sample, Decimal), (
                f"{name}.{col}: oracle materializes Decimal objects in "
                f"pandas -- cast the output column to DOUBLE"
            )


def _staged_with_oracle() -> dict:
    """All still-staged batches' oracle specs: the live-registry lints
    above only fire at REGISTRATION, which is how from_json_corrupt_gate
    reached round 12 with a bare SUM (HUGEINT) -- lint staged batches
    BEFORE their round so a promotion is never a lint-triage session."""
    from pgsf_spark.analytics.registry_r13 import STAGED_QUERIES_R13
    from pgsf_spark.analytics.registry_r14 import STAGED_QUERIES_R14
    from pgsf_spark.analytics.registry_r15 import STAGED_QUERIES_R15
    from pgsf_spark.analytics.registry_r16 import STAGED_QUERIES_R16
    from pgsf_spark.analytics.registry_r17 import STAGED_QUERIES_R17
    from pgsf_spark.analytics.registry_r18 import STAGED_QUERIES_R18
    from pgsf_spark.analytics.registry_r19 import STAGED_QUERIES_R19
    from pgsf_spark.analytics.registry_r20 import STAGED_QUERIES_R20
    from pgsf_spark.analytics.registry_r21 import STAGED_QUERIES_R21

    return {
        name: spec
        for batch in (
            STAGED_QUERIES_R13,
            STAGED_QUERIES_R14,
            STAGED_QUERIES_R15,
            STAGED_QUERIES_R16,
            STAGED_QUERIES_R17,
            STAGED_QUERIES_R18,
            STAGED_QUERIES_R19,
            STAGED_QUERIES_R20,
            STAGED_QUERIES_R21,
        )
        for name, spec in batch.items()
        if spec.oracle is not None
    }


@pytest.mark.parametrize("name", sorted(_staged_with_oracle()))
def test_staged_oracle_binds_and_types_are_hashable(con, name):
    spec = _staged_with_oracle()[name]
    rel = con.sql(spec.oracle)  # bind only -- no execution
    offenders = [
        (col, str(typ))
        for col, typ in zip(rel.columns, rel.types)
        if any(b in str(typ).upper() for b in BANNED)
    ]
    assert offenders == [], (
        f"{name} (staged): oracle emits driver-unhashable column types "
        f"{offenders}; wrap the aggregate in CAST(... AS BIGINT) (ints) "
        f"or CAST(... AS DOUBLE) (decimals)"
    )
