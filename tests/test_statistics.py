"""Regression locks for the statistics-gate review fixes: CUSUM's S_0
baseline (a day-one shift must register drift) and the JS divergence full
smoothed support grid."""

from datetime import datetime

import pytest

from pgsf_spark.analytics.corpus import JS_TOP, q_source_js_divergence
from pgsf_spark.analytics.profiling import q_cusum_changepoints
from pgsf_spark.tables import TABLES, load_table


@pytest.fixture()
def tiny_sf(spark, tmp_path):
    """A minimal sf dir: real schemas, tiny hand-built orders/documents."""
    real = "/root/testdata/sf0.001"
    root = tmp_path / "sf_tiny"
    root.mkdir()
    for t in TABLES:
        load_table(spark, real, t).limit(0).write.mode("overwrite").parquet(
            str(root / f"{t}.parquet")
        )
    return str(root)


class TestCusumBaseline:
    def test_day_one_shift_registers_drift(self, spark, tiny_sf):
        # revenue [0.30, 0.00-ish, 0.00-ish]: the shift happens on day ONE.
        # Before the S_0 = 0 baseline fix, min_prefix always included the
        # day's own S, so up_drift was identically zero and max_up_drift
        # reported 0 -- the alarm could never see an immediate shift.
        rows = [
            (1, 1, "O", 0.30, datetime(2024, 1, 1), "1-URGENT"),
            (2, 1, "O", 0.01, datetime(2024, 1, 2), "1-URGENT"),
            (3, 1, "O", 0.01, datetime(2024, 1, 3), "1-URGENT"),
        ]
        spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        ).write.mode("overwrite").parquet(f"{tiny_sf}/orders.parquet")
        r = q_cusum_changepoints(spark, tiny_sf).collect()[0]
        assert r.n_days == 3
        assert r.max_up_drift_usd > 0  # was exactly 0 under the bug


class TestJsSupportGrid:
    def test_disjoint_source_gets_full_grid_and_high_divergence(self, spark, tiny_sf):
        # s2 shares NO token with the corpus majority: before the grid fix
        # its absent-slot smoothed terms were dropped and the divergence
        # collapsed toward zero; now every source sums over all
        # JS_TOP + 1 slots and the disjoint source diverges strongly.
        docs = [(i, "alpha beta gamma delta", "en", "s1", 20) for i in range(20)]
        docs += [(100 + i, "omega psi chi phi", "en", "s2", 16) for i in range(2)]
        spark.createDataFrame(
            docs, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.mode("overwrite").parquet(f"{tiny_sf}/documents.parquet")
        rows = {r.source: r for r in q_source_js_divergence(spark, tiny_sf).collect()}
        # this corpus has 8 distinct tokens -> support = 8 + OOV slots; the
        # grid property is that EVERY source sums over ALL of them (the bug
        # gave each source only the slots it personally used: 5 for each)
        n_support = 8 + 1
        assert JS_TOP + 1 >= n_support
        assert rows["s1"].n_terms == n_support
        assert rows["s2"].n_terms == n_support
        assert rows["s2"].js_divergence > 0.1  # smoothing-diluted at n=8 tokens
        assert rows["s2"].js_divergence > rows["s1"].js_divergence
