"""Record linkage: twin determinism, blocking completeness (no true pair
lost at a bucket boundary), and match precision on the synthetic corpus."""

from pyspark.sql import functions as F

from pgsf_spark.analytics.linkage import ACCT_TOL, dirty_customer_twin, q_record_linkage
from pgsf_spark.tables import load_table

SF = "/root/testdata/sf0.001"


class TestDirtyTwin:
    def test_deterministic_and_one_char_shorter(self, spark):
        cust = load_table(spark, SF, "customer")
        d1 = dirty_customer_twin(cust).collect()
        d2 = dirty_customer_twin(cust).collect()
        assert sorted(map(tuple, d1)) == sorted(map(tuple, d2))
        by_key = {r.c_custkey: r for r in cust.collect()}
        for r in d1:
            orig = by_key[r.d_custkey]
            assert len(r.d_name) == len(orig.c_name) - 1
            assert r.d_name[0] == orig.c_name[0]  # blocking-safe first char
            assert abs(r.d_acctbal - orig.c_acctbal) <= ACCT_TOL

    def test_levenshtein_to_original_is_one(self, spark):
        cust = load_table(spark, SF, "customer")
        d = dirty_customer_twin(cust)
        joined = d.join(cust, d.d_custkey == cust.c_custkey).select(
            F.levenshtein("d_name", "c_name").alias("lev")
        )
        assert joined.agg(F.max("lev")).first()[0] == 1


class TestLinkage:
    def test_every_true_pair_survives_blocking(self, spark):
        # blocking is allowed to admit extra candidates, never to drop the
        # true pair -- the bucket-window explode exists for exactly this
        cust = load_table(spark, SF, "customer")
        n_dirty = dirty_customer_twin(cust).count()
        res = q_record_linkage(spark, SF)
        n_true = res.agg(F.sum("n_true")).first()[0]
        assert n_true == n_dirty

    def test_matches_are_precise(self, spark):
        res = q_record_linkage(spark, SF).agg(
            F.sum("n_matched").alias("m"), F.sum("n_true").alias("t"),
            F.sum("n_candidates").alias("c"),
        ).first()
        # candidates >> matches (blocking admits neighbors), and the
        # near-unique names + balance tolerance keep precision high
        assert res.c >= res.m >= res.t > 0
        assert res.t / res.m >= 0.9
