"""Retrieval ranking (BM25 / hybrid RRF), layout skipping gate, decayed
scores, and c-TF-IDF signature terms (analytics/retrieval.py, layout.py,
events.py, corpus.py round-4 additions)."""

import datetime

from pyspark.sql import functions as F  # noqa: F401  (parity with sibling tests)

from pgsf_spark.analytics import corpus, events, layout, retrieval

SF = "/root/testdata/sf0.001"


def _write_documents(spark, path, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    df.write.mode("overwrite").parquet(f"{path}/documents.parquet")


class TestBm25:
    def test_topk_deterministic_and_sorted(self, spark):
        a = retrieval.q_bm25_topk(spark, SF).collect()
        b = retrieval.q_bm25_topk(spark, SF).collect()
        assert a == b and len(a) == 15
        scores = [r["bm25"] for r in a]
        assert scores == sorted(scores, reverse=True)
        assert all(1 <= r["n_terms"] <= len(retrieval.QUERY_TERMS) for r in a)

    def test_rare_term_outranks_common(self, spark, tmp_path):
        # 'vector' appears in one doc, 'table' in five: same tf, same doc
        # length -> the rare-term doc must win on idf alone.
        rows = [(0, "vector pad pad pad", "en", "s", 18)]
        rows += [(i, "table pad pad pad", "en", "s", 17) for i in range(1, 6)]
        _write_documents(spark, tmp_path, rows)
        got = retrieval.q_bm25_topk(spark, str(tmp_path)).collect()
        assert got[0]["doc_id"] == 0
        assert got[0]["bm25"] > got[1]["bm25"]

    def test_length_normalization(self, spark, tmp_path):
        # same single hit of 'scan'; the shorter doc scores higher.
        rows = [
            (0, "scan pad pad pad pad pad pad pad pad pad pad pad", "en", "s", 10),
            (1, "scan pad", "en", "s", 8),
            (2, "filler only text here", "en", "s", 4),
        ]
        _write_documents(spark, tmp_path, rows)
        got = {r["doc_id"]: r["bm25"] for r in retrieval.q_bm25_topk(spark, str(tmp_path)).collect()}
        assert 2 not in got  # no query term -> not retrieved
        assert got[1] > got[0]


class TestHybridRrf:
    def test_rrf_is_exactly_the_rank_formula(self, spark):
        got = retrieval.q_hybrid_rrf_topk(spark, SF).collect()
        assert 0 < len(got) <= 15
        for r in got:
            expect = 0.0
            if r["lex_rank"] is not None:
                expect += 1.0 / (retrieval.RRF_K + r["lex_rank"])
            if r["vec_rank"] is not None:
                expect += 1.0 / (retrieval.RRF_K + r["vec_rank"])
            assert abs(r["rrf"] - expect) < 1e-8
        # fused list is sorted and never contains the probe doc
        rrfs = [r["rrf"] for r in got]
        assert rrfs == sorted(rrfs, reverse=True)
        assert all(r["doc_id"] != retrieval.QUERY_VEC_ID for r in got)

    def test_both_legs_beat_one_leg_at_equal_rank(self):
        # pure formula property, no Spark needed
        both = 1.0 / (retrieval.RRF_K + 5) + 1.0 / (retrieval.RRF_K + 5)
        one = 1.0 / (retrieval.RRF_K + 1)
        assert both < one * 2 and both > one / 2  # same order of magnitude
        assert 1.0 / (retrieval.RRF_K + 1) + 1.0 / (retrieval.RRF_K + 100) > 1.0 / (
            retrieval.RRF_K + 1
        )


class TestZorderSkippingGate:
    def test_zorder_prunes_at_least_as_well(self, spark):
        got = {r["layout"]: r for r in layout.q_zorder_skipping_gate(spark, SF).collect()}
        assert set(got) == {"linear", "zorder"}
        z, lin = got["zorder"], got["linear"]
        # correctness anchor: the box predicate matches the same rows
        assert z["rows_matched"] == lin["rows_matched"]
        # the z-layout must scan no more rows than the date-only layout
        # (the box constrains BOTH dims; linear can only prune on one)
        assert z["rows_scanned"] <= lin["rows_scanned"]
        assert 0 <= z["files_scanned"] <= z["files_total"]
        # scanned files must cover every matching row
        assert z["rows_scanned"] >= z["rows_matched"]

    def test_box_predicate_actually_selective(self, spark):
        got = {r["layout"]: r for r in layout.q_zorder_skipping_gate(spark, SF).collect()}
        z = got["zorder"]
        assert z["pruned_pct"] > 0  # the gate is vacuous if nothing prunes


class TestDecayedUserScore:
    def test_exact_power_of_two_weights(self, spark, tmp_path):
        anchor = datetime.datetime.fromisoformat(events.DECAY_ANCHOR)
        rows = [
            # 21 days ago -> 3 half-lives -> weight 1/8
            (0, anchor - datetime.timedelta(days=21), 7, "click", 8.0, "{}"),
            # 0 days ago -> weight 1
            (1, anchor, 7, "click", 1.0, "{}"),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
        )
        df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
        got = events.q_decayed_user_score(spark, str(tmp_path)).collect()
        assert len(got) == 1
        assert got[0]["n_events"] == 2
        assert got[0]["decayed_score"] == 2.0  # 8/8 + 1/1
        assert got[0]["raw_score"] == 9.0

    def test_monotone_decay_on_real_data(self, spark):
        rows = events.q_decayed_user_score(spark, SF).collect()
        assert all(0 <= r["decayed_score"] <= r["raw_score"] for r in rows if r["raw_score"] >= 0)


class TestSourceSignatureTerms:
    def test_marker_token_wins_its_source(self, spark, tmp_path):
        rows = []
        for i in range(5):
            rows.append((i, f"alpha shared shared shared", "en", "src_a", 30))
            rows.append((100 + i, f"beta shared shared shared", "en", "src_b", 30))
        _write_documents(spark, tmp_path, rows)
        got = corpus.q_source_signature_terms(spark, str(tmp_path)).collect()
        top = {r["source"]: r["term"] for r in got if r["rk"] == 1}
        assert top == {"src_a": "alpha", "src_b": "beta"}

    def test_three_terms_per_source(self, spark):
        got = corpus.q_source_signature_terms(spark, SF).collect()
        by_source = {}
        for r in got:
            by_source.setdefault(r["source"], []).append(r["rk"])
        for ranks in by_source.values():
            assert sorted(ranks) == [1, 2, 3]


class TestQueryLikelihood:
    def test_smoothing_semantics(self, spark):
        from pgsf_spark.analytics.retrieval import (
            QL_TOPN,
            QUERY_TERMS,
            q_query_likelihood_topk,
        )

        rows = q_query_likelihood_topk(spark, "/root/testdata/sf0.001").collect()
        assert 0 < len(rows) <= QL_TOPN
        lls = [r.log_likelihood for r in rows]
        assert lls == sorted(lls, reverse=True)
        for r in rows:
            # candidate semantics: at least one matched term
            assert 1 <= r.n_matched <= len(QUERY_TERMS)
            # log of a probability product: strictly negative
            assert r.log_likelihood < 0.0
