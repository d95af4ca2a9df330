"""Iterative BPE vocab induction (q_bpe_vocab_rounds): the merge order on
the classic Sennrich toy corpus is fully determined, so the learned table
is an exact assertion -- leftmost non-overlapping re-segmentation, corpus-
frequency weighting, and (n DESC, sa, sb) tie-breaking all have to be right
to produce it."""

from pyspark.sql import functions as F

from pgsf_spark.analytics.text import q_bpe_vocab_rounds


class TestBpeVocabRounds:
    def _write_documents(self, spark, tmp_path, words: dict):
        rows = []
        i = 0
        for w, freq in words.items():
            for _ in range(freq):
                rows.append((i, w, "en", "toy", len(w)))
                i += 1
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
        return str(tmp_path)

    def test_sennrich_toy_corpus_merge_order(self, spark, tmp_path):
        # low x5, lower x2, newest x6, widest x3 (Sennrich et al. 2016 §3)
        sf_dir = self._write_documents(
            spark, tmp_path, {"low": 5, "lower": 2, "newest": 6, "widest": 3}
        )
        got = [(r["round"], r["pair"], r["n"]) for r in q_bpe_vocab_rounds(spark, sf_dir).collect()]
        # es(9) -> est(9) -> lo(7, ties ow on sa) -> low(7) ...
        assert got[:4] == [
            (1, "e s", 9),
            (2, "es t", 9),
            (3, "l o", 7),
            (4, "lo w", 7),
        ]
        assert len(got) == 8
        assert [r for r, _, _ in got] == list(range(1, 9))

    def test_leftmost_nonoverlapping_merge(self, spark, tmp_path):
        # "aaaa": pair (a,a) appears 3x per word but leftmost-first merging
        # yields [aa, aa] -- round 2 must then see exactly one (aa, aa) pair
        sf_dir = self._write_documents(spark, tmp_path, {"aaaa": 4})
        got = [(r["round"], r["pair"], r["n"]) for r in q_bpe_vocab_rounds(spark, sf_dir).collect()]
        assert got[0] == (1, "a a", 12)  # 3 adjacent pairs x 4 docs
        assert got[1] == (2, "aa aa", 4)  # one merged pair per word
