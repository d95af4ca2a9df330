"""Corpus retrieval scoring: BM25 and hybrid lexical+vector rank fusion.

The reference engine's query surface stops at filters and aggregates
(`/root/reference/query.py`); retrieval ranking is part of the extended
training-data brief: curating an LLM corpus means scoring documents
against probe queries (contamination probes, topic probes, eval-set
look-alikes) and fusing lexical and embedding signals.

Scale design:
- BM25 term statistics are ordinary keyed aggregates: tf is a
  (doc, term) partial-agg shuffle over ONLY the query terms (the isin
  filter runs map-side before the explode output leaves the scan task),
  df/avgdl are tiny follow-up aggregates that broadcast back. Nothing in
  the plan touches all tokens of all documents after the first projection.
- The per-(doc,term) score is a pure expression; the per-doc sum
  accumulates in DECIMAL so partitioning never changes the double
  (oracle_utils contract).
- RRF fuses *ranks*, not scores: each signal list is ranked with a total
  deterministic order (score desc, doc_id), the fused score is
  1/(K+rank) summed in a FIXED left-to-right expression order (lexical
  then vector), so the result is bit-stable across engines and cluster
  layouts. At 100 TB each ranking is a top-N TakeOrdered, and the fusion
  joins two N-row lists -- driver-free and broadcast-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pgsf_spark.analytics.oracle_utils import dsum
from pgsf_spark.analytics.similarity import _dot, _to_double
from pgsf_spark.tables import load_table

# Fixed probe query: terms chosen from the synthetic vocabulary. A real
# deployment parameterizes these; the gate pins them so the oracle can too.
QUERY_TERMS = ("table", "join", "scan", "vector")
BM25_K1 = 1.2
BM25_B = 0.75
RRF_K = 60
QUERY_VEC_ID = 0  # the probe embedding for the vector leg of the fusion
LEG_TOPN = 100  # each signal contributes its top-N list; fusion never sees more


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document BM25 score against QUERY_TERMS (docs matching >=1 term).

    idf uses the standard Robertson-Sparck Jones form ln(1+(N-df+0.5)/(df+0.5));
    doc length normalization uses exact integer token counts.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    tokens = d.select(
        "doc_id", F.size(toks).alias("n_tok"), F.explode(toks).alias("term")
    ).filter(F.col("term").isin(*QUERY_TERMS))
    tf = tokens.groupBy("doc_id", "n_tok", "term").agg(F.count(F.lit(1)).alias("tf"))

    # Corpus stats: N and avgdl from the full table (integer-exact), df per
    # query term from the tf aggregate. All are tiny and broadcast back.
    stats = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(toks)).alias("tot_tok"),
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn("avgdl", F.col("tot_tok") / F.col("n_docs"))
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * F.lit(BM25_K1 + 1.0))
            / (
                F.col("tf")
                + F.lit(BM25_K1)
                * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("n_tok") / F.col("avgdl"))
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        dsum(F.col("contrib"), "decimal(27,12)").alias("bm25"),
        F.count(F.lit(1)).alias("n_terms"),
    )


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 documents by BM25 against the fixed probe terms."""
    scored = _bm25_scored(spark, sf_dir)
    return (
        scored.select(
            "doc_id", F.round("bm25", 6).alias("bm25"), F.col("n_terms").cast("int").alias("n_terms")
        )
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(15)
    )


def q_hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of the BM25 list and a cosine-ANN list.

    doc_id and vec_id are aligned 1:1 in the corpus, so each document has
    an embedding. Leg 1 ranks documents by BM25 against QUERY_TERMS; leg 2
    ranks them by cosine to QUERY_VEC_ID's embedding. rrf =
    1/(K+lex_rank) + 1/(K+vec_rank), with a missing leg contributing 0 --
    evaluated in that fixed order so the double is deterministic.
    """
    lex = (
        _bm25_scored(spark, sf_dir)
        .filter(F.col("doc_id") != QUERY_VEC_ID)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(LEG_TOPN)
    )
    wl = Window.orderBy(F.col("bm25").desc(), F.col("doc_id"))
    lex_rank = lex.select("doc_id", F.row_number().over(wl).alias("lex_rank"))

    e = load_table(spark, sf_dir, "embeddings")
    emb = e.select(F.col("vec_id").alias("doc_id"), _to_double(F.col("embedding")).alias("v"))
    q = emb.filter(F.col("doc_id") == QUERY_VEC_ID).select(F.col("v").alias("qv"))
    cos = _dot(F.col("v"), F.col("qv")) / (
        F.sqrt(_dot(F.col("v"), F.col("v"))) * F.sqrt(_dot(F.col("qv"), F.col("qv")))
    )
    wv = Window.orderBy(F.col("cosine").desc(), F.col("doc_id"))
    vec_rank = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("doc_id") != QUERY_VEC_ID)
        .select("doc_id", cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), "doc_id")
        .limit(LEG_TOPN)
        .select("doc_id", F.row_number().over(wv).alias("vec_rank"))
    )

    fused = lex_rank.join(vec_rank, "doc_id", "full_outer").select(
        "doc_id",
        "lex_rank",
        "vec_rank",
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("vec_rank")), F.lit(0.0)),
            8,
        ).alias("rrf"),
    )
    return fused.orderBy(F.col("rrf").desc(), "doc_id").limit(15)


MMR_POOL = 20  # relevance-ranked candidate pool fed to the diversifier
MMR_K = 5  # results returned
MMR_LAMBDA = 0.7  # relevance weight
MMR_MU = 0.3  # redundancy penalty weight (spelled out: 1-0.7 is not 0.3 in IEEE)


def q_mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998):
    greedily pick MMR_K results maximizing lambda*rel(d) - mu*max_{s in
    S} sim(d, s) -- the standard diversifier that stops a retrieval list
    from returning five near-copies of the same document (for a corpus
    engine: eval-probe hits should sample DISTINCT duplicates clusters,
    not one).

    Scale shape: relevance ranking is the brute-force cosine TakeOrdered
    (same plan as q_cosine_topk); everything after runs on the MMR_POOL-row
    candidate table -- the pairwise sim matrix is POOL^2 bounded and each
    greedy round is a join + argmax over <= POOL rows. Cosines round to 4
    digits at construction and each round's MMR score to 6, so the greedy
    trajectory (including ties, broken by vec_id) is engine-exact."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = e.select("vec_id", _to_double(F.col("embedding")).alias("v"))
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("v").alias("qv"))
    cos_q = _dot(F.col("v"), F.col("qv")) / (
        F.sqrt(_dot(F.col("v"), F.col("v"))) * F.sqrt(_dot(F.col("qv"), F.col("qv")))
    )
    cand = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", "v", F.round(cos_q, 4).alias("rel"))
        .orderBy(F.col("rel").desc(), "vec_id")
        .limit(MMR_POOL)
        .localCheckpoint(eager=True)
    )
    ca = cand.select(F.col("vec_id").alias("a"), F.col("v").alias("va"))
    cb = cand.select(F.col("vec_id").alias("b"), F.col("v").alias("vb"))
    cos_ab = _dot(F.col("va"), F.col("vb")) / (
        F.sqrt(_dot(F.col("va"), F.col("va"))) * F.sqrt(_dot(F.col("vb"), F.col("vb")))
    )
    sims = (
        ca.join(cb, F.col("a") != F.col("b"))
        .select("a", "b", F.round(cos_ab, 4).alias("sim"))
        .localCheckpoint(eager=True)
    )
    selected = (
        cand.orderBy(F.col("rel").desc(), "vec_id")
        .limit(1)
        .select(
            "vec_id",
            "rel",
            F.lit(1).alias("rank"),
            F.round(F.lit(MMR_LAMBDA) * F.col("rel"), 6).alias("mmr"),
        )
    )
    for t in range(2, MMR_K + 1):
        rem = cand.join(selected.select("vec_id"), "vec_id", "left_anti")
        pen = (
            sims.join(selected.select(F.col("vec_id").alias("b")), "b")
            .groupBy("a")
            .agg(F.max("sim").alias("pen"))
        )
        scored = rem.join(pen, rem.vec_id == pen.a).select(
            "vec_id",
            "rel",
            F.lit(t).alias("rank"),
            F.round(
                F.lit(MMR_LAMBDA) * F.col("rel") - F.lit(MMR_MU) * F.col("pen"), 6
            ).alias("mmr"),
        )
        pick = scored.orderBy(F.col("mmr").desc(), "vec_id").limit(1)
        selected = selected.unionByName(pick).localCheckpoint(eager=True)
    return selected.select("rank", "vec_id", "rel", "mmr").orderBy("rank")


QL_MU = 200.0  # Dirichlet smoothing mass (standard 'small docs' setting)
QL_TOPN = 15


def q_query_likelihood_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top documents by Dirichlet-smoothed query-likelihood -- the
    language-modeling scorer that completes the retrieval shelf next to
    BM25/RRF/MMR (QL is the probabilistic face: score =
    sum_w ln((tf + mu p_c(w)) / (len + mu)); unlike BM25 a MISSING query
    term still contributes its smoothed corpus mass, so term absence is
    penalized, not ignored): evaluated over the candidate set with >= 1
    matching term (the inverted-index candidate semantics, stated).

    Exactness: tf, doc length, corpus term counts and total tokens are
    exact integers; each term's ln is a fixed chain on those (p_c enters
    as cf/total inside the single ln argument) rounded to 12 into
    DECIMAL before the 4-term sum.

    Plan: one term-filtered explode (pushdown keeps the scan lean), one
    (doc, term) rollup; corpus stats broadcast; the 4-term panel is a
    literal spine."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    tokens = d.select(
        "doc_id", F.size(toks).alias("n_tok"), F.explode(toks).alias("term")
    ).filter(F.col("term").isin(*QUERY_TERMS))
    tf = tokens.groupBy("doc_id", "n_tok", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    cand = tf.select("doc_id", "n_tok").distinct()
    cf = tf.groupBy("term").agg(F.sum("tf").alias("cf"))
    stats = d.agg(F.sum(F.size(toks)).alias("tot_tok"))
    spine = spark.createDataFrame([(t,) for t in QUERY_TERMS], ["term"])
    panel = (
        cand.crossJoin(F.broadcast(spine))
        .join(tf, ["doc_id", "n_tok", "term"], "left")
        .join(F.broadcast(cf), "term")
        .crossJoin(F.broadcast(stats))
    )
    tfd = F.coalesce(F.col("tf"), F.lit(0)).cast("double")
    pc = F.col("cf").cast("double") / F.col("tot_tok").cast("double")
    term_ll = F.round(
        F.log(
            (tfd + F.lit(QL_MU) * pc)
            / (F.col("n_tok").cast("double") + F.lit(QL_MU))
        ),
        12,
    ).cast("decimal(18,12)")
    scored = panel.groupBy("doc_id", "n_tok").agg(
        F.sum(term_ll).alias("ll"),
        F.sum(F.when(F.col("tf").isNotNull(), 1).otherwise(0)).alias("n_matched"),
    )
    return (
        scored.select(
            "doc_id",
            F.col("n_tok").cast("bigint").alias("doc_tokens"),
            F.col("n_matched").cast("bigint").alias("n_matched"),
            F.round(F.col("ll").cast("double"), 6).alias("log_likelihood"),
        )
        .orderBy(F.col("log_likelihood").desc(), "doc_id")
        .limit(QL_TOPN)
    )
