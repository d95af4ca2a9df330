"""Corpus-level quality & contamination operators (training-data pipeline).

The Gopher/CCNet-family filters a production LLM corpus build runs after the
cheap per-doc heuristics (text.py) and before dedup (dedup.py):

  - repetition stats     per-doc n-gram repetition (Gopher Table A1 style:
                         top-2-gram fraction, duplicate-2-gram fraction)
  - boilerplate n-grams  corpus-frequency filter (CCNet-style): n-grams
                         occurring in >= K distinct docs are boilerplate;
                         score each doc by its boilerplate fraction
  - contamination        benchmark-overlap check: fraction of a candidate
                         doc's n-grams that appear in a held-out benchmark
                         set (here: doc_id % 50 == 0 as the deterministic
                         stand-in for the eval suite)

All pure pyspark.sql.functions -- JVM-side, no Python in the hot path.

Scale notes (100 TB corpus):
  - explode(n-grams) multiplies rows by ~tokens/doc, but the groupBy keys
    include doc_id (or gram), so map-side partial aggregation bounds shuffle
    volume by the distinct-key count, not the exploded row count.
  - the benchmark gram set is genuinely small (an eval suite, not the
    corpus) -> broadcast join, no shuffle of the corpus side.
  - the boilerplate gram table is corpus-derived (can be big) -> shuffle
    hash join on gram; AQE converts it to broadcast when it's actually tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgsf_spark.tables import load_table


def _toks(col):
    return F.split(F.trim(col), r"\s+")


def ngram_array(toks, n: int):
    """Array of space-joined word n-grams (non-distinct), [] when the doc is
    shorter than n tokens. NB: sequence(1, 0) in Spark is the DESCENDING
    [1, 0], so the short-doc case must be guarded explicitly."""
    size = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), size - (n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(size >= n, grams).otherwise(F.array().cast("array<string>"))


def repetition_stats(d: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition filter inputs: for each doc, the fraction of
    2-grams taken by the single most frequent 2-gram and the fraction that
    are non-unique. High values = looping/boilerplate text.

    Plan: explode 2-grams -> partial-agg count on (doc_id, gram) -> final
    agg on doc_id. Two keyed shuffles, both bounded by distinct keys."""
    grams = ngram_array(_toks(F.col(text_col)), 2)
    per_gram = (
        d.select("doc_id", F.explode(grams).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return per_gram.groupBy("doc_id").agg(
        F.sum("n").alias("n_2grams"),
        F.round(F.max("n") / F.sum("n"), 4).alias("top_2gram_frac"),
        F.round(F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(F.lit(0))) / F.sum("n"), 4).alias(
            "dup_2gram_frac"
        ),
    )


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition_stats(load_table(spark, sf_dir, "documents"))


BOILERPLATE_MIN_DOCS = 5
BOILERPLATE_N = 3


def boilerplate_scores(
    d: DataFrame, text_col: str = "text", min_docs: int = BOILERPLATE_MIN_DOCS
) -> DataFrame:
    """CCNet-style corpus-frequency filter: a 3-gram present in >= min_docs
    distinct docs is boilerplate; score each doc by the fraction of its
    distinct 3-grams that are boilerplate.

    The gram->doc-frequency table is computed once from the same exploded
    relation and joined back on gram (shuffle join; AQE broadcasts it when
    small). Per-doc grams are deduped first so doc frequency = COUNT(*)."""
    grams = F.array_distinct(ngram_array(_toks(F.col(text_col)), BOILERPLATE_N))
    exploded = d.select("doc_id", F.explode(grams).alias("gram"))
    docfreq = (
        exploded.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("ndocs"))
        .filter(F.col("ndocs") >= min_docs)
        .select("gram")
    )
    marked = exploded.join(docfreq.withColumn("__bp", F.lit(1)), on="gram", how="left")
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_3grams"),
        F.count("__bp").alias("n_boilerplate"),
        F.round(F.count("__bp") / F.count(F.lit(1)), 4).alias("boilerplate_frac"),
    )


def q_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    return boilerplate_scores(load_table(spark, sf_dir, "documents"))


CONTAM_N = 4
BENCH_MOD = 50


def contamination_scores(d: DataFrame, text_col: str = "text") -> DataFrame:
    """Benchmark-contamination check: the held-out set is doc_id % 50 == 0
    (stand-in for an eval suite); every other doc is scored by the fraction
    of its distinct 4-grams that appear anywhere in the benchmark.

    The benchmark gram set is small by construction -> explicit broadcast;
    the corpus side never shuffles (scan -> explode -> broadcast-join ->
    partial agg on doc_id)."""
    grams = F.array_distinct(ngram_array(_toks(F.col(text_col)), CONTAM_N))
    with_grams = d.select("doc_id", F.explode(grams).alias("gram"))
    is_bench = F.col("doc_id") % BENCH_MOD == 0
    bench = with_grams.filter(is_bench).select("gram").distinct()
    cand = with_grams.filter(~is_bench)
    marked = cand.join(
        F.broadcast(bench.withColumn("__hit", F.lit(1))), on="gram", how="left"
    )
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_4grams"),
        F.count("__hit").alias("n_contaminated"),
        F.round(F.count("__hit") / F.count(F.lit(1)), 4).alias("contamination_frac"),
    )


def q_benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    return contamination_scores(load_table(spark, sf_dir, "documents"))


NOVELTY_N = 5


def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-duplication score: the fraction of each doc's distinct
    5-grams whose FIRST corpus occurrence (minimum doc_id, the ingestion
    order) is this doc. novelty 1.0 = all-new text; ~0 = the doc restates
    earlier material. This is the streaming-dedup view of n-gram overlap --
    what a dedup pass computes against the corpus-so-far before admitting a
    document. Plan: explode distinct grams -> min(doc_id) per gram (one
    keyed shuffle, map-side combined) -> join back on gram -> per-doc agg;
    both shuffles bounded by distinct keys, never O(n^2)."""
    d = load_table(spark, sf_dir, "documents")
    grams = F.array_distinct(ngram_array(_toks(F.col("text")), NOVELTY_N))
    exploded = d.select("doc_id", F.explode(grams).alias("gram"))
    first_seen = exploded.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    return (
        exploded.join(first_seen, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_novel"),
            F.round(
                F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0))
                / F.count(F.lit(1)),
                4,
            ).alias("novelty"),
        )
    )


def q_length_trim_thresholds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source length winsorization inputs: the exact p5/p95 token-count
    order statistics (rank = ceil(q*n), no interpolation -- portable across
    engines unlike percentile_cont) plus how many docs fall outside them.
    A corpus build drops or truncates the tails per source; computing the
    thresholds is one window over (source, token count) -- at 100 TB this is
    a sort within each source partition, the same cost class as any
    per-source ranking, and the output is one row per source."""
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    t = d.select("doc_id", "source", n_tok.alias("n_tokens"))
    w = Window.partitionBy("source").orderBy("n_tokens", "doc_id")
    ranked = t.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("source"))
    )
    pick = lambda q: F.max(  # noqa: E731 -- rank ceil(q*n) is the exact order statistic
        F.when(F.col("rn") == F.ceil(F.lit(q) * F.col("n")), F.col("n_tokens"))
    )
    stats = ranked.groupBy("source").agg(
        pick(0.05).alias("p5_tokens"),
        pick(0.95).alias("p95_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    out = (
        t.join(F.broadcast(stats), "source")
        .groupBy("source")
        .agg(
            F.first("p5_tokens").alias("p5_tokens"),
            F.first("p95_tokens").alias("p95_tokens"),
            F.first("n_docs").alias("n_docs"),
            F.sum(
                F.when(
                    (F.col("n_tokens") < F.col("p5_tokens"))
                    | (F.col("n_tokens") > F.col("p95_tokens")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_trimmed"),
        )
    )
    return out


def q_token_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini-Simpson token diversity per doc: 1 - sum(c_i^2)/N^2 over the
    token histogram -- the no-logarithm cousin of token entropy (logs are
    not correctly-rounded IEEE ops, so an entropy oracle could drift by an
    ulp across engines; sum-of-squares stays in exact integer arithmetic
    until one final division). Low diversity = degenerate/looping text."""
    d = load_table(spark, sf_dir, "documents")
    per_tok = (
        d.select("doc_id", F.explode(_toks(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return per_tok.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.round(
            F.lit(1.0) - F.sum(F.col("c") * F.col("c")) / (F.sum("c") * F.sum("c")), 4
        ).alias("token_diversity"),
    )


def q_chars_tokens_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source least-squares fit of token count vs char count -- the
    per-group model-fitting shape (closed-form OLS from sufficient
    statistics). The five sums accumulate in exact DECIMAL (one partial-agg
    shuffle on the source key, order-independent at any partitioning), so
    slope/intercept are bit-identical across engines and cluster sizes --
    the same sufficient-statistics trick that makes distributed GLM
    training deterministic. No applyInPandas needed: the closed form stays
    in whole-stage codegen."""
    from pgsf_spark.analytics.oracle_utils import dsum

    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "source",
        F.col("n_chars").cast("double").alias("x"),
        F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).cast("double").alias("y"),
    )
    s = base.groupBy("source").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum(F.col("x")).alias("sx"),
        dsum(F.col("y")).alias("sy"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    return s.select(
        "source",
        F.col("n").cast("bigint").alias("n_docs"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
    )


def q_source_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture concentration report: Herfindahl-Hirschman index of the
    source distribution (sum of squared shares) and its reciprocal, the
    'effective number of sources' -- the one-line diagnostic a mixture
    tuner checks before/after temperature rebalancing (q_temperature_sample
    is the knob; this is the dial).

    Two tiny aggregates: per-source counts (one shuffle on the source key)
    then a 1-row fold over |sources| rows with high-precision decimal
    accumulation (shares^2 are ~1e-4; DECIMAL(18,12) keeps them exact)."""
    from pgsf_spark.analytics.oracle_utils import dsum

    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(F.sum("n").alias("n_total"))
    share = F.col("n") / F.col("n_total")
    return (
        counts.crossJoin(F.broadcast(tot))
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_sources"),
            F.round(dsum(share * share, "decimal(18,12)"), 6).alias("hhi"),
        )
        .select(
            "n_sources",
            "hhi",
            F.round(1.0 / F.col("hhi"), 4).alias("effective_sources"),
        )
    )


def q_source_signature_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-based TF-IDF (BERTopic's c-TF-IDF): the terms that
    *distinguish* each source, treating all documents of a source as one
    class document. score = (count(t in s) / tokens(s)) * ln(1 + A / f(t)),
    A = mean tokens per class, f(t) = corpus frequency of t. This is the
    topic-labeling half of semantic clustering: cluster (or group), then
    name the cluster by its signature terms.

    Plan: one (source, token) partial-agg shuffle over the exploded corpus;
    class totals and corpus term frequencies are tiny rollups of that
    aggregate, broadcast back; top-3 per class is a window over |classes|
    keys. Nothing rescans the corpus."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    tokens = d.select("source", F.explode(toks).alias("token"))
    cts = tokens.groupBy("source", "token").agg(F.count(F.lit(1)).alias("c"))
    tot_s = cts.groupBy("source").agg(F.sum("c").alias("tot"))
    f_t = cts.groupBy("token").agg(F.sum("c").alias("ft"))
    a = tot_s.agg((F.sum("tot") / F.count(F.lit(1))).alias("a"))
    scored = (
        cts.join(F.broadcast(tot_s), "source")
        .join(F.broadcast(f_t), "token")
        .crossJoin(F.broadcast(a))
        .withColumn(
            "ctfidf",
            (F.col("c") / F.col("tot")) * F.log(F.lit(1.0) + F.col("a") / F.col("ft")),
        )
    )
    w = Window.partitionBy("source").orderBy(F.col("ctfidf").desc(), F.col("token"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "source",
            F.col("rk").cast("int").alias("rk"),
            F.col("token").alias("term"),
            F.round("ctfidf", 8).alias("ctfidf"),
        )
    )


PASSAGE_K = 5
PASSAGE_MIN_DOCS = 2
PASSAGE_TOP = 20


def q_repeated_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated passages at fixed width K: the substring-level
    duplication signal behind Lee et al.'s "Deduplicating Training Data
    Makes Language Models Better" (exact-substring dedup) -- finds K-token
    spans that appear in multiple documents, restricted to RIGHT-CLOSED
    spans (no (K+1)-token extension has the same occurrence count, the
    closed-n-gram trick), so runs of duplicated text surface once as their
    widest fixed-K representative rather than once per offset.

    Plan: one explode of positional K-grams and one of (K+1)-grams, each
    partial-agg shuffled on the gram key; closedness is a left anti join of
    the K-table against the (K+1)-table keyed on (K-prefix, count). At
    100 TB both relations aggregate before any join (shuffle bounded by
    distinct grams, not corpus size) and the top-N is
    TakeOrderedAndProject. A true suffix-automaton maximal-match pass is
    deliberately out of scope -- fixed-K closed spans are the
    shuffle-bounded approximation that composes with the LSH dedup stack."""
    d = load_table(spark, sf_dir, "documents")
    toks = _toks(F.lower(F.trim(F.col("text"))))
    gk = d.select("doc_id", F.explode(ngram_array(toks, PASSAGE_K)).alias("gram"))
    gk1 = d.select(F.explode(ngram_array(toks, PASSAGE_K + 1)).alias("gram1"))
    # a (K+1)-gram's K-prefix: drop everything after the K-th space
    pref = F.substring_index(F.col("gram1"), " ", PASSAGE_K)
    counts_k = gk.groupBy("gram").agg(
        F.count(F.lit(1)).alias("n_occ"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    counts_k1 = (
        gk1.select(pref.alias("gram"), F.col("gram1"))
        .groupBy("gram", "gram1")
        .agg(F.count(F.lit(1)).alias("n1"))
        .select("gram", F.col("n1").alias("n_occ"))
        .distinct()
    )
    closed = counts_k.join(counts_k1, ["gram", "n_occ"], "left_anti")
    return (
        closed.filter(F.col("n_docs") >= PASSAGE_MIN_DOCS)
        .orderBy(F.col("n_docs").desc(), F.col("n_occ").desc(), "gram")
        .limit(PASSAGE_TOP)
        .select("gram", "n_docs", "n_occ")
    )


LIFT_MIN_PAIR = 5
LIFT_TOP = 20


def q_bigram_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining via lift (the exp of PMI, kept rational): for each
    adjacent token pair, lift = P(a,b) / (P(a) P(b)) = n_ab * N_tok^2 /
    (N_big * n_a * n_b) -- the corpus-analysis pass that finds multi-word
    expressions worth protecting from tokenizer splits.

    All factors are exact BIGINT counts and the score is ONE IEEE division
    (no libm log, so the value is bit-identical across engines -- rank by
    lift and take log offline if PMI units are wanted). Plan: one exploded
    bigram shuffle keyed on the pair, one token shuffle keyed on the token;
    unigram totals broadcast back onto the pair aggregate; top-N is
    TakeOrderedAndProject. Shuffles are bounded by distinct keys."""
    d = load_table(spark, sf_dir, "documents")
    toks = _toks(F.lower(F.trim(F.col("text"))))
    tokens = d.select(F.explode(toks).alias("token"))
    uni = tokens.groupBy("token").agg(F.count(F.lit(1)).alias("n_tok"))
    tok_total = uni.agg(F.sum("n_tok").alias("n_tok_total"))
    bigrams = d.select(F.explode(ngram_array(toks, 2)).alias("pair"))
    big_counts = bigrams.groupBy("pair").agg(F.count(F.lit(1)).alias("n_ab"))
    big_total = big_counts.agg(F.sum("n_ab").alias("n_big_total"))
    pairs = (
        big_counts.filter(F.col("n_ab") >= LIFT_MIN_PAIR)
        .withColumn("a", F.substring_index("pair", " ", 1))
        .withColumn("b", F.substring_index("pair", " ", -1))
    )
    ua = uni.select(F.col("token").alias("a"), F.col("n_tok").alias("n_a"))
    ub = uni.select(F.col("token").alias("b"), F.col("n_tok").alias("n_b"))
    lift = (
        F.col("n_ab") * F.col("n_tok_total") * F.col("n_tok_total")
        / (F.col("n_big_total") * F.col("n_a") * F.col("n_b"))
    )
    return (
        pairs.join(F.broadcast(ua), "a")
        .join(F.broadcast(ub), "b")
        .crossJoin(F.broadcast(tok_total))
        .crossJoin(F.broadcast(big_total))
        .select("pair", "n_ab", "n_a", "n_b", F.round(lift, 4).alias("lift"))
        .orderBy(F.col("lift").desc(), "pair")
        .limit(LIFT_TOP)
    )


def q_corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row dataset card (the datasheet a corpus release ships with):
    volume, source/language breadth, exact-duplicate rate, and size
    moments -- every number the other gates compute in depth, rolled into
    the single headline row a data-governance review reads first.

    One aggregate over one scan (count-distincts share the pass); the
    fingerprint REUSES dedup._norm_text (trim + whitespace collapse +
    lower), so the dup rate here is consistent with dedup_exact by
    construction, not by parallel reimplementation."""
    from pgsf_spark.analytics.dedup import _norm_text

    d = load_table(spark, sf_dir, "documents")
    fp = F.md5(_norm_text(F.col("text")))
    return d.select(
        "doc_id", "source", "lang", F.col("n_chars").cast("bigint").alias("n_chars"), fp.alias("fp")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("fp").alias("n_unique_texts"),
        # nullif guard: ANSI division on an empty corpus must yield NULL,
        # not throw (empty-input contract; oracle uses the same NULLIF)
        F.round(
            (F.count(F.lit(1)) - F.countDistinct("fp"))
            / F.nullif(F.count(F.lit(1)), F.lit(0)),
            4,
        ).alias("exact_dup_rate"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.round(F.sum("n_chars") / F.nullif(F.count(F.lit(1)), F.lit(0)), 2).alias(
            "mean_chars"
        ),
    )


JS_TOP = 50


def q_source_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between each source's token distribution
    and the corpus-wide distribution, over the global top-JS_TOP vocabulary
    plus an OOV bucket -- the symmetric, bounded [0, ln 2] counterpart to
    PSI for *which sources read differently from the corpus* (domain
    weighting and mixture-shift monitoring both key off it).

    The probe vocabulary is a TakeOrdered broadcast; per-(source, token)
    counts are one keyed shuffle; each JS term ln's once (dsir parity
    precedent) and accumulates in DECIMAL, so the per-source divergence is
    hash-stable. Laplace +1 smoothing keeps every ln argument positive on
    both faces."""
    from pgsf_spark.analytics.dedup import _norm_text

    d = load_table(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(F.split(_norm_text(F.col("text")), " ")).alias("token"))
    # bounded materialization (JS_TOP rows): the probe vocabulary feeds the
    # mapping join AND the support grid; without it each reference re-runs
    # the corpus token count
    vocab = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(JS_TOP)
        .select("token")
        .localCheckpoint(eager=True)
    )
    mapped = tok.join(F.broadcast(vocab).withColumn("in_vocab", F.lit(1)), "token", "left").select(
        "source",
        F.when(F.col("in_vocab").isNotNull(), F.col("token")).otherwise(F.lit("__oov__")).alias("tk"),
    )
    # bounded materialization (sources x (JS_TOP+1) rows): three consumers
    # (per-source totals, global counts, the grid join) would otherwise each
    # re-run the corpus explode+map pass
    per_src = (
        mapped.groupBy("source", "tk")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    src_tot = per_src.groupBy("source").agg(F.sum("c").alias("tot"))
    glob = per_src.groupBy("tk").agg(F.sum("c").alias("gc"))
    glob_tot = glob.agg(F.sum("gc").alias("gtot"))
    # +1 smoothing over the (JS_TOP + 1)-slot support. The sum must run
    # over the FULL source x support grid: a slot the source never uses
    # still carries probability 1/(tot+k) after smoothing, and dropping
    # those terms (an inner join would) understates the divergence most
    # for exactly the most-divergent sources.
    k = JS_TOP + 1
    support = vocab.select(F.col("token").alias("tk")).unionByName(
        spark.createDataFrame([("__oov__",)], "tk string")
    )
    grid = src_tot.crossJoin(F.broadcast(support))
    joined = (
        grid.join(per_src, ["source", "tk"], "left")
        .join(glob, "tk", "left")
        .crossJoin(glob_tot)
        .select(
            "source",
            ((F.coalesce(F.col("c"), F.lit(0)) + 1) / (F.col("tot") + k)).alias("p"),
            ((F.coalesce(F.col("gc"), F.lit(0)) + 1) / (F.col("gtot") + k)).alias("q"),
        )
    )
    m = (F.col("p") + F.col("q")) / 2
    term = (
        F.lit(0.5) * F.col("p") * F.log(F.col("p") / m)
        + F.lit(0.5) * F.col("q") * F.log(F.col("q") / m)
    ).cast("decimal(27,12)")
    return (
        joined.groupBy("source")
        .agg(F.round(F.sum(term).cast("double"), 6).alias("js_divergence"),
             F.count(F.lit(1)).alias("n_terms"))
        .orderBy("source")
    )


QR_ROUNDS = 8
QR_TAU = 0.5  # median regression
QR_LR = 2.0
QR_B0 = 5.0  # chars-per-token init


def q_quantile_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median (tau=0.5 quantile) regression of char count on token count by
    QR_ROUNDS rounds of subgradient descent on the pinball loss -- the
    robust-regression twin of q_chars_tokens_ols (OLS chases outlier docs;
    the median fit ignores them; a large gap between the two slopes is
    itself a tail-heaviness diagnostic).

    Portability: the pinball subgradient per row is EXACTLY +/-tau (0.5),
    so each round's gradient sums are exact halves of integer sums
    (accumulated in DECIMAL); parameters round to 9 digits per round. The
    same declarative GD shape as curation's classifier: each round is one
    corpus scan producing two sums, crossJoined back as a one-row
    broadcast -- no collect, no driver math."""
    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).cast("double").alias("x"),
        F.col("n_chars").cast("double").alias("y"),
    )
    st = base.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,1)")).cast("double").alias("sxx"),
    )
    params = st.select(F.lit(0.0).alias("a"), F.lit(QR_B0).alias("b"), "n", "sxx")
    for _ in range(QR_ROUNDS):
        u = F.col("y") - F.col("a") - F.col("b") * F.col("x")
        g = F.when(u < 0, F.lit(-QR_TAU)).otherwise(F.lit(QR_TAU))
        sums = (
            base.crossJoin(F.broadcast(params))
            .agg(
                F.sum(g.cast("decimal(38,1)")).cast("double").alias("sg"),
                F.sum((g * F.col("x")).cast("decimal(38,1)")).cast("double").alias("sgx"),
                F.first("a").alias("a"),
                F.first("b").alias("b"),
                F.first("n").alias("n"),
                F.first("sxx").alias("sxx"),
            )
        )
        params = sums.select(
            F.round(F.col("a") + F.lit(QR_LR) * F.col("sg") / F.col("n"), 9).alias("a"),
            F.round(F.col("b") + F.lit(QR_LR) * F.col("sgx") / F.col("sxx"), 9).alias("b"),
            "n",
            "sxx",
        ).localCheckpoint(eager=True)
    u = F.col("y") - F.col("a") - F.col("b") * F.col("x")
    loss = (
        base.crossJoin(F.broadcast(params))
        .agg(
            F.first("n").alias("nn"),
            F.first("a").alias("a"),
            F.first("b").alias("b"),
            F.sum(F.round(F.lit(QR_TAU) * F.abs(u), 6).cast("decimal(38,6)"))
            .cast("double")
            .alias("loss_sum"),
        )
    )
    return loss.select(
        F.col("nn").cast("bigint").alias("n_docs"),
        F.col("a").alias("intercept"),
        F.col("b").alias("chars_per_token"),
        F.round(F.col("loss_sum") / F.col("nn"), 6).alias("mean_pinball_loss"),
    )


def q_trimmed_mean_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source 5%-trimmed mean of document length -- the robust
    location estimate between the raw mean (outlier-hostage) and the
    Huber mean (iterative): drop the bottom and top 5% by exact
    integer-rank comparison and average the middle 90%.

    Exactness: the trim bounds avoid percentile interpolation entirely --
    keep rank r iff 20*r > n AND 20*r <= 19*n, pure BIGINT comparisons
    identical on both engines (ties broken by doc_id so the trimmed SET
    is deterministic, not just its size). Windows are partitioned by
    source, the corpus-sharded grain, so the rank never runs global."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    n_w = Window.partitionBy("source")
    ranked = d.select(
        "source",
        F.col("n_chars").cast("long").alias("x"),
        F.row_number().over(w).alias("r"),
        F.count(F.lit(1)).over(n_w).alias("n"),
    )
    kept = ranked.filter((20 * F.col("r") > F.col("n")) & (20 * F.col("r") <= 19 * F.col("n")))
    raw = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.sum(F.col("n_chars").cast("decimal(38,0)")).cast("double") / F.count(F.lit(1)), 4).alias(
            "raw_mean"
        ),
    )
    tr = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.round(F.sum(F.col("x").cast("decimal(38,0)")).cast("double") / F.count(F.lit(1)), 4).alias(
            "trimmed_mean"
        ),
    )
    # LEFT join: a source whose trim window is empty (a single-doc source
    # cannot satisfy 20r <= 19n) must still report its raw mean with NULL
    # trimmed columns, not silently vanish from the audit
    return raw.join(tr, "source", "left").select(
        "source", "n_docs", "n_kept", "raw_mean", "trimmed_mean"
    ).orderBy("source")


BURST_TOP = 10  # burstiest frequent tokens reported


def q_token_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token burstiness (Church-Gale): tokens whose occurrences CLUMP in
    few documents instead of spreading Poisson-like -- the
    corpus-linguistics signal that separates topical content words
    (bursty) from function words (even), and flags template/boilerplate
    tokens whose dispersion explodes.  Per frequent token: document
    frequency, collection frequency, mean count when present, and the
    across-docs dispersion index var/mean (1 = Poisson, >> 1 = bursty);
    top BURST_TOP by dispersion.

    Exactness: df/cf and the squared-count moment are integers; mean and
    dispersion are fixed double chains over them (the overdispersion
    device per token).

    Plan: one (doc, token) rollup, one token rollup carrying three sums,
    one 1-row doc count broadcast, one top-k."""
    from pyspark.sql import functions as F  # noqa: F811 (local alias)

    d = load_table(spark, sf_dir, "documents")
    per_doc = (
        d.select("doc_id", F.explode(_toks(F.col("text"))).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sq = F.col("c").cast("decimal(19,0)")
    per_tok = per_doc.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.sum(F.col("c").cast("decimal(38,0)")).alias("cf"),
        F.sum(sq * sq).alias("c2"),
    )
    nd = d.agg(F.count(F.lit(1)).alias("n_docs"))
    j = per_tok.crossJoin(F.broadcast(nd))
    ndd = F.col("n_docs").cast("double")
    cfd = F.col("cf").cast("double")
    mean = cfd / ndd
    var = F.col("c2").cast("double") / ndd - mean * mean
    return (
        j.select(
            "token",
            "df",
            F.col("cf").cast("bigint").alias("cf"),
            F.round(cfd / F.col("df").cast("double"), 6).alias("mean_when_present"),
            F.round(F.try_divide(var, mean), 6).alias("dispersion"),
        )
        .orderBy(F.col("dispersion").desc(), "token")
        .limit(BURST_TOP)
    )


PMI_MIN_COUNT = 5  # Church-Hanks style bigram count floor
PMI_TOP = 25


def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information over adjacent token bigrams -- the
    Church-Hanks collocation mine (which word pairs co-occur far more
    than chance: the corpus-level signal for multi-word expressions,
    template boilerplate, and tokenizer-merge candidates):
    pmi(w1,w2) = ln( p(w1,w2) / (p(w1) p(w2)) ) with bigram probabilities
    over the bigram stream and unigram probabilities over the token
    stream, floored at PMI_MIN_COUNT bigram occurrences.

    Exactness: all four counts (bigram, both unigrams, the two stream
    totals) are exact integers; the PMI argument is the FIXED double
    chain ((c12/Nb) * (Nu/c1)) * (Nu/c2) -- identical op order on both
    faces, no sum-of-logs accumulation -- and the single ln rounds to 6.

    Plan: bigrams are built inside the row (zip of the token array with
    its own tail -- no positional self-join, no shuffle to form pairs);
    one keyed shuffle counts bigrams, one counts unigrams; the two
    1-row totals broadcast back. The groupBy keys bound shuffle volume
    by distinct-gram count, not corpus size."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    with_t = d.select(toks.alias("t"))
    bigrams = with_t.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("t"), 1, F.greatest(F.size("t") - 1, F.lit(0))),
                F.slice(F.col("t"), 2, F.greatest(F.size("t") - 1, F.lit(0))),
                lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    uni = with_t.select(F.explode("t").alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("cu")
    )
    big = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    n_u = uni.agg(F.sum("cu").alias("nu"))
    n_b = big.agg(F.sum("c12").alias("nb"))
    j = (
        big.filter(F.col("c12") >= PMI_MIN_COUNT)
        .join(uni.select(F.col("w").alias("w1"), F.col("cu").alias("c1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("cu").alias("c2")), "w2")
        .crossJoin(F.broadcast(n_u))
        .crossJoin(F.broadcast(n_b))
    )
    arg = (
        (F.col("c12").cast("double") / F.col("nb").cast("double"))
        * (F.col("nu").cast("double") / F.col("c1").cast("double"))
    ) * (F.col("nu").cast("double") / F.col("c2").cast("double"))
    return (
        j.select(
            "w1",
            "w2",
            F.col("c12").cast("bigint").alias("n_bigram"),
            F.round(F.log(arg), 6).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(PMI_TOP)
    )


def q_yule_k_lexical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule's characteristic K per source -- the length-invariant lexical
    richness constant (K rises as vocabulary use gets more repetitive;
    unlike type-token ratio it does not collapse as the corpus grows, so
    it compares sources of very different sizes honestly):
    K = 10^4 * (sum_w c_w^2 - N) / N^2 over the per-source token counts.

    Exactness: N and sum c^2 are exact integers (counts and DECIMAL
    squares); K is a fixed double chain on the two exact aggregates,
    rounded to 6 -- no per-face accumulation risk at all.

    Plan: one (source, token) keyed shuffle with map-side partial aggs,
    one per-source rollup; output is one row per source."""
    d = load_table(spark, sf_dir, "documents")
    per_tok = (
        d.select("source", F.explode(_toks(F.lower(F.col("text")))).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cd = F.col("c").cast("decimal(19,0)")
    per_src = per_tok.groupBy("source").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(cd * cd).alias("s2"),
    )
    nd = F.col("n_tokens").cast("double")
    return per_src.select(
        "source",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("n_types").cast("bigint").alias("n_types"),
        F.round(
            F.lit(10000.0) * ((F.col("s2").cast("double") - nd) / (nd * nd)), 6
        ).alias("yule_k"),
    ).orderBy("source")


MCRT_K = 32  # Monte-Carlo randomization replicates (deterministic md5 arms)


def q_randomization_test_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monte-Carlo randomization test for the English-vs-rest difference
    in mean document length -- the distribution-free companion to the
    parametric z/t gates (no normality, no variance formula: the null
    is built by RELABELING, the same md5 bucketing service the A/B gates
    use, so the whole reference distribution is deterministic and
    engine-portable): for k = 1..MCRT_K, each doc is reassigned to a
    pseudo-arm by md5 parity with seed k and the mean-length difference
    recomputed; p = (1 + #{k : |diff_k| >= |observed|}) / (K + 1), the
    standard add-one Monte-Carlo estimate.

    Exactness: every replicate's sums/counts are exact integers from one
    keyed aggregate; each diff is the identical fixed double chain on
    both faces, and the |diff_k| >= |obs| comparisons are double
    compares of identically-computed values -- no accumulation anywhere.

    Plan: one documents scan exploding a K-element replicate spine
    (map-side partial agg bounds the shuffle at K x 2 groups), one
    2-group observed aggregate, then scalar algebra."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    obs = d.groupBy((F.col("lang") == "en").cast("int").alias("arm")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("s")
    )
    mean = F.col("s").cast("double") / F.col("n").cast("double")
    obs_w = obs.groupBy().agg(
        F.max(F.when(F.col("arm") == 1, mean)).alias("m1"),
        F.max(F.when(F.col("arm") == 0, mean)).alias("m0"),
        F.sum("n").alias("n_docs"),
    )
    reps = d.select(
        "doc_id",
        "n_chars",
        F.explode(F.sequence(F.lit(1), F.lit(MCRT_K))).alias("k"),
    ).select(
        "k",
        "n_chars",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("mcrt"),
                            F.col("k").cast("string"),
                            F.lit(":"),
                            F.col("doc_id").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 2
        ).alias("arm"),
    )
    per_rep = reps.groupBy("k").agg(
        F.sum(F.when(F.col("arm") == 1, F.col("n_chars"))).alias("s1"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("arm") == 0, F.col("n_chars"))).alias("s0"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n0"),
    )
    diff_k = F.col("s1").cast("double") / F.col("n1").cast("double") - F.col(
        "s0"
    ).cast("double") / F.col("n0").cast("double")
    tail = per_rep.crossJoin(F.broadcast(obs_w)).agg(
        F.sum(
            (F.abs(diff_k) >= F.abs(F.col("m1") - F.col("m0"))).cast("int")
        ).alias("n_extreme")
    )
    return obs_w.crossJoin(F.broadcast(tail)).select(
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.lit(MCRT_K).cast("bigint").alias("n_replicates"),
        F.round(F.col("m1") - F.col("m0"), 6).alias("obs_diff"),
        F.col("n_extreme").cast("bigint").alias("n_extreme"),
        F.round(
            (F.lit(1.0) + F.col("n_extreme").cast("double"))
            / F.lit(float(MCRT_K + 1)),
            6,
        ).alias("p_value"),
    )


def q_readability_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading ease + Flesch-Kincaid grade per source -- the
    classic readability screen a corpus-quality pipeline runs next to
    the Gopher heuristics (too-hard and too-easy sources are both
    quality signals): words/sentence and syllables/word from exact
    counts, with the standard vowel-group syllable proxy
    (max(1, runs of [aeiouy]) per token) and sentence proxy
    (max(1, runs of [.!?]) per doc).

    Exactness: word, sentence, and syllable totals are exact integers
    (in-row array algebra, summed per source); both scores are fixed
    double chains on the three exact totals with the published literal
    coefficients, rounded to 6.

    Plan: everything per-doc is in-row (no explode shuffle); one
    per-source rollup."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    syl = F.aggregate(
        F.transform(
            toks,
            lambda t: F.greatest(F.regexp_count(t, F.lit("[aeiouy]+")), F.lit(1)),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    per_doc = d.select(
        "source",
        F.size(toks).cast("long").alias("w"),
        F.greatest(F.regexp_count(F.col("text"), F.lit("[.!?]+")), F.lit(1))
        .cast("long")
        .alias("st"),
        syl.alias("sy"),
    )
    per_src = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("w").alias("words"),
        F.sum("st").alias("sentences"),
        F.sum("sy").alias("syllables"),
    )
    wps = F.col("words").cast("double") / F.col("sentences").cast("double")
    spw = F.col("syllables").cast("double") / F.col("words").cast("double")
    return per_src.select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("words").cast("bigint").alias("words"),
        F.col("sentences").cast("bigint").alias("sentences"),
        F.col("syllables").cast("bigint").alias("syllables"),
        F.round(F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw, 6).alias(
            "flesch_reading_ease"
        ),
        F.round(
            F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59), 6
        ).alias("fk_grade"),
    ).orderBy("source")


MCN_CHARS = 300  # filter A: document length floor (chars)
MCN_TOKS = 55  # filter B: document length floor (tokens)


def q_mcnemar_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired test on two document-quality filters -- the
    right way to compare two filters evaluated on the SAME corpus
    (independent-sample tests double-count the shared docs; McNemar
    looks only at the DISAGREEMENT cells): with b = docs passing only
    the char-length filter and c = docs passing only the token-count
    filter, chi2 = (b - c)^2 / (b + c) (no continuity correction,
    stated), plus the raw 2x2 table and the agreement rate.

    Exactness: the four cells are exact integers from one scan (the
    token count is in-row array length, no explode); chi2 and agreement
    are single fixed double chains with try_divide for the b = c = 0
    degenerate corpus.

    Plan: one documents scan, one global 1-row aggregate -- no joins,
    no shuffle beyond the final combine."""
    d = load_table(spark, sf_dir, "documents")
    fa = (F.col("n_chars") >= MCN_CHARS).cast("int")
    fb = (F.size(_toks(F.col("text"))) >= MCN_TOKS).cast("int")
    cells = d.select(fa.alias("a_"), fb.alias("b_")).agg(
        F.sum((F.col("a_") * F.col("b_"))).alias("both_pass"),
        F.sum(F.col("a_") * (1 - F.col("b_"))).alias("only_chars"),
        F.sum((1 - F.col("a_")) * F.col("b_")).alias("only_tokens"),
        F.sum((1 - F.col("a_")) * (1 - F.col("b_"))).alias("both_fail"),
    )
    b = F.col("only_chars").cast("double")
    c = F.col("only_tokens").cast("double")
    n = (
        F.col("both_pass") + F.col("only_chars") + F.col("only_tokens") + F.col("both_fail")
    ).cast("double")
    return cells.select(
        F.col("both_pass").cast("bigint").alias("both_pass"),
        F.col("only_chars").cast("bigint").alias("only_chars"),
        F.col("only_tokens").cast("bigint").alias("only_tokens"),
        F.col("both_fail").cast("bigint").alias("both_fail"),
        F.round(
            F.try_divide((b - c) * (b - c), b + c), 6
        ).alias("mcnemar_chi2"),
        F.round(
            F.try_divide((F.col("both_pass") + F.col("both_fail")).cast("double"), n), 6
        ).alias("agreement"),
    )


def q_heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth fit across sources -- the companion
    constant to Zipf (V = K N^beta: how fast new vocabulary appears as a
    source grows; beta near 0.5 is natural text, near 1 is id-like
    noise, near 0 is template boilerplate): OLS of ln(types) on
    ln(tokens) over the per-source (N, V) points.

    Exactness: each source's token and type counts are exact integers;
    ln x / ln y are single libm calls rounded to 9, the OLS moments
    decimal-sum those rounded terms (the zipf_fit device), and
    slope / intercept / r^2 are fixed double chains with try_divide
    degeneracy guards. K itself is deliberately NOT emitted (exp is
    libm-unsafe across faces; consumers exponentiate heaps_lnk).

    Plan: one (source, token) keyed shuffle, one per-source rollup,
    then 20-point algebra."""
    d = load_table(spark, sf_dir, "documents")
    per_src = (
        d.select("source", F.explode(_toks(F.lower(F.col("text")))).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("source")
        .agg(F.sum("c").alias("n_tokens"), F.count(F.lit(1)).alias("n_types"))
    )
    pts = per_src.select(
        F.round(F.log(F.col("n_tokens").cast("double")), 9).alias("x"),
        F.round(F.log(F.col("n_types").cast("double")), 9).alias("y"),
    )
    dx = "decimal(18,9)"
    dxy = "decimal(38,18)"
    m = pts.agg(
        F.count(F.lit(1)).alias("g"),
        F.sum(F.col("x").cast(dx)).alias("sx"),
        F.sum(F.col("y").cast(dx)).alias("sy"),
        F.sum((F.col("x").cast(dx) * F.col("x").cast(dx)).cast(dxy)).alias("sxx"),
        F.sum((F.col("x").cast(dx) * F.col("y").cast(dx)).cast(dxy)).alias("sxy"),
        F.sum((F.col("y").cast(dx) * F.col("y").cast(dx)).cast(dxy)).alias("syy"),
    )
    gd = F.col("g").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    syy = F.col("syy").cast("double")
    vxx = gd * sxx - sx * sx
    vxy = gd * sxy - sx * sy
    vyy = gd * syy - sy * sy
    beta = F.try_divide(vxy, vxx)
    return m.select(
        F.col("g").cast("bigint").alias("n_sources"),
        F.round(beta, 6).alias("heaps_beta"),
        F.round((sy - beta * sx) / gd, 6).alias("heaps_lnk"),
        F.round(F.try_divide(vxy * vxy, vxx * vyy), 6).alias("r_squared"),
    )


def q_source_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration of the corpus across sources
    -- the one-number diversity gate a corpus datasheet leads with (HHI
    of token share: 1/n_sources = perfectly balanced, 1.0 = one source
    is the whole corpus), with the effective-source count 1/HHI (the
    "how many equal sources is this really" reading) for both token and
    document shares.

    Exactness: per-source token/doc counts are exact integers; each
    share^2 term is a fixed double chain rounded to 12 and
    decimal-summed over the bounded source list; the reciprocals are
    single divisions of those exact sums.

    Plan: one in-row token count (no explode), one source rollup,
    then 20-row algebra."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).cast("long")
    per_src = d.select("source", toks.alias("t")).groupBy("source").agg(
        F.count(F.lit(1)).alias("docs"), F.sum("t").alias("toks")
    )
    tot = per_src.agg(
        F.sum("docs").alias("td"), F.sum("toks").alias("tt"), F.count(F.lit(1)).alias("g")
    )
    j = per_src.crossJoin(F.broadcast(tot))
    shd = F.col("docs").cast("double") / F.col("td").cast("double")
    sht = F.col("toks").cast("double") / F.col("tt").cast("double")
    d12 = "decimal(18,12)"
    agg = j.groupBy("g").agg(
        F.sum(F.round(shd * shd, 12).cast(d12)).alias("hd"),
        F.sum(F.round(sht * sht, 12).cast(d12)).alias("ht"),
    )
    hdd = F.col("hd").cast("double")
    htd = F.col("ht").cast("double")
    return agg.select(
        F.col("g").cast("bigint").alias("n_sources"),
        F.round(hdd, 6).alias("hhi_docs"),
        F.round(htd, 6).alias("hhi_tokens"),
        F.round(F.try_divide(F.lit(1.0), hdd), 6).alias("effective_sources_docs"),
        F.round(F.try_divide(F.lit(1.0), htd), 6).alias("effective_sources_tokens"),
    )


CURVE_BUCKETS = 10
CURVE_N = 3  # token trigrams (the decile curve; distinct from the
# 5-gram first-occurrence gate q_ngram_novelty above)


def q_corpus_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram novelty curve across ingestion order -- the saturation
    diagnostic a corpus build watches to decide when more of a source
    stops adding information (each ingestion decile reports what
    fraction of its distinct trigrams were never seen in any earlier
    decile; a healthy growing corpus decays slowly, a recycled one
    falls off a cliff): buckets are doc_id deciles (ingestion order on
    this corpus), novelty = grams whose FIRST bucket is this bucket.

    Exactness: bucket assignment is the identical floor(id*10/(max+1))
    double chain on both faces; everything else is exact integer
    counting (distinct (bucket, gram) pairs, min-bucket per gram) and
    one rounded division per row.

    Plan: gram explosion feeds two keyed shuffles ((bucket, gram)
    distinct, then per-gram min); all joins after are on the 10-row
    bucket spine."""
    d = load_table(spark, sf_dir, "documents")
    mx = d.agg(F.max("doc_id").alias("mx"))
    bucket = F.floor(
        (F.col("doc_id") * CURVE_BUCKETS).cast("double")
        / (F.col("mx") + 1).cast("double")
    ).cast("int")
    base = d.crossJoin(F.broadcast(mx))
    grams = base.select(
        bucket.alias("bucket"),
        F.explode(ngram_array(_toks(F.lower(F.col("text"))), CURVE_N)).alias(
            "gram"
        ),
    )
    bg = grams.distinct()
    per_bucket = bg.groupBy("bucket").agg(F.count(F.lit(1)).alias("distinct_grams"))
    novel = (
        bg.groupBy("gram")
        .agg(F.min("bucket").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("novel_grams"))
    )
    ndocs = base.select(bucket.alias("bucket")).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return (
        ndocs.join(per_bucket, "bucket", "left")
        .join(novel, "bucket", "left")
        .select(
            F.col("bucket").cast("bigint").alias("bucket"),
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.coalesce("distinct_grams", F.lit(0)).cast("bigint").alias(
                "distinct_grams"
            ),
            F.coalesce("novel_grams", F.lit(0)).cast("bigint").alias("novel_grams"),
            F.round(
                F.try_divide(
                    F.coalesce("novel_grams", F.lit(0)).cast("double"),
                    F.coalesce("distinct_grams", F.lit(0)).cast("double"),
                ),
                6,
            ).alias("novelty_rate"),
        )
        .orderBy("bucket")
    )


LN2 = 0.6931471805599453  # literal, keeps log2 out of gated columns


def q_char_entropy_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level entropy per source in bits/char -- the
    compressibility screen (a gzip-ratio proxy with zero codec
    dependencies: low-entropy sources are template/boilerplate, outlier
    high entropy is often encoded junk), next to the token-level
    JS/Yule gates but at the raw-byte granularity quality filters
    actually act on.

    Exactness: per-(source, char) counts are exact integers from one
    position-exploded scan; each -(c/N) ln(c/N) term is a fixed double
    chain rounded to 12 into DECIMAL before the per-source sum (bounded
    alphabet), and bits divide by the ln2 LITERAL -- no log2 libm call.

    Plan: the explode multiplies rows by chars/doc but the groupBy key
    is (source, char), so map-side partial aggregation bounds shuffle
    volume by the alphabet, not the corpus."""
    d = load_table(spark, sf_dir, "documents")
    chars = d.select(
        "source",
        F.explode(
            F.expr("transform(sequence(1, length(text)), i -> substring(text, i, 1))")
        ).alias("ch"),
    )
    per = chars.groupBy("source", "ch").agg(F.count(F.lit(1)).alias("c"))
    tot = per.groupBy("source").agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("k")
    )
    j = per.join(tot, "source")
    term = F.round(
        -(F.col("c").cast("double") / F.col("n").cast("double"))
        * F.log(F.col("c").cast("double") / F.col("n").cast("double")),
        12,
    ).cast("decimal(18,12)")
    h = j.groupBy("source", "n", "k").agg(F.sum(term).alias("h"))
    return h.select(
        "source",
        F.col("n").cast("bigint").alias("n_chars"),
        F.col("k").cast("bigint").alias("n_distinct_chars"),
        F.round(F.col("h").cast("double") / F.lit(LN2), 6).alias(
            "entropy_bits_per_char"
        ),
    ).orderBy("source")


GT_MAX_R = 5  # smoothed counts reported for r = 1..GT_MAX_R


def q_good_turing_unseen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing unseen-mass estimate from the token
    frequency-of-frequencies -- the coverage number a tokenizer/corpus
    build quotes ("what probability mass will the NEXT document spend
    on words we have never seen"): P_unseen = V_1/N, plus the smoothed
    counts r* = (r+1) V_{r+1}/V_r for r = 1..GT_MAX_R (the adjustment
    SGT smoothing starts from).

    Exactness: V_r (number of types seen exactly r times) and N are
    exact integers from two keyed rollups; every reported number is a
    single division of exact ints rounded to 6.

    Plan: one (token) count shuffle, one tiny frequency-of-frequency
    rollup, then a GT_MAX_R+1-row literal spine."""
    d = load_table(spark, sf_dir, "documents")
    cnt = (
        d.select(F.explode(_toks(F.lower(F.col("text")))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    fof = cnt.groupBy("c").agg(F.count(F.lit(1)).alias("v"))
    tot = cnt.agg(F.sum("c").alias("n"), F.count(F.lit(1)).alias("types"))
    spine = spark.range(1, GT_MAX_R + 1).select(F.col("id").cast("long").alias("r"))
    vr = spine.join(fof.select(F.col("c").alias("r"), F.col("v").alias("vr")), "r", "left")
    vr1 = fof.select((F.col("c") - 1).alias("r"), F.col("v").alias("vr1"))
    rows = (
        vr.join(vr1, "r", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "r",
            F.coalesce("vr", F.lit(0)).cast("bigint").alias("v_r"),
            F.coalesce("vr1", F.lit(0)).cast("bigint").alias("v_r_plus_1"),
            F.round(
                F.try_divide(
                    (F.col("r") + 1).cast("double")
                    * F.coalesce("vr1", F.lit(0)).cast("double"),
                    F.coalesce("vr", F.lit(0)).cast("double"),
                ),
                6,
            ).alias("r_star"),
            F.round(
                F.when(F.col("r") == 1, F.coalesce("vr", F.lit(0)).cast("double"))
                .otherwise(F.lit(None))
                / F.col("n").cast("double"),
                9,
            ).alias("p_unseen"),
            F.col("n").cast("bigint").alias("n_tokens"),
            F.col("types").cast("bigint").alias("n_types"),
        )
        .orderBy("r")
    )
    return rows


KN_MIN = 10  # unigram count floor
KN_TOP = 20


def q_kneser_ney_continuation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser-Ney continuation statistics -- the smoothing insight every
    modern n-gram LM (and tokenizer-vocab debate) rests on: a token's
    CONTINUATION probability counts its distinct left contexts, not its
    raw frequency, so corpus-frequent-but-context-bound tokens (the
    'Francisco' effect) are exposed by a high raw-share /
    continuation-share ratio. Reports the KN_TOP most context-bound
    tokens above the count floor.

    Exactness: unigram counts, distinct-left-context counts, and the
    bigram-type total are exact integers (one in-row bigram zip, two
    keyed rollups); both shares and their ratio are fixed double chains
    rounded to 6/9.

    Plan: the PMI bigram device -- no positional self-join; shuffle
    bounded by distinct grams."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    with_t = d.select(toks.alias("t"))
    bigrams = with_t.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("t"), 1, F.greatest(F.size("t") - 1, F.lit(0))),
                F.slice(F.col("t"), 2, F.greatest(F.size("t") - 1, F.lit(0))),
                lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    btypes = bigrams.distinct()
    cont = btypes.groupBy("w2").agg(F.count(F.lit(1)).alias("n_contexts"))
    n_btypes = btypes.agg(F.count(F.lit(1)).alias("nb"))
    uni = with_t.select(F.explode("t").alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("cu")
    )
    nu = uni.agg(F.sum("cu").alias("nu"))
    j = (
        uni.filter(F.col("cu") >= KN_MIN)
        .join(cont.select(F.col("w2").alias("w"), "n_contexts"), "w")
        .crossJoin(F.broadcast(n_btypes))
        .crossJoin(F.broadcast(nu))
    )
    raw_share = F.col("cu").cast("double") / F.col("nu").cast("double")
    cont_share = F.col("n_contexts").cast("double") / F.col("nb").cast("double")
    return (
        j.select(
            F.col("w").alias("token"),
            F.col("cu").cast("bigint").alias("n_occurrences"),
            F.col("n_contexts").cast("bigint").alias("n_left_contexts"),
            F.round(raw_share, 9).alias("raw_share"),
            F.round(cont_share, 9).alias("continuation_share"),
            F.round(raw_share / cont_share, 6).alias("context_boundness"),
        )
        .orderBy(F.col("context_boundness").desc(), "token")
        .limit(KN_TOP)
    )


BD_TOP = 30  # marker-token panel size
BD_PAIRS = 10


def q_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta stylometric distance between sources -- the
    classic authorship/register metric (z-score each of the BD_TOP most
    frequent tokens' per-source relative frequencies across sources,
    then Delta(a,b) = mean |z_a - z_b|): the BD_PAIRS most
    similar-styled source pairs, the duplicate-PIPELINE signal upstream
    of content dedup (two 'different' sources with near-zero Delta are
    usually one crawl wearing two names).

    Exactness: token counts and per-source totals are exact integers;
    shares round to 12 into DECIMAL, the cross-source mean/std are
    fixed chains on those exact sums, and each |z_a - z_b| term rounds
    to 9 before the bounded 30-term mean.

    Plan: one (source, token) rollup; everything after lives on the
    30-token x 20-source panel."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(_toks(F.lower(F.col("text")))).alias("w")
    )
    # bounded materialization (sources x vocabulary rows -- the rollup the
    # plan note below lives on): totals, the top-token cut, and the shares
    # join would otherwise each re-run the corpus explode
    per = (
        toks.groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    totals = per.groupBy("source").agg(F.sum("c").alias("tot"))
    top = (
        per.groupBy("w")
        .agg(F.sum("c").alias("cg"))
        .orderBy(F.col("cg").desc(), "w")
        .limit(BD_TOP)
        .select("w")
    )
    # full 30 x n_sources panel: a token absent from a source has share 0,
    # not a dropped row (dropping would bias the cross-source moments)
    panel = top.crossJoin(F.broadcast(totals))
    shares = panel.join(per, ["source", "w"], "left").select(
        "w",
        "source",
        F.round(
            F.coalesce(F.col("c"), F.lit(0)).cast("double")
            / F.col("tot").cast("double"),
            12,
        )
        .cast("decimal(18,12)")
        .alias("f"),
    )
    stats = shares.groupBy("w").agg(
        F.count(F.lit(1)).alias("g"),
        F.sum("f").alias("s1"),
        F.sum(
            (F.col("f").cast("double") * F.col("f").cast("double")).cast(
                "decimal(38,24)"
            )
        ).alias("s2"),
    )
    gd = F.col("g").cast("double")
    mean = F.col("s1").cast("double") / gd
    sd = F.sqrt(
        F.greatest(
            F.col("s2").cast("double") / gd - mean * mean, F.lit(0.0)
        )
    )
    z = shares.join(F.broadcast(stats), "w").select(
        "w",
        "source",
        F.round(
            F.try_divide(F.col("f").cast("double") - mean, sd), 9
        ).alias("z"),
    )
    a = z.select("w", F.col("source").alias("sa"), F.col("z").alias("za"))
    b = z.select("w", F.col("source").alias("sb"), F.col("z").alias("zb"))
    pair_terms = a.join(b, "w").filter(F.col("sa") < F.col("sb")).select(
        "sa",
        "sb",
        F.round(F.abs(F.col("za") - F.col("zb")), 9)
        .cast("decimal(18,9)")
        .alias("t"),
    )
    delta = pair_terms.groupBy("sa", "sb").agg(
        F.count(F.lit(1)).alias("n_terms"), F.sum("t").alias("ts")
    )
    return (
        delta.select(
            F.col("sa").alias("source_a"),
            F.col("sb").alias("source_b"),
            F.col("n_terms").cast("bigint").alias("n_terms"),
            F.round(
                F.col("ts").cast("double") / F.col("n_terms").cast("double"), 6
            ).alias("delta"),
        )
        .orderBy("delta", "source_a", "source_b")
        .limit(BD_PAIRS)
    )


def q_orthographic_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orthographic character profile per source -- the Gopher-family
    surface signals the cheap quality pass reads before any model
    (digit-heavy sources are tables/logs, upper-heavy are headers/spam,
    punctuation-heavy are code or markup): digit / uppercase /
    punctuation character shares from exact per-doc regexp counts.

    Exactness: all four counts are exact integers from in-row
    regexp_count (no explode); each share is one rounded division of
    exact sums.

    Plan: one documents scan, one source rollup."""
    d = load_table(spark, sf_dir, "documents")
    per_doc = d.select(
        "source",
        F.length("text").cast("long").alias("chars"),
        F.regexp_count(F.col("text"), F.lit(r"[0-9]")).cast("long").alias("digits"),
        F.regexp_count(F.col("text"), F.lit(r"[A-Z]")).cast("long").alias("uppers"),
        F.regexp_count(F.col("text"), F.lit(r"[.,;:!?'\"()\[\]{}-]"))
        .cast("long")
        .alias("puncts"),
    )
    per = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("chars").alias("chars"),
        F.sum("digits").alias("digits"),
        F.sum("uppers").alias("uppers"),
        F.sum("puncts").alias("puncts"),
    )
    cd = F.col("chars").cast("double")
    return per.select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("chars").cast("bigint").alias("n_chars"),
        F.round(F.col("digits").cast("double") / cd, 6).alias("digit_share"),
        F.round(F.col("uppers").cast("double") / cd, 6).alias("upper_share"),
        F.round(F.col("puncts").cast("double") / cd, 6).alias("punct_share"),
    ).orderBy("source")


STOPWORDS = (
    "the", "of", "and", "to", "a", "in", "is", "it", "that", "for",
    "on", "with", "as", "was", "at", "by", "an", "be", "this", "are",
)


def q_stopword_ratio_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-token share per source -- the CCNet/Gopher fluency
    heuristic (natural English runs ~30-50% stopwords; near-zero means
    keyword stuffing, code, or another language leaking past langid):
    share of tokens in the literal 20-word function-word panel.

    Exactness: token and stopword counts are exact integers (one
    explode with map-side combine on the bounded (source, is_stop)
    key); the share is one rounded division.

    Plan: one token explode, one source rollup."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(_toks(F.lower(F.col("text")))).alias("w")
    )
    per = toks.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.col("w").isin(*STOPWORDS).cast("long")).alias("n_stop"),
    )
    return per.select(
        "source",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("n_stop").cast("bigint").alias("n_stopwords"),
        F.round(
            F.col("n_stop").cast("double") / F.col("n_tokens").cast("double"), 6
        ).alias("stopword_share"),
    ).orderBy("source")


TOKLEN_CAP = 15  # lengths above the cap share one overflow bucket


def q_token_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram -- the tokenizer designer's first plot
    (the length mix decides merge-table budgets and whether byte
    fallback will fire; a fat overflow bucket means ids/URLs leaking
    through normalization): corpus-wide token counts by character
    length, capped at TOKLEN_CAP with an overflow bucket.

    Exactness: lengths and counts are integers (one explode with the
    bounded length key); shares are rounded divisions.

    Plan: one token explode, one <= TOKLEN_CAP+1-key rollup."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(_toks(F.lower(F.col("text")))).alias("w"))
    bucket = F.least(F.length("w"), F.lit(TOKLEN_CAP + 1))
    per = toks.groupBy(bucket.alias("length")).agg(
        F.count(F.lit(1)).alias("n_tokens")
    )
    tot = per.agg(F.sum("n_tokens").alias("t"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            F.col("length").cast("bigint").alias("length"),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.round(
                F.col("n_tokens").cast("double") / F.col("t").cast("double"), 6
            ).alias("share"),
        )
        .orderBy("length")
    )


GRAM_COV_THRESHOLDS = [2, 5, 10]


def q_gram_frequency_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram frequency-coverage panel -- the vocabulary-truncation
    planner (keep only grams seen >= c times: how much of the bigram
    STREAM is still covered, and how many table entries survive; the
    sort-free cousin of a top-K coverage curve, which is what scales --
    a threshold needs no global rank): one row per literal threshold.

    Exactness: gram counts are integers (the in-row zip bigram device);
    per-threshold covered occurrences and retained types are integer
    conditional sums; shares are rounded divisions.

    Plan: one gram-keyed shuffle, then a 3-row literal threshold panel
    over the count table (map-side combine; no sort anywhere)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    bigrams = d.select(toks.alias("t")).select(
        F.explode(
            F.zip_with(
                F.slice(F.col("t"), 1, F.greatest(F.size("t") - 1, F.lit(0))),
                F.slice(F.col("t"), 2, F.greatest(F.size("t") - 1, F.lit(0))),
                lambda x, y: F.concat_ws(" ", x, y),
            )
        ).alias("g")
    )
    cnt = bigrams.groupBy("g").agg(F.count(F.lit(1)).alias("c"))
    spine = spark.createDataFrame(
        [(t,) for t in GRAM_COV_THRESHOLDS], ["threshold"]
    )
    j = cnt.crossJoin(F.broadcast(spine))
    per = j.groupBy("threshold").agg(
        F.sum("c").alias("total_occ"),
        F.count(F.lit(1)).alias("total_types"),
        F.sum(F.when(F.col("c") >= F.col("threshold"), F.col("c")).otherwise(0)).alias(
            "covered_occ"
        ),
        F.sum((F.col("c") >= F.col("threshold")).cast("long")).alias("kept_types"),
    )
    return per.select(
        F.col("threshold").cast("bigint").alias("threshold"),
        F.col("total_types").cast("bigint").alias("total_types"),
        F.col("kept_types").cast("bigint").alias("kept_types"),
        F.round(
            F.col("covered_occ").cast("double") / F.col("total_occ").cast("double"),
            6,
        ).alias("occurrence_coverage"),
        F.round(
            F.col("kept_types").cast("double") / F.col("total_types").cast("double"),
            6,
        ).alias("type_retention"),
    ).orderBy("threshold")


def q_language_mix_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language mix per source -- the routing table the multilingual
    pipeline branches on (a source that is 95% one language gets the
    fast path; a mixed one needs per-doc language routing): per source,
    the language count, the dominant language, and its share.

    Determinism: the dominant language is the (count desc, lang) argmax
    via the max-struct device -- no window, no tie ambiguity.

    Exactness: counts are integers; the share is one rounded division.

    Plan: one (source, lang) rollup, one source rollup."""
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("c"))
    tot = per.groupBy("source").agg(
        F.sum("c").alias("n_docs"),
        F.count(F.lit(1)).alias("n_langs"),
        F.max(
            F.struct(
                F.col("c").alias("c"),
                # invert lang bytes would be needed for desc ties; the
                # (count, lang) max picks the LEXICALLY LAST lang on a
                # tie -- deterministic on both faces (documented)
                F.col("lang").alias("lang"),
            )
        ).alias("top"),
    )
    return tot.select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("n_langs").cast("bigint").alias("n_langs"),
        F.col("top.lang").alias("dominant_lang"),
        F.round(
            F.col("top.c").cast("double") / F.col("n_docs").cast("double"), 6
        ).alias("dominant_share"),
    ).orderBy("source")
