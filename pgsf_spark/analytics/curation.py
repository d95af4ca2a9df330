"""Model-based corpus curation: the three classic data-selection scorers.

Large-scale LLM pipelines select training documents with (1) a *quality
classifier* (GPT-3/LLaMA-style logistic regression over surface
features), (2) a *language-model perplexity filter* (CCNet-style: score
each document under a smoothed n-gram LM trained on the corpus), and
(3) *DSIR importance weights* (Xie et al. 2023: log-likelihood ratio of
a target distribution vs the raw distribution over hashed/unigram
features). All three are implemented here as pure DataFrame programs --
training included -- with no driver-side math and no libm dependence in
the classifier (softsign link: only +,*,/,abs, all exactly-rounded IEEE
ops, so results are bit-identical in any engine).

Scale design:
- The classifier's gradient-descent rounds chain declaratively like
  q_kmeans_clusters: each round is one corpus scan producing FOUR
  decimal-exact sums (the gradient), crossJoined back as a 1-row
  broadcast. T rounds = T scans, no collect, no Python loop state.
- The bigram LM is two keyed count aggregates (bigram, unigram) joined
  back to the exploded corpus; the count tables are vocabulary-sized, so
  the join broadcasts here and shuffle-joins at 100 TB -- either way the
  corpus is scanned twice total (count + score).
- DSIR is the same shape with two unigram tables (target, raw); the
  per-token log-ratio depends only on the token, so it is joined in as a
  precomputed column -- the ln() runs once per VOCABULARY entry, not per
  corpus token. Per-token terms are rounded to DECIMAL(18,9) before the
  per-document sum, so a sub-ulp libm difference between engines cannot
  flip the accumulated double.

Reference scope: the reference engine has no model-based curation (its
analytics stop at SOQL aggregates, `/root/reference/query.py`); these
operators are part of the extended 100-TB training-data brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pgsf_spark.analytics.oracle_utils import dsum
from pgsf_spark.tables import load_table

# --- logistic-family quality classifier -------------------------------------

CLF_STEPS = 4  # full-batch gradient rounds (unrolled in the oracle)
CLF_LR = 4.0  # learning rate on the MEAN gradient


def _features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distillation setup: the label is the rule-based quality gate's keep
    flag (pipeline.quality_flags -- the expensive/authoritative judge), the
    features are cheap surface statistics NOT used verbatim by the rules
    (scaled token count, distinct-token ratio, scaled chars-per-token).
    Training a linear model to imitate a rule/LLM judge is the standard
    way production pipelines make corpus filtering cheap at 100 TB."""
    from pgsf_spark.analytics.pipeline import quality_flags

    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    return quality_flags(d).select(
        "doc_id",
        F.col("keep").cast("int").alias("y"),
        (F.size(toks) / F.lit(100.0)).alias("x1"),
        (F.size(F.array_distinct(toks)) / F.size(toks)).alias("x2"),
        (F.col("n_chars") / F.size(toks) / F.lit(10.0)).alias("x3"),
    )


def _softsign(z: Column) -> Column:
    """Algebraic sigmoid 0.5*(1 + z/(1+|z|)): same S-shape as the logistic
    link but built only from exactly-rounded IEEE ops -- the per-row score
    is bit-identical in every engine, which libm exp() does not guarantee."""
    return F.lit(0.5) * (F.lit(1.0) + z / (F.lit(1.0) + F.abs(z)))


def _z(w) -> Column:
    return (
        F.col(w + "0")
        + F.col(w + "1") * F.col("x1")
        + F.col(w + "2") * F.col("x2")
        + F.col(w + "3") * F.col("x3")
    )


def _gd_step(feat: DataFrame, w: DataFrame) -> DataFrame:
    """One full-batch gradient round: w += LR * mean((y - s) * x)."""
    err = F.col("y") - _softsign(_z("w"))
    g = feat.crossJoin(F.broadcast(w)).agg(
        *[
            (dsum(err * xj, "decimal(27,15)") / F.count(F.lit(1))).alias(f"g{j}")
            for j, xj in enumerate([F.lit(1.0), F.col("x1"), F.col("x2"), F.col("x3")])
        ]
    )
    return w.crossJoin(F.broadcast(g)).select(
        *[(F.col(f"w{j}") + F.lit(CLF_LR) * F.col(f"g{j}")).alias(f"w{j}") for j in range(4)]
    )


def q_quality_classifier_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the quality classifier IN the engine and report weights,
    training accuracy, and AUC (midrank form, exact) as one row.

    The AUC midranks reuse the Mann-Whitney construction
    (profiling.q_mann_whitney_u): rank + (ties-1)/2 from one sort-shuffle.
    """
    feat = _features(spark, sf_dir)
    w = feat.sparkSession.range(1).select(
        *[F.lit(0.0).alias(f"w{j}") for j in range(4)]
    )
    for _ in range(CLF_STEPS):
        w = _gd_step(feat, w)

    scored = feat.crossJoin(F.broadcast(w)).select(
        "doc_id", "y", _softsign(_z("w")).alias("s")
    )
    # exact midranks on the DISTINCT-score grid: midrank(s) = cum_less(s)
    # + (ties(s)+1)/2, identical to rank() + (ties-1)/2 per row (rank at s
    # = cum_less+1) but computed over the compressed score table with a
    # range-partitioned cumsum (operators.ranking) -- the doc-grain global
    # sort the naive window form would pay is gone. Midranks are dyadic
    # rationals, so c_pos*midrank is the exact per-row sum.
    from pgsf_spark.operators.ranking import global_cumsum

    by_s = scored.groupBy("s").agg(
        F.count(F.lit(1)).alias("c_all"),
        F.sum("y").alias("c_pos"),
        F.sum(((F.col("s") >= 0.5).cast("int") == F.col("y")).cast("int")).alias(
            "c_correct"
        ),
    )
    ranked = global_cumsum(
        by_s, [F.col("s").asc()], {"cum_less": (F.col("c_all"), False)}
    ).withColumn("midrank", F.col("cum_less") + (F.col("c_all") + 1) / 2.0)
    agg = ranked.agg(
        F.sum("c_pos").alias("n_pos"),
        (F.sum("c_all") - F.sum("c_pos")).alias("n_neg"),
        F.round(F.sum("c_correct") / F.sum("c_all"), 4).alias("train_acc"),
        F.round(
            (
                F.sum(F.col("c_pos") * F.col("midrank"))
                - F.sum("c_pos") * (F.sum("c_pos") + F.lit(1)) / F.lit(2.0)
            )
            / (F.sum("c_pos") * (F.sum("c_all") - F.sum("c_pos"))),
            6,
        ).alias("auc"),
    )
    return agg.crossJoin(F.broadcast(w)).select(
        *[F.round(F.col(f"w{j}"), 6).alias(f"w{j}") for j in range(4)],
        "n_pos",
        "n_neg",
        "train_acc",
        "auc",
    )


# --- bigram-LM perplexity filter --------------------------------------------


def q_doc_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document negative log-likelihood under an add-one-smoothed
    bigram LM trained on the corpus itself -- the CCNet quality filter
    (low nll = looks like the corpus; high nll = outlier/noise).

    nll(d) = -(1/m) * sum_i ln( (c2(w_{i-1}, w_i) + 1) / (c1(w_{i-1}) + V) )

    Count tables come from one exploded-pair aggregate; scoring joins them
    back on the bigram key. Per-bigram log terms are rounded into
    DECIMAL(18,9) before the per-doc sum (sub-ulp ln() differences between
    engines cannot flip the result)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    t = d.select("doc_id", toks.alias("t"))
    pairs = t.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("t") >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size("t") - 2),
                    lambda i: F.struct(
                        F.col("t")[i].alias("w1"), F.col("t")[i + 1].alias("w2")
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("p"),
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))

    c2 = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    uni = t.select(F.explode("t").alias("w"))
    c1 = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    v = c1.agg(F.count(F.lit(1)).alias("v"))

    term = -F.log((F.col("c2") + F.lit(1)) / (F.col("c1") + F.col("v")))
    return (
        pairs.join(F.broadcast(c2), ["w1", "w2"])
        .join(F.broadcast(c1.withColumnRenamed("w", "w1")), "w1")
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                dsum(term, "decimal(18,9)") / F.count(F.lit(1)), 6
            ).alias("nll"),
        )
    )


# --- DSIR importance weights ------------------------------------------------

DSIR_TARGET_LANG = "en"  # the distribution we want more of


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Data Selection via Importance Resampling) log-weights:
    logw(d) = sum over tokens of ln( p_target(w) / p_raw(w) ), with
    add-one-smoothed unigram models of the target slice vs the whole
    corpus. Documents resembling the target get positive weight and are
    favored when resampling the corpus.

    The ratio depends only on the token, so ln() is evaluated per
    VOCABULARY entry in the count table (broadcast here, shuffle join at
    scale), then summed per document in DECIMAL(18,9)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    t = d.select("doc_id", "lang", toks.alias("t"))
    uni = t.select("lang", F.explode("t").alias("w"))
    raw = uni.groupBy("w").agg(F.count(F.lit(1)).alias("cr"))
    tgt = (
        uni.filter(F.col("lang") == DSIR_TARGET_LANG)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    totals = raw.agg(
        F.sum("cr").alias("nr"),
        F.count(F.lit(1)).alias("v"),
    ).crossJoin(uni.filter(F.col("lang") == DSIR_TARGET_LANG).agg(F.count(F.lit(1)).alias("nt")))

    # per-vocabulary-entry log ratio (missing target count -> 0)
    ratio = F.log(
        ((F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1)) * (F.col("nr") + F.col("v")))
        / ((F.col("cr") + F.lit(1)) * (F.col("nt") + F.col("v")))
    )
    vocab = (
        raw.join(tgt, "w", "left")
        .crossJoin(F.broadcast(totals))
        .select("w", ratio.alias("lr"))
    )
    return (
        t.select("doc_id", "lang", F.explode("t").alias("w"))
        .join(F.broadcast(vocab), "w")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(dsum(F.col("lr"), "decimal(18,9)"), 6).alias("log_weight"),
        )
    )


def q_roc_auc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC of a selection score against a reference label -- the
    evaluation every curation classifier ships with. Here: how well raw
    document length (n_chars, the cheapest quality proxy) ranks English
    docs above non-English ones. AUC is computed by the rank-sum identity
    AUC = (sum of positive midranks - n_pos(n_pos+1)/2) / (n_pos * n_neg),
    which handles score ties exactly (midranks) instead of sampling the
    curve.

    Portability: the same pure-rank-arithmetic argument as
    q_mann_whitney_u -- midranks are dyadic rationals, every sum is
    integer-exact in doubles at any realistic n, no rounding anywhere.
    Plan: one groupBy on the score compresses the corpus to distinct score
    values; one window over that value table forms cumulative ranks; one
    scalar agg finishes. The corpus is touched once."""
    d = load_table(spark, sf_dir, "documents")
    labeled = d.select(
        F.col("n_chars").alias("score"),
        (F.col("lang") == "en").cast("bigint").alias("pos"),
    )
    by_val = labeled.groupBy("score").agg(
        F.count(F.lit(1)).alias("c_all"), F.sum("pos").alias("c_pos")
    )
    # data-derived distinct-score grid -> range-partitioned cumulative
    # counts (operators.ranking), not a single-partition window
    from pgsf_spark.operators.ranking import global_cumsum

    ranked = global_cumsum(
        by_val, [F.col("score").asc()], {"cum_less": (F.col("c_all"), False)}
    ).withColumn("midrank", F.col("cum_less") + (F.col("c_all") + 1) / 2.0)
    return ranked.agg(
        F.sum("c_pos").cast("bigint").alias("n_pos"),
        (F.sum("c_all") - F.sum("c_pos")).cast("bigint").alias("n_neg"),
        F.sum(F.col("c_pos") * F.col("midrank")).alias("rank_sum_pos"),
    ).select(
        "n_pos",
        "n_neg",
        F.round(
            (F.col("rank_sum_pos") - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0)
            / (F.col("n_pos") * F.col("n_neg")),
            6,
        ).alias("auc"),
    )


CAL_BIN_WIDTH = 100  # fixed-width n_chars bins (data-independent: no global sort)
CAL_MAX_BIN = 9


def q_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + exact isotonic (PAVA) fit of a selection score
    against a reference label: per score-bin empirical positive rate, plus
    the best monotone (non-decreasing) rate curve -- what turns a raw
    classifier score into a calibrated probability (the companion gate to
    q_roc_auc_quality: AUC grades RANKING, calibration grades the VALUES).

    The isotonic fit uses the minimax identity iso_i = max_{j<=i} min_{k>=i}
    mean(y over bins j..k) -- an exact closed form of pool-adjacent-
    violators that needs no sequential pass, just pair enumeration over the
    BIN table (<= 10 rows, so <= 550 (i,j,k) triples: driver-free,
    engine-portable, trivially parallel). Each mean is one double division
    of exact integer cumulative counts; min/max of doubles are order-free.

    Scale shape: bins are fixed-width on the score (a scan-side projection
    -- deliberately NOT ntile deciles, which would globally sort the
    corpus); one |bins|-key aggregate touches the corpus, everything after
    is calendar-table-sized."""
    d = load_table(spark, sf_dir, "documents")
    binned = d.select(
        F.least(F.lit(CAL_MAX_BIN), F.floor(F.col("n_chars") / CAL_BIN_WIDTH)).cast("int").alias("bin"),
        (F.col("lang") == "en").cast("bigint").alias("pos"),
    )
    bins = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"), F.sum("pos").alias("p")
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = bins.select(
        "bin", "n", "p", F.sum("n").over(w).alias("cn"), F.sum("p").over(w).alias("cp")
    ).localCheckpoint(eager=True)
    jj = cum.select(
        F.col("bin").alias("j"),
        (F.col("cn") - F.col("n")).alias("cn_pre"),
        (F.col("cp") - F.col("p")).alias("cp_pre"),
    )
    kk = cum.select(F.col("bin").alias("k"), F.col("cn").alias("cn_k"), F.col("cp").alias("cp_k"))
    seg = jj.join(kk, F.col("j") <= F.col("k")).select(
        "j",
        "k",
        ((F.col("cp_k") - F.col("cp_pre")) / (F.col("cn_k") - F.col("cn_pre"))).alias("mean"),
    )
    ii = cum.select(F.col("bin").alias("i"), "n", "p")
    iso = (
        ii.join(seg, (F.col("j") <= F.col("i")) & (F.col("i") <= F.col("k")))
        .groupBy("i", "j", "n", "p")
        .agg(F.min("mean").alias("m"))
        .groupBy("i", "n", "p")
        .agg(F.max("m").alias("iso"))
    )
    return iso.select(
        F.col("i").alias("bin"),
        "n",
        F.round(F.col("p") / F.col("n"), 6).alias("pos_rate"),
        F.round("iso", 6).alias("iso_rate"),
    ).orderBy("bin")


TE_SEED = "te6"
TE_K = 5  # encoding folds


def q_target_encoding_oof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe out-of-fold target encoding of order priority by order
    value -- the categorical-feature device every tabular training
    pipeline needs: each row's category is encoded with the target mean
    computed WITHOUT its own fold, so the encoding never leaks the row's
    own label into its feature (the classic target-encoding overfit).

    oof_mean(category, fold) = (sum_cat - sum_cat_fold) /
    (n_cat - n_cat_fold), assembled from per-(category, fold) integer-cent
    sums -- one groupBy shuffle at the (category, fold) grain (25 cells),
    then pure cell algebra: the subtraction trick means ONE corpus pass
    total, not K passes. Folds are seeded md5 slots (retry-stable, no
    rand()). At 100 TB the cell table is dims x K rows -- broadcast back
    for the actual encoding join."""
    orders = load_table(spark, sf_dir, "orders")
    fold = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{TE_SEED}:"), F.col("o_orderkey").cast("string"))), 1, 8
            ),
            16,
            10,
        )
        .cast("long")
        % TE_K
    ).cast("int")
    cells = (
        orders.select(
            F.col("o_orderpriority").alias("category"),
            fold.alias("fold"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("category", "fold")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s"))
    )
    tot = cells.groupBy("category").agg(
        F.sum("n").alias("n_cat"), F.sum("s").alias("s_cat")
    )
    return (
        cells.join(tot, "category")
        .select(
            "category",
            "fold",
            F.col("n").alias("n_in_fold"),
            # try_divide: a category living entirely in ONE fold has no
            # out-of-fold rows (n_cat == n) -> NULL on both faces, not an
            # ANSI error / Inf divergence
            F.round(
                F.try_divide(
                    (F.col("s_cat") - F.col("s")).cast("double"),
                    F.col("n_cat") - F.col("n"),
                )
                / 100.0,
                6,
            ).alias("oof_mean_usd"),
        )
        .orderBy("category", "fold")
    )


def q_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa agreement between two binary document labelers --
    the chance-corrected agreement score every labeling pipeline reports
    before trusting a cheap signal as a proxy for an expensive one. The
    two raters here: "long document" (n_chars above the corpus median)
    and "exact-unique" (its normalized-text fingerprint appears once) --
    kappa near 0 says length tells you nothing about duplication; a pile
    of near-zero kappas is exactly how redundant quality signals are
    pruned from a curation stack.

    Exactness: the 2x2 table is integer counts; po, pe, and kappa are a
    handful of IEEE double ops identical on both engines; the median
    threshold is the same interpolated percentile both engines define.
    Plan: one fingerprint groupBy (the dedup_exact shuffle), one median
    scalar, one 2x2 aggregate."""
    from pgsf_spark.analytics.dedup import _norm_text

    d = load_table(spark, sf_dir, "documents")
    med = d.agg(F.expr("percentile(n_chars, 0.5D)").alias("m"))
    fp = d.select("doc_id", F.md5(_norm_text(F.col("text"))).alias("fp"))
    # counts join back to the docs (the oracle's own shape): a collect_list
    # per fingerprint would materialize the hottest duplicate cluster as
    # one task-local array -- exactly the skew the dedup shelf exists to
    # avoid
    cnt = fp.groupBy("fp").agg(F.count(F.lit(1)).alias("n_copies"))
    uniq = fp.join(cnt, "fp").select("doc_id", (F.col("n_copies") == 1).alias("is_unique"))
    base = (
        d.select("doc_id", "n_chars")
        .join(uniq, "doc_id")
        .crossJoin(F.broadcast(med))
        .select(
            (F.col("n_chars") > F.col("m")).cast("int").alias("a"),
            F.col("is_unique").cast("int").alias("b"),
        )
    )
    g = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("a") * F.col("b"))).cast("bigint").alias("n11"),
        F.sum((F.col("a") * (1 - F.col("b")))).cast("bigint").alias("n10"),
        F.sum(((1 - F.col("a")) * F.col("b"))).cast("bigint").alias("n01"),
        F.sum(((1 - F.col("a")) * (1 - F.col("b")))).cast("bigint").alias("n00"),
    )
    n = F.col("n_docs").cast("double")
    po = (F.col("n11") + F.col("n00")) / n
    pa = (F.col("n11") + F.col("n10")) / n
    pb = (F.col("n11") + F.col("n01")) / n
    pe = pa * pb + (1 - pa) * (1 - pb)
    return g.select(
        "n_docs",
        "n11",
        "n10",
        "n01",
        "n00",
        # try_divide: perfect chance agreement (pe == 1, e.g. a constant
        # rater) makes kappa undefined -> NULL on both faces
        F.round(F.try_divide(po - pe, 1 - pe), 6).alias("kappa"),
    )


BRIER_SEED = "br7"  # train/eval split seed for the calibration forecast


def _brier_split(doc_id):
    """md5-parity train/eval split (the _ab_arm device on doc_id): 0 =
    train (fits the per-bin forecast), 1 = eval (scores it)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{BRIER_SEED}:"), doc_id.cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % 2
    )


def q_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score -- reliability, resolution,
    uncertainty -- for a binned probability forecast of "document is
    English" fit on a train split and scored on a held-out eval split.
    This is the gate that says WHY a calibrated score is good or bad:
    reliability (want 0) measures miscalibration of the forecast values,
    resolution (want large) measures how much the bins actually separate
    outcomes, uncertainty is the outcome's intrinsic variance; for a
    per-bin-constant forecast Brier = reliability - resolution +
    uncertainty EXACTLY, so the gate emits all four and the identity is
    auditable. Completes the calibration shelf: roc_auc grades ranking,
    isotonic grades the curve, Brier grades the probabilities.

    Exactness: forecasts p_k and eval rates ybar_k are single double
    divisions of exact integer counts; each bin's reliability/resolution
    term is a fixed op chain rounded to 9 and decimal-summed over the
    <= 10 bin rows, so accumulation order cannot drift. Bins with no
    train rows have no forecast and are excluded on both faces
    (documented; unreachable once every fixed-width bin is populated).

    Scale shape: same fixed-width score bins as q_isotonic_calibration
    (scan-side projection, no global sort); ONE groupBy(bin, split)
    aggregate touches the corpus, everything downstream is <= 10 rows."""
    d = load_table(spark, sf_dir, "documents")
    rows = d.select(
        F.least(F.lit(CAL_MAX_BIN), F.floor(F.col("n_chars") / CAL_BIN_WIDTH))
        .cast("int")
        .alias("bin"),
        (F.col("lang") == "en").cast("long").alias("y"),
        _brier_split(F.col("doc_id")).alias("split"),
    )
    cells = rows.groupBy("bin", "split").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    )
    train = cells.filter(F.col("split") == 0).select(
        "bin",
        (F.col("pos").cast("double") / F.col("n").cast("double")).alias("p_k"),
        F.col("n").alias("n_train_bin"),
    )
    ev = cells.filter(F.col("split") == 1).select(
        "bin", F.col("n").alias("n_k"), F.col("pos").alias("pos_k")
    )
    both = ev.join(train, "bin")
    tot = both.agg(
        F.sum("n_k").alias("n_eval"), F.sum("pos_k").alias("pos_eval")
    )
    ybar = F.col("pos_eval").cast("double") / F.col("n_eval").cast("double")
    yk = F.col("pos_k").cast("double") / F.col("n_k").cast("double")
    nk = F.col("n_k").cast("double")
    dec = "decimal(27,9)"
    terms = both.crossJoin(F.broadcast(tot)).select(
        F.col("n_k"),
        F.col("n_eval"),
        F.col("pos_eval"),
        F.round(nk * (F.col("p_k") - yk) * (F.col("p_k") - yk), 9)
        .cast(dec)
        .alias("rel_t"),
        F.round(nk * (yk - ybar) * (yk - ybar), 9).cast(dec).alias("res_t"),
    )
    g = terms.groupBy("n_eval", "pos_eval").agg(
        F.sum("rel_t").cast("double").alias("rel_s"),
        F.sum("res_t").cast("double").alias("res_s"),
        F.sum("n_k").cast("bigint").alias("n_binned"),
    )
    n_eval_d = F.col("n_eval").cast("double")
    yb = F.col("pos_eval").cast("double") / n_eval_d
    rel = F.col("rel_s") / n_eval_d
    res = F.col("res_s") / n_eval_d
    unc = yb * (1 - yb)
    return g.select(
        F.col("n_eval").cast("bigint").alias("n_eval"),
        "n_binned",
        F.round(rel, 6).alias("reliability"),
        F.round(res, 6).alias("resolution"),
        F.round(unc, 6).alias("uncertainty"),
        F.round(rel - res + unc, 6).alias("brier_score"),
    )


def q_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa across THREE deterministic binary raters per document
    -- the multi-rater generalization of q_cohens_kappa (which compares
    exactly two): rater 1 = "long" (n_chars above the corpus median),
    rater 2 = "exact-unique" (normalized fingerprint appears once),
    rater 3 = "English" (lang == 'en'). Near-zero kappa says the three
    cheap quality signals don't agree beyond chance -- i.e. they carry
    independent information and none can replace the others; high kappa
    flags redundant raters a labeling budget can drop.

    Exactness: with r = 3 binary raters, per-item agreement P_i is 1 for a
    unanimous item and 1/3 otherwise (the pair-count identity collapses),
    so P_bar = (n_unanimous + (N - n_unanimous)/3) / N and everything is a
    fixed chain of double ops on integer counts; try_divide makes the
    degenerate P_e = 1 case NULL on both faces.

    Scale shape: the median is one percentile scalar, the uniqueness
    signal is the dedup_exact fingerprint groupBy, then ONE aggregate over
    per-doc vote counts -- no windows, no pairs."""
    from pgsf_spark.analytics.dedup import _norm_text

    d = load_table(spark, sf_dir, "documents")
    med = d.agg(F.expr("percentile(n_chars, 0.5D)").alias("m"))
    fp = d.select("doc_id", F.md5(_norm_text(F.col("text"))).alias("fp"))
    cnt = fp.groupBy("fp").agg(F.count(F.lit(1)).alias("n_copies"))
    uniq = fp.join(cnt, "fp").select("doc_id", (F.col("n_copies") == 1).alias("is_unique"))
    votes = (
        d.select("doc_id", "n_chars", "lang")
        .join(uniq, "doc_id")
        .crossJoin(F.broadcast(med))
        .select(
            (
                (F.col("n_chars") > F.col("m")).cast("long")
                + F.col("is_unique").cast("long")
                + (F.col("lang") == "en").cast("long")
            ).alias("n1")
        )
    )
    g = votes.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(((F.col("n1") == 0) | (F.col("n1") == 3)).cast("long"))
        .cast("bigint")
        .alias("n_unanimous"),
        F.sum("n1").cast("bigint").alias("n_pos_votes"),
    )
    n = F.col("n_docs").cast("double")
    p1 = F.col("n_pos_votes").cast("double") / (3.0 * n)
    p_bar = (
        F.col("n_unanimous").cast("double")
        + (n - F.col("n_unanimous").cast("double")) / 3.0
    ) / n
    p_e = p1 * p1 + (1 - p1) * (1 - p1)
    return g.select(
        "n_docs",
        "n_unanimous",
        F.round(p1, 6).alias("p_pos"),
        F.round(p_bar, 6).alias("p_bar"),
        F.round(p_e, 6).alias("p_e"),
        F.round(F.try_divide(p_bar - p_e, 1 - p_e), 6).alias("fleiss_kappa"),
    )


WILSON_Z = 1.959964  # two-sided 95% normal quantile; locked by erf test


def q_wilson_pass_rate_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score 95% confidence interval for the char-length filter
    pass-rate per source -- the uncertainty-aware version of the raw
    pass-rate every curation dashboard shows (the naive Wald interval
    collapses at extreme rates and small sources; Wilson stays honest):
    center = (p + z^2/2n) / (1 + z^2/n), half-width =
    z sqrt(p(1-p)/n + z^2/4n^2) / (1 + z^2/n).

    Exactness: pass counts are exact integers; the interval is one fixed
    double chain per source on (k, n) with the z LITERAL (same constant
    family as the BH threshold table, locked by the erf property test);
    try_divide guards the empty source.

    Plan: one documents scan, one source rollup, then per-row algebra."""
    from pgsf_spark.analytics.corpus import MCN_CHARS

    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("n_chars") >= MCN_CHARS).cast("int")).alias("k"),
    )
    nd = F.col("n").cast("double")
    p = F.col("k").cast("double") / nd
    z = F.lit(WILSON_Z)
    z2 = z * z
    denom = F.lit(1.0) + z2 / nd
    center = (p + z2 / (F.lit(2.0) * nd)) / denom
    half = (
        z
        * F.sqrt(p * (F.lit(1.0) - p) / nd + z2 / (F.lit(4.0) * nd * nd))
        / denom
    )
    return per.select(
        "source",
        F.col("n").cast("bigint").alias("n_docs"),
        F.col("k").cast("bigint").alias("n_pass"),
        F.round(p, 6).alias("pass_rate"),
        F.round(center - half, 6).alias("wilson_lo"),
        F.round(center + half, 6).alias("wilson_hi"),
    ).orderBy("source")


def q_pr_auc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (step-integral PR-AUC) of the length score
    against the English label -- the imbalanced-data companion to
    q_roc_auc_quality (ROC is blind to base rate; PR collapses when the
    positive class is rare, which is exactly the regime quality
    filtering lives in): AP = sum over descending distinct-score blocks
    of (delta recall) * (precision at block end).

    Exactness: cumulative TP/ALL per block are exact integers over the
    distinct-score spine; each block term is a fixed double chain
    rounded to 12 into DECIMAL before the sum.

    Plan: one score-value rollup (the corpus compresses to distinct
    n_chars values), one ordered window on that bounded spine."""
    d = load_table(spark, sf_dir, "documents")
    by_val = (
        d.select(
            F.col("n_chars").alias("score"),
            (F.col("lang") == "en").cast("long").alias("pos"),
        )
        .groupBy("score")
        .agg(F.count(F.lit(1)).alias("c_all"), F.sum("pos").alias("c_pos"))
    )
    # descending distinct-score grid is data-derived: range-partitioned
    # running sums (operators.ranking), not a single-partition window
    from pgsf_spark.operators.ranking import global_cumsum

    cum = (
        global_cumsum(
            by_val,
            [F.col("score").desc()],
            {"tp": (F.col("c_pos"), True), "all_": (F.col("c_all"), True)},
        )
        .withColumn("tp_prev", F.col("tp") - F.col("c_pos"))
        .select("score", "tp", "all_", "tp_prev")
    )
    tot = by_val.agg(
        F.sum("c_pos").alias("n_pos"), F.sum("c_all").alias("n_all")
    )
    j = cum.crossJoin(F.broadcast(tot))
    term = F.round(
        ((F.col("tp") - F.col("tp_prev")).cast("double") / F.col("n_pos").cast("double"))
        * (F.col("tp").cast("double") / F.col("all_").cast("double")),
        12,
    ).cast("decimal(18,12)")
    agg = j.groupBy("n_pos", "n_all").agg(F.sum(term).alias("ap"))
    return agg.select(
        F.col("n_pos").cast("bigint").alias("n_pos"),
        (F.col("n_all") - F.col("n_pos")).cast("bigint").alias("n_neg"),
        F.round(
            F.col("n_pos").cast("double") / F.col("n_all").cast("double"), 6
        ).alias("base_rate"),
        F.round(F.col("ap").cast("double"), 6).alias("average_precision"),
    )


def q_best_f1_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-F1 operating point of the length score for the English
    label -- the threshold a deployed filter actually needs (AUC ranks,
    but production wants ONE cut): sweep every distinct score as the
    ">= threshold" cut, report the F1-maximizing threshold with its
    precision/recall (ties broken toward the LOWER threshold, stated).

    Exactness: cumulative TP/ALL are exact integers; F1 at each block
    is 2TP/(TP + ALL_pred + n_pos... assembled as the fixed chain
    2tp/(all_pred + n_pos)) -- one double division per block; the
    argmax is an integer-deterministic orderBy/limit.

    Plan: same distinct-score spine as PR-AUC; the sweep IS the
    cumulative window, no per-threshold rescan."""
    d = load_table(spark, sf_dir, "documents")
    by_val = (
        d.select(
            F.col("n_chars").alias("score"),
            (F.col("lang") == "en").cast("long").alias("pos"),
        )
        .groupBy("score")
        .agg(F.count(F.lit(1)).alias("c_all"), F.sum("pos").alias("c_pos"))
    )
    from pgsf_spark.operators.ranking import global_cumsum

    cum = global_cumsum(
        by_val,
        [F.col("score").desc()],
        {"tp": (F.col("c_pos"), True), "pred": (F.col("c_all"), True)},
    ).select("score", "tp", "pred")
    tot = by_val.agg(F.sum("c_pos").alias("n_pos"))
    j = cum.crossJoin(F.broadcast(tot))
    f1 = F.round(
        F.try_divide(
            F.lit(2.0) * F.col("tp").cast("double"),
            (F.col("pred") + F.col("n_pos")).cast("double"),
        ),
        9,
    )
    best = (
        j.select(
            "score",
            "tp",
            "pred",
            "n_pos",
            f1.alias("f1"),
        )
        .orderBy(F.col("f1").desc(), F.col("score").asc())
        .limit(1)
    )
    return best.select(
        F.col("score").cast("bigint").alias("threshold"),
        F.col("tp").cast("bigint").alias("tp"),
        F.col("pred").cast("bigint").alias("n_predicted_pos"),
        F.col("n_pos").cast("bigint").alias("n_pos"),
        F.round(
            F.col("tp").cast("double") / F.col("pred").cast("double"), 6
        ).alias("precision"),
        F.round(
            F.col("tp").cast("double") / F.col("n_pos").cast("double"), 6
        ).alias("recall"),
        F.round(F.col("f1"), 6).alias("f1"),
    )


QN_Q = 9  # decile cut points 1..9


def q_quantile_normalization_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source -> global quantile-normalization map for document
    length -- the lookup table a feature normalizer applies so every
    source's length distribution lands on the corpus's (the batch-effect
    correction borrowed from bioinformatics; length-based quality
    filters then behave identically across sources): for each decile
    q/10, the source's type-1 order statistic paired with the global
    one.

    Exactness: both quantile ladders are ORDER STATISTICS over integer
    n_chars values (smallest value whose cumulative count reaches
    ceil(q*n/10)) -- no interpolation; everything is exact integers.

    Plan: one (source, value) rollup; cumulative windows ride the
    bounded distinct-length spine per source (and once globally)."""
    d = load_table(spark, sf_dir, "documents")
    sv = d.groupBy("source", "n_chars").agg(F.count(F.lit(1)).alias("c"))
    wsrc = Window.partitionBy("source").orderBy("n_chars").rowsBetween(
        Window.unboundedPreceding, 0
    )
    scum = sv.select(
        "source",
        "n_chars",
        F.sum("c").over(wsrc).alias("cum"),
        F.sum("c").over(Window.partitionBy("source")).alias("n"),
    )
    gv = d.groupBy("n_chars").agg(F.count(F.lit(1)).alias("c"))
    # global distinct-length grid is data-derived: range-partitioned
    # cumsum; the grand total rides along as a driver literal (the
    # per-partition sums are already collected for the offsets)
    from pgsf_spark.operators.ranking import global_order_stats

    gcum = global_order_stats(
        gv,
        [F.col("n_chars").asc()],
        cumsums={"cum": (F.col("c"), True)},
        totals={"cum": "n"},
    ).select("n_chars", "cum", "n")
    spine = spark.range(1, QN_Q + 1).select(F.col("id").cast("int").alias("q"))
    srcq = (
        spine.crossJoin(scum)
        .filter(
            F.col("cum")
            >= F.ceil(F.col("q") * F.col("n").cast("double") / F.lit(10.0))
        )
        .groupBy("source", "q")
        .agg(F.min("n_chars").alias("source_value"))
    )
    gq = (
        spine.crossJoin(F.broadcast(gcum))
        .filter(
            F.col("cum")
            >= F.ceil(F.col("q") * F.col("n").cast("double") / F.lit(10.0))
        )
        .groupBy("q")
        .agg(F.min("n_chars").alias("global_value"))
    )
    return (
        srcq.join(F.broadcast(gq), "q")
        .select(
            "source",
            F.col("q").cast("bigint").alias("q"),
            F.col("source_value").cast("bigint").alias("source_value"),
            F.col("global_value").cast("bigint").alias("global_value"),
            (F.col("global_value") - F.col("source_value"))
            .cast("bigint")
            .alias("shift"),
        )
        .orderBy("source", "q")
    )


AUCF_K = 5
AUCF_SEED = "aucf7"


def q_auc_by_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC per md5 fold with the cross-fold mean/spread -- the
    stability check on top of the single-number q_roc_auc_quality (one
    AUC can ride a lucky subset; five disjoint folds with a tight
    spread is what 'the score actually ranks' looks like): the same
    midrank rank-sum identity, computed within each of AUCF_K
    deterministic md5 folds.

    Exactness: fold assignment is the md5-slot device; per-fold
    midranks are dyadic rationals over integer counts (the ROC
    precedent); the cross-fold mean/std round per-fold AUCs to 9 into
    DECIMAL first.

    Plan: one (fold, score) rollup; windows ride the distinct-score
    spine per fold; 5-row algebra after."""
    d = load_table(spark, sf_dir, "documents")
    fold = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{AUCF_SEED}:"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % AUCF_K
    )
    labeled = d.select(
        fold.alias("fold"),
        F.col("n_chars").alias("score"),
        (F.col("lang") == "en").cast("bigint").alias("pos"),
    )
    by_val = labeled.groupBy("fold", "score").agg(
        F.count(F.lit(1)).alias("c_all"), F.sum("pos").alias("c_pos")
    )
    w = Window.partitionBy("fold").orderBy("score").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = by_val.withColumn(
        "cum_less", F.coalesce(F.sum("c_all").over(w), F.lit(0))
    ).withColumn("midrank", F.col("cum_less") + (F.col("c_all") + 1) / 2.0)
    per_fold = ranked.groupBy("fold").agg(
        F.sum("c_pos").cast("bigint").alias("n_pos"),
        (F.sum("c_all") - F.sum("c_pos")).cast("bigint").alias("n_neg"),
        F.round(
            (F.sum(F.col("c_pos") * F.col("midrank"))
             - F.sum("c_pos") * (F.sum("c_pos") + 1) / 2.0)
            / (F.sum("c_pos") * (F.sum("c_all") - F.sum("c_pos"))),
            9,
        ).alias("auc"),
    )
    dec = "decimal(18,9)"
    stats = per_fold.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("auc").cast(dec)).alias("s1"),
        F.sum(
            (F.col("auc").cast(dec) * F.col("auc").cast(dec)).cast("decimal(38,18)")
        ).alias("s2"),
    )
    kd = F.col("k").cast("double")
    mean = F.col("s1").cast("double") / kd
    sd = F.sqrt(
        F.greatest(F.col("s2").cast("double") / kd - mean * mean, F.lit(0.0))
    )
    return (
        per_fold.crossJoin(F.broadcast(stats))
        .select(
            F.col("fold").cast("bigint").alias("fold"),
            "n_pos",
            "n_neg",
            F.round(F.col("auc"), 6).alias("auc"),
            F.round(mean, 6).alias("mean_auc"),
            F.round(sd, 6).alias("sd_auc"),
        )
        .orderBy("fold")
    )
