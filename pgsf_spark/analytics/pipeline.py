"""Composed training-data pipeline: the stages every LLM corpus build runs,
wired end-to-end as ONE declarative plan (filter -> dedup -> split) so
Catalyst fuses the projections and the whole manifest is 2 shuffles
(fingerprint groupBy + the dedup join) regardless of corpus size.

Stage semantics are the individually-gated operators (quality_score,
dedup_exact, dataset_split); this module composes them, which is the actual
deliverable of a pipeline engine -- a user runs ONE query to get the
training manifest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pgsf_spark.analytics.sampling import assign_split
from pgsf_spark.tables import load_table

# quality thresholds (standard cheap pre-filters; tuned so the synthetic
# corpus is actually discriminated -- ~most kept, tail dropped)
MIN_TOKENS = 12
MAX_SHORT_RATIO = 0.4
MAX_DIGIT_RATIO = 0.3


def _norm_text(col):
    return F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))


def quality_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc keep/drop decision with the FIRST failing rule as the reason
    (audit trail: corpus reports need 'why was this dropped', not a bool)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_tok = F.size(toks)
    short_ratio = F.size(F.filter(toks, lambda t: F.length(t) <= 3)) / n_tok
    digit_ratio = F.length(F.regexp_replace(F.col(text_col), r"[^0-9]", "")) / F.length(text_col)
    reason = (
        F.when(n_tok < MIN_TOKENS, F.lit("too_few_tokens"))
        .when(short_ratio > MAX_SHORT_RATIO, F.lit("too_many_short_tokens"))
        .when(digit_ratio > MAX_DIGIT_RATIO, F.lit("too_many_digits"))
        .otherwise(F.lit(None))
    )
    return df.withColumn("drop_reason", reason).withColumn(
        "keep", F.col("drop_reason").isNull()
    )


def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate report: per-doc keep flag + first failing rule."""
    d = load_table(spark, sf_dir, "documents")
    return quality_flags(d).select(
        "doc_id", "keep", F.coalesce("drop_reason", F.lit("kept")).alias("drop_reason")
    )


def q_training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end corpus build: quality-filter -> exact-dedup (keep the
    min doc_id per content fingerprint) -> deterministic train/val/test
    split. Output is the manifest a training job consumes.

    Plan shape: one scan computes quality + fingerprint in the same
    projection; one groupBy(fingerprint) picks canonicals (map-side partial
    agg); one join back restricts to canonicals (broadcast at small scale,
    co-shuffled at 100 TB); split assignment is a free projection."""
    d = load_table(spark, sf_dir, "documents")
    flagged = quality_flags(d).filter(F.col("keep"))
    fp = flagged.withColumn("fp", F.md5(_norm_text(F.col("text"))))
    canonical = fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    kept = fp.select("doc_id", "source", "lang", "n_chars", "fp").join(
        canonical, on=["fp", "doc_id"], how="left_semi"
    )
    return assign_split(kept, "doc_id").select(
        "doc_id", "source", "lang", "n_chars", "split"
    )


def q_manifest_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-build report: docs and chars per (split, lang) after filtering
    and dedup -- the table that goes in the dataset card."""
    m = q_training_manifest(spark, sf_dir)
    return m.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_chars").cast("bigint")).alias("total_chars"),
    )


PACK_CAP_CHARS = 4096


def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-boundary sequence packing: docs are laid out in doc_id order
    within each source and grouped into training sequences of ~PACK_CAP
    chars (a doc starts sequence floor(prefix_before / cap)).

    Packing is per-source ON PURPOSE: a single global running sum would be
    one sequential window partition at 100 TB; per-shard packing keeps every
    shard's window independent (shuffle on source only) -- which is also how
    production packers shard (per input file / split)."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    prefix_before = F.coalesce(
        F.sum(F.col("n_chars").cast("bigint")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    packed = d.select(
        "source",
        "doc_id",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        (prefix_before / PACK_CAP_CHARS).cast("bigint").alias("seq_id"),
    )
    return packed.groupBy("source", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("first_doc"),
    )


def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split contamination gate: verified near-duplicate pairs
    (MinHash-LSH candidates -> exact Jaccard >= threshold) whose two docs
    landed in DIFFERENT dataset splits -- i.e. eval examples leaking into
    train. The composition every training-data pipeline must run before
    shipping a split.

    Scale shape: the pair list is the (small) output of the LSH+verify
    pipeline; the two split-assignment joins shuffle pairs against an
    md5-slot projection of the corpus keyed by doc_id (AQE broadcasts the
    pair side when it fits). Output is a <=9-row summary, never the pairs."""
    from pgsf_spark.analytics.dedup import q_lsh_jaccard_verified
    from pgsf_spark.analytics.oracle_utils import davg

    d = load_table(spark, sf_dir, "documents")
    splits = assign_split(d.select("doc_id"), "doc_id").select("doc_id", "split")
    pairs = q_lsh_jaccard_verified(spark, sf_dir)
    sa = splits.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a"))
    sb = splits.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .groupBy("split_a", "split_b")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            davg(F.col("jaccard"), ndigits=4).alias("avg_jaccard"),
            F.max(F.when(F.col("split_a") != F.col("split_b"), 1).otherwise(0)).alias("is_leak"),
        )
    )


# --- feature hashing (the hashing trick) ------------------------------------

FH_DIM = 64  # hashed feature-space dimensionality


def q_feature_hash_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing for categorical ML features (Weinberger et al. 2009):
    each (column, value) pair maps to bucket = h(col:value) mod FH_DIM with
    a +/-1 sign from an independent hash bit, so feature vectors need NO
    vocabulary pass, no fit step, and no dictionary broadcast -- the
    property that makes the hashing trick the default featurizer at
    100 TB (stateless, single projection, collision noise cancels in
    expectation via the sign). Output is the corpus-level aggregate
    feature vector (nonzero dims only) -- the X^T 1 moment a downstream
    trainer or drift monitor consumes.

    Plan: explode 2 rows per doc -> groupBy over at most FH_DIM keys with
    map-side partials. md5-derived buckets and signs are hash-exact in the
    oracle."""
    d = load_table(spark, sf_dir, "documents")

    def feat(col_name: str):
        tagged = F.concat(F.lit(col_name + ":"), F.col(col_name).cast("string"))
        h = F.conv(F.substring(F.md5(tagged), 1, 8), 16, 10).cast("long")
        sign_bit = F.conv(F.substring(F.md5(F.concat(F.lit("sg:"), tagged)), 1, 8), 16, 10).cast("long")
        return F.struct(
            (h % FH_DIM).cast("int").alias("dim"),
            F.when(sign_bit % 2 == 0, 1).otherwise(-1).alias("sign"),
        )

    feats = d.select(F.explode(F.array(feat("source"), feat("lang"))).alias("f"))
    return (
        feats.select("f.dim", "f.sign")
        .groupBy("dim")
        .agg(
            F.sum("sign").cast("bigint").alias("total"),
            F.count(F.lit(1)).cast("bigint").alias("n_hits"),
        )
        .orderBy("dim")
    )


N_SHARDS = 64  # training-export shard count


def q_training_shard_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training export: every document
    gets a seed-keyed shuffle hash, a shard = hash mod N_SHARDS, and an
    exact position within its shard -- the (shard, position) addressing a
    dataloader needs for reproducible epoch order and resumable reads.

    Spark-first shape: the ONLY shuffle is the hash partition implied by
    the per-shard window (64 independent partitions, each sorted locally)
    -- there is no global total-order window, which would serialize on one
    partition; a global position, when needed, is shard-offset + position
    with offsets from the tiny per-shard count table. Retry/rerun-stable:
    md5 of (seed, doc_id) has no rand() anywhere. Output bounded to 4
    shards to keep the gate row count small; every shard computes the
    same way."""
    d = load_table(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5(F.concat(F.lit("shuf7:"), F.col("doc_id").cast("string"))), 1, 12), 16, 10).cast("long")
    sharded = d.select("doc_id", "source", h.alias("shuffle_hash")).withColumn(
        "shard", (F.col("shuffle_hash") % N_SHARDS).cast("int")
    )
    w = Window.partitionBy("shard").orderBy("shuffle_hash", "doc_id")
    return (
        sharded.filter(F.col("shard") < 4)
        .withColumn("position", F.row_number().over(w) - 1)
        .select("shard", "position", "doc_id", "source")
    )


def q_cross_source_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Provenance-contamination matrix: verified near-duplicate pairs
    grouped by their (canonically ordered) SOURCE pair -- the
    q_split_leakage composition pointed at provenance instead of splits
    (a benchmark source near-duplicating a crawl source is how eval
    contamination usually enters a corpus; within-source duplication is
    ordinary redundancy). Emits per source-pair counts, average verified
    Jaccard, and the cross-source flag.

    Same scale shape as q_split_leakage: the pair list is the (small)
    LSH+verify output; two keyed joins attach sources; the output is a
    source-pair-bounded summary, never the pairs."""
    from pgsf_spark.analytics.dedup import q_lsh_jaccard_verified
    from pgsf_spark.analytics.oracle_utils import davg

    d = load_table(spark, sf_dir, "documents")
    src = d.select("doc_id", "source")
    pairs = q_lsh_jaccard_verified(spark, sf_dir)
    sa = src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("src_raw_a"))
    sb = src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("src_raw_b"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            F.least("src_raw_a", "src_raw_b").alias("src_a"),
            F.greatest("src_raw_a", "src_raw_b").alias("src_b"),
            "jaccard",
        )
        .groupBy("src_a", "src_b")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            davg(F.col("jaccard"), ndigits=4).alias("avg_jaccard"),
        )
        .select(
            "src_a",
            "src_b",
            "n_pairs",
            "avg_jaccard",
            (F.col("src_a") != F.col("src_b")).alias("cross_source"),
        )
        .orderBy(F.col("n_pairs").desc(), "src_a", "src_b")
    )


def q_dedup_source_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mix shift induced by fuzzy dedup -- the survivorship-bias
    audit every curation pipeline owes its consumers: dedup keeps each
    cluster's best member, and if near-duplicates concentrate in some
    sources (they do: mirrors, boilerplate farms), the AFTER mix is not
    the BEFORE mix and downstream "source-balanced" sampling silently
    isn't.  Emits per source the doc counts and corpus shares before and
    after canonical selection, plus the share shift.

    Survivors = singletons (no candidate pair) + each cluster's (longest,
    then smallest-id) member -- the q_dedup_canonical keep rule.  The
    cluster rank window partitions by cluster; singletons bypass it
    entirely (no NULL-cluster mega-partition).

    Plan: the LSH+CC cluster map (bounded equi-joins), one rank window
    over clustered docs only, two source rollups."""
    from pyspark.sql.window import Window

    from pgsf_spark.analytics.dedup import q_dedup_clusters

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    labels = q_dedup_clusters(spark, sf_dir).select("doc_id", "cluster")
    clustered = d.join(labels, "doc_id")
    singles = d.join(labels.select("doc_id"), "doc_id", "left_anti")
    w = Window.partitionBy("cluster").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    keeps = (
        clustered.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id", "source")
    )
    surv = singles.select("doc_id", "source").unionByName(keeps)
    before = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_before"))
    after = surv.groupBy("source").agg(F.count(F.lit(1)).alias("n_after"))
    tb = before.agg(F.sum("n_before").alias("nb"))
    ta = after.agg(F.sum("n_after").alias("na"))
    j = (
        before.join(after, "source", "left")
        .crossJoin(F.broadcast(tb))
        .crossJoin(F.broadcast(ta))
        .select(
            "source",
            F.col("n_before").cast("bigint").alias("n_before"),
            F.coalesce(F.col("n_after"), F.lit(0)).cast("bigint").alias("n_after"),
            "nb",
            "na",
        )
    )
    sb = F.col("n_before").cast("double") / F.col("nb").cast("double")
    sa = F.col("n_after").cast("double") / F.col("na").cast("double")
    return j.select(
        "source",
        "n_before",
        "n_after",
        F.round(sb, 6).alias("share_before"),
        F.round(sa, 6).alias("share_after"),
        F.round(sa - sb, 6).alias("share_shift"),
    ).orderBy("source")


def q_split_balance_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample KS distance between the TRAIN split's document
    lengths and the held-out (val+test) lengths -- the split-fairness
    gate: hash splitting guarantees size proportions but nothing about
    the length DISTRIBUTION, and a length-skewed eval set quietly
    miscalibrates every per-token metric.  D = max |F_train - F_rest|
    computed exactly in integers over the pooled distinct values (the
    q_ks_test_gate device pointed at the split assignment).

    Plan: one groupBy on the value key, one cumulative window over
    distinct lengths, one scalar aggregate."""
    from pyspark.sql.window import Window

    from pgsf_spark.analytics.sampling import assign_split

    d = assign_split(load_table(spark, sf_dir, "documents"), "doc_id")
    vals = d.select(
        F.col("n_chars").alias("v"), (F.col("split") == "train").alias("s1")
    )
    per_v = vals.groupBy("v").agg(
        F.sum(F.col("s1").cast("long")).alias("d1"),
        F.sum((~F.col("s1")).cast("long")).alias("d2"),
    )
    # pooled distinct-length grid is data-derived: range-partitioned
    # running counts (operators.ranking), not a single-partition window
    from pgsf_spark.operators.ranking import global_cumsum

    cum = global_cumsum(
        per_v,
        [F.col("v").asc()],
        {"c1": (F.col("d1"), True), "c2": (F.col("d2"), True)},
    ).select("v", "c1", "c2")
    n = vals.agg(
        F.sum(F.col("s1").cast("long")).alias("n1"),
        F.sum((~F.col("s1")).cast("long")).alias("n2"),
    )
    scored = cum.crossJoin(n).select(
        F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1")).alias("num"),
        "n1",
        "n2",
    )
    return (
        scored.groupBy("n1", "n2")
        .agg(F.max("num").alias("max_num"))
        .select(
            F.col("n1").cast("bigint").alias("n_train"),
            F.col("n2").cast("bigint").alias("n_rest"),
            F.round(F.col("max_num") / (F.col("n1") * F.col("n2")), 6).alias("ks_d"),
        )
    )


def q_dedup_loss_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-aware training weights: every document in a near-dup
    cluster of size s carries weight 1/s (singletons 1), so a cluster
    contributes ONE document's worth of gradient no matter how many
    copies survived collection -- the keep-everything alternative to
    dropping duplicates that preserves within-cluster variation without
    overweighting repeated content.  Emits per source the raw count, the
    effective (weighted) count, and their ratio -- the deflation factor a
    loss-weighted training run should expect per provenance.

    Exactness: cluster sizes are integers; each weight rounds 1/s to 9
    and decimal-sums per source, so effective counts are
    order-independent.

    Plan: the LSH+CC cluster map, one cluster-size rollup joined back,
    one source rollup; singletons bypass the cluster join entirely."""
    from pgsf_spark.analytics.dedup import q_dedup_clusters

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    labels = q_dedup_clusters(spark, sf_dir).select("doc_id", "cluster")
    sizes = labels.groupBy("cluster").agg(F.count(F.lit(1)).alias("s"))
    clustered = (
        d.join(labels, "doc_id")
        .join(sizes, "cluster")
        .select(
            "source",
            F.round(F.lit(1.0) / F.col("s").cast("double"), 9)
            .cast("decimal(18,9)")
            .alias("w"),
        )
    )
    singles = d.join(labels.select("doc_id"), "doc_id", "left_anti").select(
        "source", F.lit(1.0).cast("decimal(18,9)").alias("w")
    )
    allw = clustered.unionByName(singles)
    return (
        allw.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.sum("w").cast("double"), 6).alias("effective_docs"),
        )
        .select(
            "source",
            "n_docs",
            "effective_docs",
            F.round(F.col("effective_docs") / F.col("n_docs").cast("double"), 6).alias(
                "effective_ratio"
            ),
        )
        .orderBy("source")
    )


DPO_MARGIN = 100  # minimum chosen-rejected score gap (chars)


def q_dpo_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DPO/RLHF-style preference-pair mining -- the training-data op
    that turns a scored corpus into (chosen, rejected) pairs: per
    source (the 'prompt group' stand-in), pair the highest-scoring doc
    with the lowest-scoring one and keep pairs whose margin clears
    DPO_MARGIN (a weak-margin pair teaches a reward model nothing; the
    floor is the standard mining hygiene).

    Determinism: argmax/argmin are row_number windows over the total
    order (score desc/asc, doc_id) -- no sampling; the margin filter is
    integer.

    Plan: one source-keyed window shuffle; output is one row per
    surviving source."""
    d = load_table(spark, sf_dir, "documents")
    wmax = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    wmin = Window.partitionBy("source").orderBy(
        F.col("n_chars").asc(), F.col("doc_id")
    )
    ranked = d.select(
        "source",
        "doc_id",
        "n_chars",
        F.row_number().over(wmax).alias("rmax"),
        F.row_number().over(wmin).alias("rmin"),
    )
    chosen = ranked.filter(F.col("rmax") == 1).select(
        "source",
        F.col("doc_id").alias("chosen_doc"),
        F.col("n_chars").alias("chosen_chars"),
    )
    rejected = ranked.filter(F.col("rmin") == 1).select(
        "source",
        F.col("doc_id").alias("rejected_doc"),
        F.col("n_chars").alias("rejected_chars"),
    )
    return (
        chosen.join(rejected, "source")
        .withColumn(
            "margin", (F.col("chosen_chars") - F.col("rejected_chars")).cast("bigint")
        )
        .filter(F.col("margin") >= DPO_MARGIN)
        .select(
            "source",
            F.col("chosen_doc").cast("bigint").alias("chosen_doc"),
            F.col("rejected_doc").cast("bigint").alias("rejected_doc"),
            F.col("chosen_chars").cast("bigint").alias("chosen_chars"),
            F.col("rejected_chars").cast("bigint").alias("rejected_chars"),
            "margin",
        )
        .orderBy("source")
    )


SHARD_N1 = 8
SHARD_N2 = 9  # the resize under audit: add one shard
SHARD_VNODES = 4


def _ring_points(n_shards: int) -> list:
    """Deterministic md5 ring: (position * 64 + shard) combined literals,
    sorted. Positions are 32-bit md5 prefixes of 'ring:<shard>:<vnode>';
    packing shard into the low 6 bits keeps the in-engine lookup a single
    array_min(filter(...)) -- no 32-way CASE."""
    import hashlib

    pts = []
    for s in range(n_shards):
        for v in range(SHARD_VNODES):
            pos = int(
                hashlib.md5(f"ring:{s}:{v}".encode()).hexdigest()[:8], 16
            )
            pts.append(pos * 64 + s)
    return sorted(pts)


def q_shard_rebalance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-rebalance movement audit: how many documents MOVE when the
    cluster grows from SHARD_N1 to SHARD_N2 shards, under naive modulo
    sharding vs an md5 consistent-hash ring -- the infra decision every
    100 TB layout faces (modulo moves ~(N-1)/N of the corpus on every
    resize and invalidates all caches/bucketing; a consistent ring moves
    ~1/N): both assignments computed exactly for every doc, movement
    fractions reported side by side.

    Determinism: ring vnode positions are python md5 LITERALS (packed
    pos*64+shard so lookup is array_min(filter(ring, x >= h*64)) with a
    wrap to the ring minimum); doc hashes are the house md5-prefix
    device -- bit-identical on both faces.

    Plan: one documents scan, all lookup in-row against broadcast
    literal arrays, one 1-row aggregate."""
    d = load_table(spark, sf_dir, "documents")
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
    )

    def ring_shard(n):
        arr = F.array(*[F.lit(p) for p in _ring_points(n)])
        cand = F.array_min(F.filter(arr, lambda x: x >= h * 64))
        first = F.array_min(arr)
        return F.coalesce(cand, first) % 64

    assigned = d.select(
        (F.col("doc_id") % SHARD_N1 != F.col("doc_id") % SHARD_N2)
        .cast("int")
        .alias("mod_moved"),
        (ring_shard(SHARD_N1) != ring_shard(SHARD_N2)).cast("int").alias("ring_moved"),
    )
    agg = assigned.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("mod_moved").alias("mod_moved"),
        F.sum("ring_moved").alias("ring_moved"),
    )
    nd = F.col("n_docs").cast("double")
    return agg.select(
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("mod_moved").cast("bigint").alias("mod_moved"),
        F.col("ring_moved").cast("bigint").alias("ring_moved"),
        F.round(F.col("mod_moved").cast("double") / nd, 6).alias("mod_moved_frac"),
        F.round(F.col("ring_moved").cast("double") / nd, 6).alias("ring_moved_frac"),
    )


CTX_LENGTHS = [512, 1024, 2048]


def q_context_fill_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window budget panel -- the packing planner's first
    question (at window L, how many tokens survive truncation, what
    share of docs get cut, and how full do greedy packs run): for each
    literal L, kept = sum min(len, L), truncated share, and the
    ceil-packed fill ratio kept / (ceil(kept / L) * L).

    Exactness: token lengths are in-row integers; min/sum/ceil are
    integer ops (the ceil via (kept + L - 1) div L); the two ratios are
    single rounded divisions.

    Plan: one documents scan cross the 3-row literal spine (map-side
    combine; no explode of content)."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).cast("long")
    spine = spark.createDataFrame([(l,) for l in CTX_LENGTHS], ["ctx_len"])
    j = d.select(n_tok.alias("n_tok")).crossJoin(F.broadcast(spine))
    per = j.groupBy("ctx_len").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.sum(F.least(F.col("n_tok"), F.col("ctx_len"))).alias("kept_tokens"),
        F.sum((F.col("n_tok") > F.col("ctx_len")).cast("long")).alias("n_truncated"),
    )
    packs = (F.col("kept_tokens") + F.col("ctx_len") - 1) / F.col("ctx_len")
    n_packs = F.floor(packs).cast("long")
    return per.select(
        F.col("ctx_len").cast("bigint").alias("ctx_len"),
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("total_tokens").cast("bigint").alias("total_tokens"),
        F.col("kept_tokens").cast("bigint").alias("kept_tokens"),
        F.round(
            F.col("kept_tokens").cast("double") / F.col("total_tokens").cast("double"),
            6,
        ).alias("kept_share"),
        F.round(
            F.col("n_truncated").cast("double") / F.col("n_docs").cast("double"), 6
        ).alias("truncated_share"),
        n_packs.alias("n_packs"),
        F.round(
            F.col("kept_tokens").cast("double")
            / (n_packs * F.col("ctx_len")).cast("double"),
            6,
        ).alias("pack_fill_ratio"),
    ).orderBy("ctx_len")
