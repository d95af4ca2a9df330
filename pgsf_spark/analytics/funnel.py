"""End-to-end curation funnel: the LLM-data pipeline stages COMPOSED.

Every stage of a pretraining-data curation pipeline exists in this repo
as an individually driver-proven operator (language gating, quality
heuristics, exact and near dedup, token accounting). What none of them
proves alone is the COMPOSITION -- that the stages chain with exact,
order-correct, loss-attributable semantics, which is the thing an
operator of a 100 TB pipeline actually runs. Two gates:

  - ``curation_funnel_gate`` -- the five-stage funnel (ingest with a
    deterministic duplicate wave -> language allowlist -> quality
    heuristics -> exact dedup keep-min -> prefix-fingerprint near-dedup
    keep-min) emitting one row per stage with surviving doc count,
    surviving token mass, and docs dropped AT that stage. The drop
    column makes loss ATTRIBUTABLE: the in-gate assert pins that stage
    drops exactly partition ingest-minus-final (no doc vanishes
    unaccounted -- the curation analogue of the quarantine ledger).
  - ``curation_funnel_incremental_gate`` -- funnel idempotence under
    incremental processing: day-1 docs (``doc_id % 3 != 0``) are
    funneled first, day-2 docs arrive, and the incremental path
    (per-row stages on the new batch only, then keep-min reconciliation
    of new candidates against the day-1 SURVIVOR fingerprint index --
    including the displacement case where a lower-id newcomer evicts a
    published survivor) must equal the full recompute EXACTLY. This is
    the property that lets a 100 TB corpus absorb a daily crawl without
    re-running the funnel from scratch; candidates are new-vs-index
    only, never all-pairs (the incremental_lsh_dedup economics at
    funnel grain).

All stage predicates are pure row/group algebra over the shared _NORM
text normalization, so the DuckDB oracle restates the entire funnel
from ``documents`` alone; no thresholds are tuned at runtime. Scale
notes: every stage is a codegen projection or a fingerprint-partitioned
window/groupBy (shuffle keyed on md5 fingerprints -- uniform, skew-free
by construction); the duplicate wave and keep-min reconciliation
broadcast nothing and collect nothing.

Reference parity: the reference has no curation pipeline (it is a sync
engine); this layer is the repo's LLM-training-data mandate
(SURVEY §2 extended inventory).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pgsf_spark.tables import load_table

DUP_MOD = 11  # doc_id % 11 == 0 docs are re-ingested as duplicates...
DUP_OFFSET = 1_000_000  # ...under doc_id + 1e6 (keep-min keeps the original)
FUNNEL_LANGS = ("en", "de", "fr")
MIN_TOKENS = 20
MWL_LO, MWL_HI = 2.5, 12.0  # mean word length band
SHORT_RATIO_MAX = 0.8  # max share of tokens with <= 3 chars
PREFIX_K = 120  # prefix-fingerprint near-dup: first K normalized chars
INCR_MOD = 3  # doc_id % 3 != 0 is the day-1 batch

STAGES = ("ingest", "lang_filter", "quality_filter", "exact_dedup", "prefix_dedup")


def _norm_col() -> Column:
    # the registry-wide _NORM fragment (spec.py), DataFrame form
    return F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))


def _ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang", "source")
    dups = docs.filter(F.col("doc_id") % DUP_MOD == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(DUP_OFFSET)
    )
    return docs.unionByName(dups)


def _featurize(df: DataFrame) -> DataFrame:
    """Stage features as ONE codegen projection: normalized text, token
    count, mean word length, short-token ratio, both fingerprints."""
    toks = F.split(F.col("norm"), " ")
    return (
        df.withColumn("norm", _norm_col())
        .withColumn("n_tok", F.size(toks))
        .withColumn(
            "mwl",
            F.length(F.regexp_replace(F.col("norm"), " ", "")) / F.col("n_tok"),
        )
        .withColumn(
            "short_ratio",
            F.size(F.filter(toks, lambda x: F.length(x) <= F.lit(3)))
            / F.col("n_tok"),
        )
        .withColumn("fp", F.md5(F.col("norm")))
        .withColumn("pfp", F.md5(F.substring(F.col("norm"), 1, PREFIX_K)))
        .drop("text")
    )


def _lang_filter(df: DataFrame) -> DataFrame:
    return df.filter(F.col("lang").isin(*FUNNEL_LANGS))


def _quality_filter(df: DataFrame) -> DataFrame:
    return df.filter(
        (F.col("n_tok") >= MIN_TOKENS)
        & (F.col("mwl") >= MWL_LO)
        & (F.col("mwl") <= MWL_HI)
        & (F.col("short_ratio") <= SHORT_RATIO_MAX)
    )


def _keep_min(df: DataFrame, key: str) -> DataFrame:
    """Keep-min-doc_id per fingerprint group: the deterministic dedup
    winner rule every dedup face in this repo uses. Window partitioned
    by the (uniform, md5) fingerprint -- never global."""
    w = Window.partitionBy(key)
    return (
        df.withColumn("_keep", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("_keep"))
        .drop("_keep")
    )


def q_curation_funnel_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-stage curation funnel with per-stage attributable loss."""
    staged = [_featurize(_ingest(spark, sf_dir))]
    staged.append(_lang_filter(staged[-1]))
    staged.append(_quality_filter(staged[-1]))
    staged.append(_keep_min(staged[-1], "fp"))
    staged.append(_keep_min(staged[-1], "pfp"))
    per_stage = None
    for i, (name, df) in enumerate(zip(STAGES, staged)):
        agg = df.agg(
            F.lit(i).alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("sum_tokens"),
        ).select("stage_idx", "stage", "n_docs", "sum_tokens")
        per_stage = agg if per_stage is None else per_stage.unionByName(agg)
    w = Window.orderBy("stage_idx")  # 5 rows: bounded, never data-sized
    out = per_stage.withColumn(
        "n_dropped",
        F.coalesce(F.lag("n_docs").over(w) - F.col("n_docs"), F.lit(0)).cast(
            "bigint"
        ),
    ).orderBy("stage_idx")
    rows = out.collect()  # 5 rows -- bounded
    # loss attribution must PARTITION: ingest - final == sum of drops,
    # and the funnel is monotone (no stage can add documents)
    drops = sum(r["n_dropped"] for r in rows)
    if rows[0]["n_docs"] - rows[-1]["n_docs"] != drops:
        raise ValueError(f"funnel gate: unattributed loss: {rows}")
    if any(a["n_docs"] < b["n_docs"] for a, b in zip(rows, rows[1:])):
        raise ValueError(f"funnel gate: stage GREW the corpus: {rows}")
    res = spark.createDataFrame(
        rows, "stage_idx int, stage string, n_docs bigint, sum_tokens bigint, n_dropped bigint"
    ).orderBy("stage_idx")
    return res.localCheckpoint(eager=True)


def _funnel_survivors(df: DataFrame) -> DataFrame:
    return _keep_min(_keep_min(_quality_filter(_lang_filter(df)), "fp"), "pfp")


def q_curation_funnel_incremental_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental funnel == full recompute, including displacement.

    Day 1 funnels ``doc_id % 3 != 0`` and publishes its survivor set.
    Day 2's batch goes through the PER-ROW stages alone (cheap, new data
    only), then reconciles against day 1's survivor fingerprint index
    with the same keep-min rule -- a newcomer with a smaller doc_id
    EVICTS the published survivor of its group (the displacement case a
    naive append-only dedup gets wrong). The in-gate assert pins the
    incremental survivor set doc-for-doc equal to the full recompute;
    the output is the reconciled end state per source, restated by the
    oracle as the full-recompute funnel."""
    ingest = _featurize(_ingest(spark, sf_dir))
    day1 = ingest.filter(F.col("doc_id") % INCR_MOD != 0)
    day2 = ingest.filter(F.col("doc_id") % INCR_MOD == 0)

    published = _funnel_survivors(day1).localCheckpoint()  # day-1 state
    # incremental path: per-row stages on the NEW batch only, then
    # keep-min reconciliation over (published ∪ new candidates) -- two
    # fingerprint-partitioned windows over survivors + newcomers, never
    # a from-scratch rerun of day 1
    candidates = _quality_filter(_lang_filter(day2))
    incremental = _funnel_survivors(published.unionByName(candidates))

    full = _funnel_survivors(ingest)
    sym_diff = incremental.select("doc_id").exceptAll(
        full.select("doc_id")
    ).unionByName(full.select("doc_id").exceptAll(incremental.select("doc_id")))
    stray = sym_diff.limit(20).collect()  # bounded: empty on the happy path
    if stray:
        raise ValueError(
            f"incremental funnel diverged from full recompute: {sorted(r[0] for r in stray)}"
        )
    res = (
        incremental.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("sum_tokens"),
            F.min("doc_id").alias("min_doc"),
        )
        .orderBy("source")
    )
    return res.localCheckpoint(eager=True)
