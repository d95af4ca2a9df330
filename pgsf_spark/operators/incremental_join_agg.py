"""Incrementally-maintained JOIN-aggregate view (delta-join IVM).

ContinuousAggregate maintains a single-table rollup by recomputing touched
buckets. This operator maintains the other canonical materialized view --
a star JOIN-aggregate:

    V = SELECT g..., additive aggs  FROM fact JOIN dim ON k  GROUP BY g

using classical delta-join view maintenance: for an append-only fact delta,
dV = aggregate(dFact JOIN dim), and the new view is the ADDITIVE merge of V
and dV (sum-of-sums, count-as-sum). Cost per refresh is O(new fact rows +
|view|), never O(fact history) -- at 100 TB the full join-aggregate runs
once at bootstrap and every later refresh touches only the delta.

Exactly-once without a second transaction: the view's watermark lives IN
the published version's _MANIFEST.json, so data + watermark flip together
atomically (the offsets-in-the-sink pattern; same idea as Delta's
txnAppId/txnVersion dedup). A crash after publish re-reads the new
watermark and re-applies nothing; a crash before publish left the old
version intact. Re-running refresh() with no new rows is a no-op.

Additivity contract: aggregate expressions must form a commutative monoid
on the grouped rows (SUM over DECIMAL, COUNT as SUM of partial counts,
MIN/MAX). DECIMAL accumulation keeps the additive merge bit-equal to a
full recompute at any partitioning (oracle_utils contract). Non-additive
aggregates (AVG, DISTINCT) must be stored as their additive parts
(sum+count / a sketch).

Scope, documented: the dimension side is treated as static between
bootstraps -- a dim change requires bootstrap() (full recompute), the
standard restriction for join views maintained on one input. Fact deltas
are append-only (the reference's CDC modstamp semantics, C1/C3); updates
or deletes in the fact stream need retraction rows (negative partials),
which the additive merge supports but this engine's sources do not emit.

Reference parity: the watermark-filter + staged-publish cycle is the same
C1/C2/C3 machinery as query_poll_table.py:61-104/175-198, applied to a
derived view instead of a replica table.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgsf_spark.operators.table_store import TableStore

_WM_KEY = "ivm_watermark"
_WM_FMT = "%Y-%m-%d %H:%M:%S.%f"


class IncrementalJoinAggregate:
    def __init__(
        self,
        spark: SparkSession,
        store: TableStore,
        name: str,
        fact_fn,  # () -> DataFrame of the (growing) fact table
        dim_fn,  # () -> DataFrame of the dimension (static between bootstraps)
        on: str,  # equi-join key column name (present on both sides)
        ts_col: str,  # ingestion-monotonic modstamp on the fact side
        group_cols: tuple[str, ...],
        aggs: dict[str, str],  # out_col -> ADDITIVE SQL agg expression
    ):
        self.spark = spark
        self.store = store
        self.name = name
        self.fact_fn = fact_fn
        self.dim_fn = dim_fn
        self.on = on
        self.ts_col = ts_col
        self.group_cols = list(group_cols)
        self.aggs = dict(aggs)

    # -- plan pieces ---------------------------------------------------------

    def _delta_view(self, fact: DataFrame) -> DataFrame:
        """aggregate(fact JOIN dim): the dim side is broadcast -- the fact
        delta never shuffles for the join, only for the keyed aggregate."""
        j = fact.join(F.broadcast(self.dim_fn()), on=self.on)
        return j.groupBy(*self.group_cols).agg(
            *[F.expr(expr).alias(col) for col, expr in self.aggs.items()]
        )

    def _additive_merge(self, current: DataFrame, delta: DataFrame) -> DataFrame:
        """V' = V (+) dV: union the two view-sized relations and re-sum.
        Both inputs are |view|-sized, so this shuffle is bounded by the
        group-key cardinality, not the fact table."""
        merged = current.unionByName(delta)
        return merged.groupBy(*self.group_cols).agg(
            *[F.sum(col).alias(col) for col in self.aggs]
        )

    # -- lifecycle -----------------------------------------------------------

    def bootstrap(self) -> dict:
        """Full compute of the view from the current fact table; publishes
        the max fact modstamp as the watermark in the same version flip."""
        fact = self.fact_fn()
        view = self._delta_view(fact)
        wm = fact.agg(F.max(self.ts_col).alias("m")).first()["m"]
        self.store.write(
            view,
            self.name,
            manifest={"op": "ivm_bootstrap", _WM_KEY: wm.strftime(_WM_FMT) if wm else None},
        )
        return {"name": self.name, "watermark": str(wm)}

    def watermark(self) -> datetime | None:
        raw = self.store.manifest(self.name).get(_WM_KEY)
        return datetime.strptime(raw, _WM_FMT) if raw else None

    def refresh(self) -> dict:
        """Delta maintenance step: read fact rows past the manifest
        watermark, join+aggregate only those, merge additively, publish
        data + new watermark in one atomic flip."""
        wm = self.watermark()
        fact = self.fact_fn()
        delta = fact.filter(F.col(self.ts_col) > F.lit(wm)) if wm is not None else fact
        new_wm = delta.agg(F.max(self.ts_col).alias("m")).first()["m"]
        if new_wm is None:  # no rows past the watermark: exact no-op
            return {"name": self.name, "delta_groups": 0, "watermark": str(wm)}
        dv = self._delta_view(delta)
        merged = self._additive_merge(self.store.read(self.name), dv)
        self.store.write(
            merged,
            self.name,
            manifest={"op": "ivm_refresh", _WM_KEY: new_wm.strftime(_WM_FMT)},
        )
        return {"name": self.name, "delta_groups": dv.count(), "watermark": str(new_wm)}

    def read(self) -> DataFrame:
        return self.store.read(self.name)
