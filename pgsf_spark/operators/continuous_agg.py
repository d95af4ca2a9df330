"""Continuous aggregate: an incrementally-maintained time-bucket rollup
(the hypertable/materialized-view pattern, built on the engine's watermark
machinery).

A rollup table holds one row per (bucket, group...); refresh() reads only
events with ts > watermark, recomputes JUST the buckets those events touch,
and publishes old-rows-for-untouched-buckets + recomputed-buckets through
the atomic TableStore flip. Cost per refresh is O(new events + touched
buckets), not O(history) -- the property that makes hourly rollups over
years of events viable at 100 TB.

Late-data contract (ADVICE r1): ``ts_col`` must be an INGESTION-MONOTONIC
modstamp (the reference's SystemModstamp CDC semantics), not an arbitrary
event time. Touched buckets are detected from rows with ts > watermark; an
event that *arrives* late but carries ts <= watermark is invisible to that
detection and its bucket would silently diverge until a sibling event lands
in the same bucket. With a modstamp, arrival order and ts order agree, so a
"late" row always has ts > watermark, its (event-time-derived) bucket is
marked touched, and the full-range recompute of that bucket is exact. For
sources that can rewrite history without touching the modstamp, drive
refresh() from an arrival-side signal instead (e.g. TableStore
table_changes between versions).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgsf_spark.operators.table_store import TableStore
from pgsf_spark.sync.state import SyncState


class ContinuousAggregate:
    def __init__(
        self,
        spark: SparkSession,
        store: TableStore,
        state: SyncState,
        name: str,
        source_fn,  # () -> DataFrame of raw events
        ts_col: str,
        bucket: str = "hour",
        group_cols: tuple[str, ...] = (),
        aggs: dict[str, str] | None = None,  # out_col -> SQL agg expression
    ):
        self.spark = spark
        self.store = store
        self.state = state
        self.name = name
        self.source_fn = source_fn
        self.ts_col = ts_col
        self.bucket = bucket
        self.group_cols = list(group_cols)
        self.aggs = aggs or {"n": "count(1)"}

    def _bucketed(self, df: DataFrame) -> DataFrame:
        return df.withColumn("__bucket", F.date_trunc(self.bucket, F.col(self.ts_col)))

    def _aggregate(self, df: DataFrame) -> DataFrame:
        return (
            self._bucketed(df)
            .groupBy("__bucket", *self.group_cols)
            .agg(*[F.expr(expr).alias(name) for name, expr in self.aggs.items()])
            .withColumnRenamed("__bucket", "bucket")
        )

    def bootstrap(self, initial_watermark: datetime) -> int:
        """Full computation + watermark seed (the C6 first-load)."""
        rollup = self._aggregate(self.source_fn())
        self.store.write(rollup, self.name, manifest={"op": "ca_bootstrap"})
        self.state.insert(self.name, syncuntil=initial_watermark)
        return self.store.read(self.name).count()

    def refresh(self) -> dict:
        """Incremental refresh: recompute only buckets touched since the
        watermark. Claims the state row like any synced table."""
        row = self.state.claim(self.name)
        try:
            wm = row.syncuntil_dt()
            source = self.source_fn()
            new_events = source.filter(F.col(self.ts_col) > F.lit(wm))
            touched = (
                self._bucketed(new_events).select(F.col("__bucket").alias("bucket")).distinct()
            )
            # recompute touched buckets from the SOURCE (late data safe),
            # carry everything else over from the current rollup untouched
            recomputed = self._aggregate(
                self._bucketed(source)
                .join(F.broadcast(touched), F.col("__bucket") == F.col("bucket"), "left_semi")
                .drop("__bucket")
            )
            current = self.store.read(self.name)
            kept = current.join(F.broadcast(touched), on="bucket", how="left_anti")
            merged = kept.unionByName(recomputed)
            self.store.write(merged, self.name, manifest={"op": "ca_refresh"})
            new_wm = source.agg(F.max(self.ts_col).alias("m")).first()["m"] or wm
            n_touched = touched.count()
            self.state.release(self.name, syncuntil=new_wm)
            return {"name": self.name, "touched_buckets": n_touched, "watermark": str(new_wm)}
        except Exception:
            self.state.release(self.name, touch_refresh=False)
            raise

    def read(self) -> DataFrame:
        return self.store.read(self.name)
