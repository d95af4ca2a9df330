"""Geospatial shelf: grid-bucketed spatial joins without a GIS library.

No table in the corpus carries coordinates, so the shelf derives a
DETERMINISTIC synthetic (lat, lon) per customer from md5 of the key --
exact decimal rationals, identical in the DuckDB oracle -- and then
demonstrates the two patterns a 100 TB spatial workload actually needs:

  * nearest-neighbor via GRID-CELL bucketing + 3x3 neighborhood
    expansion (the bucket-expansion device of operators/rangejoin.py in
    two dimensions): candidates come from an equi-join on cell id, never
    an all-pairs cross;
  * density rollups keyed by cell (one shuffle, mergeable).

Distance is the equirectangular approximation dist^2 = dlat^2 +
(cos(mid_lat) * dlon)^2 in degree units -- ONE libm call (cos), rounded
to 9 before use (the house ln-portability device), every other op a
fixed IEEE chain, so results are hash-exact cross-engine.  At city-scale
extents the approximation error vs haversine is negligible for ranking;
swap in haversine (with per-call rounding) if absolute meters matter.

Reference parity: beyond-reference surface (the reference has no
geospatial operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgsf_spark.tables import load_table

GEO_SEED = "geo7"
RAD_PER_DEG = 0.017453292519943295  # pi/180 as a shared literal
CELL_DEG = 10  # grid cell size (degrees); 3x3 expansion bounds the search
GEO_PROBE_TARGET = 20  # absolute-size probe panel (adaptive md5 slots)


def _coord(col, axis: str, span: int, offset: int):
    """Deterministic coordinate in [-offset, span - offset) with 3 decimal
    places: md5 -> 0..span*1000-1 -> degrees.  Exact rational, identical
    in SQL."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{GEO_SEED}:{axis}:"), col.cast("string"))), 1, 12
        ),
        16,
        10,
    ).cast("long")
    return (F.pmod(h, F.lit(span * 1000)).cast("double") / 1000.0) - float(offset)


def customer_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer key -> synthetic (lat, lon) + integer grid cell."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    pts = c.select(
        F.col("c_custkey").alias("key"),
        _coord(F.col("c_custkey"), "lat", 180, 90).alias("lat"),
        _coord(F.col("c_custkey"), "lon", 360, 180).alias("lon"),
    )
    return pts.select(
        "key",
        "lat",
        "lon",
        F.floor((F.col("lat") + 90) / CELL_DEG).cast("int").alias("cy"),
        F.floor((F.col("lon") + 180) / CELL_DEG).cast("int").alias("cx"),
    )


def q_geo_nearest_neighbor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest neighbor for an absolute-size probe panel via grid-cell
    bucketing: each probe searches only the 3x3 neighborhood of its
    CELL_DEG-degree cell (candidates from an equi-join on cell id -- the
    2-D bucket-expansion device; never probe x corpus).  A probe whose
    neighborhood holds no other point reports found = false -- the
    documented miss mode of bounded spatial search (widen CELL_DEG or
    fall back to a coarser ring in production).

    Determinism: coordinates are exact md5 rationals; the distance is
    equirectangular with the single cos() rounded to 9; the argmin is
    (min dist, min key) via one keyed aggregate -- no data-sized window.

    Plan: one projection scan builds points, the probe panel is a
    broadcast, candidates come from a 9-cell equi-join, one keyed
    argmin."""
    from pgsf_spark.analytics.sampling import adaptive_slots, md5_slot

    pts = customer_points(spark, sf_dir)
    slots = adaptive_slots(pts.count(), GEO_PROBE_TARGET)
    probes = pts.filter(md5_slot(F.col("key"), f"{GEO_SEED}:probe") < slots).select(
        F.col("key").alias("pkey"),
        F.col("lat").alias("plat"),
        F.col("lon").alias("plon"),
        F.col("cy").alias("pcy"),
        F.col("cx").alias("pcx"),
    )
    # 3x3 neighborhood: explode the probe into its 9 candidate cells
    cells = probes.select(
        "*",
        F.explode(F.array(*[F.lit(d) for d in (-1, 0, 1)])).alias("dy"),
    ).select(
        "*", F.explode(F.array(*[F.lit(d) for d in (-1, 0, 1)])).alias("dx")
    ).select(
        "pkey",
        "plat",
        "plon",
        (F.col("pcy") + F.col("dy")).alias("cy"),
        (F.col("pcx") + F.col("dx")).alias("cx"),
    )
    cand = cells.join(pts, ["cy", "cx"]).filter(F.col("key") != F.col("pkey"))
    # explicit literal degree->radian factor: engines disagree by an ulp
    # on radians() op ordering; a shared literal multiply cannot
    coslat = F.round(
        F.cos((F.col("plat") + F.col("lat")) / 2.0 * F.lit(RAD_PER_DEG)), 9
    )
    dlat = F.col("plat") - F.col("lat")
    dlon = F.col("plon") - F.col("lon")
    d2 = F.round(dlat * dlat + (coslat * dlon) * (coslat * dlon), 9)
    scored = cand.select("pkey", "key", d2.alias("d2"))
    mn = scored.groupBy("pkey").agg(F.min("d2").alias("md"))
    nn = (
        scored.join(F.broadcast(mn), "pkey")
        .filter(F.col("d2") == F.col("md"))
        .groupBy("pkey")
        .agg(
            F.min("key").alias("nn_key"),
            F.first("md").alias("d2"),
            F.count(F.lit(1)).alias("n_tied"),
        )
    )
    ncand = scored.groupBy("pkey").agg(F.count(F.lit(1)).alias("n_candidates"))
    return (
        probes.select("pkey")
        .join(nn, "pkey", "left")
        .join(ncand, "pkey", "left")
        .select(
            F.col("pkey").alias("probe_key"),
            "nn_key",
            F.round(F.sqrt(F.col("d2")), 6).alias("dist_deg"),
            F.coalesce("n_candidates", F.lit(0)).cast("bigint").alias("n_candidates"),
            F.col("nn_key").isNotNull().alias("found"),
        )
        .orderBy("probe_key")
    )


GEO_TOP_CELLS = 10


def q_geo_density_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-GEO_TOP_CELLS densest grid cells with their point counts and
    per-cell centroid -- the density rollup (hotspot map, partition-size
    planner for spatial sharding) that shares the nearest-neighbor
    shelf's cell key, so the two plans co-partition for free.

    One cell-keyed shuffle; centroids are exact-decimal coordinate means
    cast to double once."""
    pts = customer_points(spark, sf_dir)
    dec = "decimal(18,6)"
    return (
        pts.groupBy("cy", "cx")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            F.round(
                F.sum(F.col("lat").cast(dec)).cast("double") / F.count(F.lit(1)), 6
            ).alias("centroid_lat"),
            F.round(
                F.sum(F.col("lon").cast(dec)).cast("double") / F.count(F.lit(1)), 6
            ).alias("centroid_lon"),
        )
        .orderBy(F.col("n_points").desc(), "cy", "cx")
        .limit(GEO_TOP_CELLS)
    )
