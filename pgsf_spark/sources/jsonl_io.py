"""JSONL (newline-delimited JSON) source/sink.

The reference moves data exclusively as its CSV dialect
(/root/reference/download.py, csvutils); a training-data engine also needs
JSONL, the lingua franca of corpus interchange (one JSON object per line,
splittable, append-friendly). Spark's native json reader/writer does the
heavy lifting JVM-side -- escaping, unicode, nulls -- so there is no Python
in the path; these wrappers pin the conventions (overwrite semantics,
explicit schema on read -- never schema inference, which would scan the
data twice and can mis-type sparse columns at scale).

Scale notes: JSONL splits on line boundaries, so a 100 TB corpus read
parallelizes like CSV; gzip members are NOT splittable (one task per .gz
file) -- prefer zstd/bzip2 or many medium files when compressing. Schema
projection prunes parsed fields but the line must still be decoded: for
hot analytics land JSONL into parquet first (land_jsonl).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_jsonl(df: DataFrame, path: str, compression: str | None = None) -> None:
    """Write one JSON object per line; overwrite semantics (idempotent
    re-runs, matching the engine's exactly-once publish discipline)."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Read JSONL with an EXPLICIT schema. Malformed lines go to the
    permissive-mode null row rather than failing the scan; callers that
    need strictness can count nulls in a required column."""
    return spark.read.schema(schema).json(path)


def land_jsonl(
    spark: SparkSession, src_path: str, schema: StructType, dest_path: str
) -> None:
    """JSONL -> parquet landing (decode once, scan columnar forever)."""
    read_jsonl(spark, src_path, schema).write.mode("overwrite").parquet(dest_path)
