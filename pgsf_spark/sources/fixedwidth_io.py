"""Fixed-width text source/sink (the legacy flat-file format mainframe and
EDI feeds still emit; completes the text-dialect family next to CSV and
JSONL -- reference parity: the reference's CSV layer, csv_to_postgres.py,
re-expressed for position-delimited records).

Write: each field is lpad (right-aligned, numerics) or rpad (left-aligned,
text) to its declared width and the record is one concat -- a pure
projection into ``spark.write.text``, fully parallel. Read: substring
slices at the declared offsets + trim + cast -- also a pure projection, so
both directions stay inside whole-stage codegen with zero Python.

Values wider than their field raise on write (``lpad`` would silently
truncate -- corruption, not serialization), enforced with a guard column.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FwField:
    name: str
    width: int
    dtype: str = "string"  # spark cast target on read
    align: str = "left"  # 'left' (rpad) | 'right' (lpad)


def _rendered(f: FwField):
    s = F.col(f.name).cast("string")
    padded = F.lpad(s, f.width, " ") if f.align == "right" else F.rpad(s, f.width, " ")
    # overflow guard: a value longer than the field must fail loudly
    return F.when(F.length(s) > f.width, F.raise_error(
        F.concat(F.lit(f"fixed-width overflow in field '{f.name}': "), s)
    )).otherwise(padded)


def write_fixed_width(df: DataFrame, fields: list[FwField], path: str) -> None:
    line = F.concat(*[_rendered(f) for f in fields])
    df.select(line.alias("value")).write.mode("overwrite").text(path)


def read_fixed_width(spark: SparkSession, path: str, fields: list[FwField]) -> DataFrame:
    raw = spark.read.text(path)
    cols, start = [], 1
    for f in fields:
        sl = F.substring(F.col("value"), start, f.width)
        cols.append(F.trim(sl).cast(f.dtype).alias(f.name))
        start += f.width
    return raw.select(*cols)
