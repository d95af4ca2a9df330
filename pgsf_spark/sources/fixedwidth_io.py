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

NULL encoding: a NULL value is written as an all-space field and an
all-space (or empty) slice reads back as NULL. Consequences, documented as
the dialect contract: empty strings and all-space strings are not
representable (they roundtrip to NULL), trailing spaces of left-aligned
values and leading spaces of right-aligned values are not representable
(the alignment padding absorbs them). Only the alignment side is trimmed on
read, so leading spaces in left-aligned values survive the roundtrip.
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
    # overflow guard: a value longer than the field must fail loudly; NULL
    # gets the documented all-space encoding (without this, length(NULL) is
    # NULL so neither branch fires and concat() would NULL the whole line)
    return (
        F.when(s.isNull(), F.lit(" " * f.width))
        .when(F.length(s) > f.width, F.raise_error(
            F.concat(F.lit(f"fixed-width overflow in field '{f.name}': "), s)
        ))
        .otherwise(padded)
    )


def write_fixed_width(df: DataFrame, fields: list[FwField], path: str) -> None:
    line = F.concat(*[_rendered(f) for f in fields])
    df.select(line.alias("value")).write.mode("overwrite").text(path)


def read_fixed_width(spark: SparkSession, path: str, fields: list[FwField]) -> DataFrame:
    raw = spark.read.text(path)
    cols, start = [], 1
    for f in fields:
        sl = F.substring(F.col("value"), start, f.width)
        # trim only the alignment side so significant spaces on the other
        # side survive; an empty result is the NULL encoding
        trimmed = F.ltrim(sl) if f.align == "right" else F.rtrim(sl)
        cols.append(F.nullif(trimmed, F.lit("")).cast(f.dtype).alias(f.name))
        start += f.width
    return raw.select(*cols)
