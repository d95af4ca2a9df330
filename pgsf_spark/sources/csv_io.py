"""pgsf CSV dialect I/O (S9, K2 semantics).

The reference's landed-CSV dialect (upload_table.py:17-26;
query_poll_table.py:21-50; csv_to_postgres.py:24-45):
  - header row of quoted field names; `,` delimiter, `\\n` terminator
  - `"`-quoted values, embedded quotes doubled (`""`)
  - empty field == NULL for nillable columns (PG COPY FORCE_NULL)
  - booleans as t/f; datetimes as 2019-11-18T15:28:14.000Z
  - NUL bytes stripped from values

Spark's csv reader/writer covers the quoting dialect natively; the t/f and
datetime renderings are applied as column expressions (vectorized, JVM-side)
rather than the reference's per-row Python loop (query_poll_table.py:88-101)
-- see SURVEY §2.9.

Known deviation: the reference quotes every string value unconditionally
(_csv_quote); Spark quotes minimally (only when the value needs it). Under
PG COPY with FORCE_NULL the two encodings parse identically, so round-trip
semantics are preserved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, StructType, TimestampType

from pgsf_spark.functions import bool_to_pg, datetime_to_pg, strip_nul

PGSF_CSV_OPTIONS = {
    "header": "true",
    "quote": '"',
    "escape": '"',  # doubled-quote escaping
    "multiLine": "true",  # values may contain newlines
    "nullValue": "",  # empty field <-> NULL (FORCE_NULL)
    "emptyValue": "",
}


def write_pgsf_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write a DataFrame in the pgsf dialect (one part-file per partition --
    exactly the reference's file-per-batch model, download.py:94-105)."""
    cols = []
    for f in df.schema.fields:
        c = F.col(f.name)
        if isinstance(f.dataType, BooleanType):
            c = bool_to_pg(c)
        elif isinstance(f.dataType, TimestampType):
            c = datetime_to_pg(c)
        elif f.dataType.typeName() == "string":
            c = strip_nul(c)
        cols.append(c.alias(f.name))
    df.select(*cols).write.mode(mode).options(**PGSF_CSV_OPTIONS).csv(path)


def read_pgsf_csv(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """Read pgsf-dialect CSV back with the target schema.

    t/f booleans and `...000Z` datetimes are parsed back into typed columns
    (the reverse of the K2 load: COPY just trusts PG's input parsers;
    here we cast explicitly).
    """
    rdr = spark.read.options(**PGSF_CSV_OPTIONS)
    raw = rdr.csv(path)
    if schema is None:
        return raw
    cols = []
    for f in schema.fields:
        c = F.col(f.name)
        if isinstance(f.dataType, BooleanType):
            c = F.when(c == "t", F.lit(True)).when(c == "f", F.lit(False)).otherwise(F.lit(None).cast("boolean"))
        elif isinstance(f.dataType, TimestampType):
            c = F.to_timestamp(c, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
        else:
            c = c.cast(f.dataType)
        cols.append(c.alias(f.name))
    return raw.select(*cols)
