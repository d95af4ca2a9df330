"""SOQL-subset translator: the ad-hoc query surface (S3/S4, §3.3).

The reference can generate/accept exactly these query shapes
(/root/reference/query_bulk.py:37-41, query.py:37-65):

  SELECT f1, f2, ... FROM Table [WHERE <cond>] [LIMIT n]
  SELECT COUNT() FROM Table [WHERE <cond>]

This module parses that subset and translates it to DataFrame operations
against the engine's replicas -- after replication, ad-hoc queries hit the
local copy, which is the entire point of the system. The WHERE condition is
passed through as a SQL boolean expression (the reference splices the raw
condition string into SOQL the same way, query_bulk.py:38-40).

include_deleted mirrors query.py's --include-deleted flag (queryAll):
without it, soft-deleted rows are hidden.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class SoqlError(ValueError):
    pass


_SOQL_RE = re.compile(
    r"^\s*SELECT\s+(?P<fields>.+?)\s+FROM\s+(?P<table>[A-Za-z_][\w.]*)"
    r"(?:\s+WHERE\s+(?P<where>.+?))?"
    r"(?:\s+LIMIT\s+(?P<limit>\d+))?\s*$",
    re.IGNORECASE | re.DOTALL,
)


@dataclass
class SoqlQuery:
    table: str
    fields: list[str]  # empty + is_count=True for COUNT()
    where: str | None
    limit: int | None
    is_count: bool

    @classmethod
    def parse(cls, soql: str) -> "SoqlQuery":
        m = _SOQL_RE.match(soql)
        if not m:
            raise SoqlError(f"unsupported SOQL shape: {soql!r}")
        raw_fields = m.group("fields").strip()
        is_count = bool(re.fullmatch(r"COUNT\s*\(\s*\)", raw_fields, re.IGNORECASE))
        fields: list[str] = []
        if not is_count:
            fields = [f.strip() for f in raw_fields.split(",")]
            bad = [f for f in fields if not re.fullmatch(r"[A-Za-z_][\w]*", f)]
            if bad:
                raise SoqlError(f"unsupported select items {bad} (subset allows plain field names)")
        limit = m.group("limit")
        return cls(
            table=m.group("table"),
            fields=fields,
            where=m.group("where"),
            limit=int(limit) if limit else None,
            is_count=is_count,
        )


def run_soql(load_table_fn, soql: str, include_deleted: bool = False):
    """Execute a SOQL-subset query.

    load_table_fn: table name -> DataFrame (e.g. TableStore.read or
    EntitySource.load). Returns a DataFrame, or an int for COUNT().
    """
    q = SoqlQuery.parse(soql)
    df: DataFrame = load_table_fn(q.table)
    if not include_deleted and "IsDeleted" in df.columns:
        df = df.filter(~F.coalesce(F.col("IsDeleted"), F.lit(False)))
    if q.where:
        df = df.filter(F.expr(q.where))
    if q.is_count:
        return df.count()
    if q.fields:
        missing = [f for f in q.fields if f not in df.columns]
        if missing:
            raise SoqlError(f"unknown fields {missing} on {q.table}")
        df = df.select(*q.fields)
    if q.limit is not None:
        df = df.limit(q.limit)
    return df
