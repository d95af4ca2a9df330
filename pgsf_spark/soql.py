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


def run_soql_all(load_table_fn, soql: str):
    """queryAll semantics (simple_salesforce api.py:395-425 query_all):
    soft-deleted rows included. Pagination is meaningless Spark-side -- the
    DataFrame already IS the accumulated result; callers needing bounded
    driver memory iterate with :func:`query_pages`."""
    return run_soql(load_table_fn, soql, include_deleted=True)


def query_pages(df: DataFrame, page_size: int = 2000):
    """Iterate a result in pages of ``page_size`` rows -- the query/queryMore
    accumulation loop (api.py:296-328) with bounded driver memory: rows
    stream via toLocalIterator (one partition in flight), never a full
    collect."""
    page: list = []
    for row in df.toLocalIterator():
        page.append(row)
        if len(page) >= page_size:
            yield page
            page = []
    if page:
        yield page


# ---------------------------------------------------------------------------
# SOSL search subset (simple_salesforce api.py:296-328 search/quick_search)
# ---------------------------------------------------------------------------

_SOSL_RE = re.compile(
    r"^\s*FIND\s+\{(?P<term>[^}]+)\}"
    r"(?:\s+IN\s+(?P<scope>NAME|ALL)\s+FIELDS)?"
    r"(?:\s+RETURNING\s+(?P<returning>.+?))?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_RETURNING_RE = re.compile(
    r"(?P<table>[A-Za-z_]\w*)\s*(?:\(\s*(?P<fields>[^)]*?)\s*(?:\bWHERE\s+(?P<where>[^)]+))?\))?",
    re.IGNORECASE,
)


@dataclass
class SoslQuery:
    term: str
    scope: str  # 'NAME' | 'ALL'
    returning: list[tuple[str, list[str], str | None]]  # (table, fields, where)

    @classmethod
    def parse(cls, sosl: str) -> "SoslQuery":
        m = _SOSL_RE.match(sosl)
        if not m:
            raise SoqlError(f"unsupported SOSL shape: {sosl!r}")
        returning: list[tuple[str, list[str], str | None]] = []
        if m.group("returning"):
            for rm in _RETURNING_RE.finditer(m.group("returning")):
                fields = [
                    f.strip()
                    for f in (rm.group("fields") or "").rstrip(", ").split(",")
                    if f.strip()
                ]
                returning.append((rm.group("table"), fields, rm.group("where")))
        return cls(
            term=m.group("term").strip(),
            scope=(m.group("scope") or "ALL").upper(),
            returning=returning,
        )


def _search_predicate(df: DataFrame, term: str, scope: str):
    """Case-insensitive substring match over the searchable columns: ALL
    FIELDS = every string column; NAME FIELDS = columns whose name contains
    'name'. One OR-chain of contains() -- a single scan, no UDF."""
    if scope == "NAME":
        cols = [c for c, t in df.dtypes if t == "string" and "name" in c.lower()]
    else:
        cols = [c for c, t in df.dtypes if t == "string"]
    if not cols:
        return F.lit(False)
    needle = term.lower()
    pred = F.lit(False)
    for c in cols:
        pred = pred | F.lower(F.col(c)).contains(needle)
    return pred


def run_sosl(load_table_fn, sosl: str, include_deleted: bool = False) -> dict[str, DataFrame]:
    """Execute a SOSL-subset search; returns {table: matching rows} -- the
    searchRecords grouping of api.py:296-328, one DataFrame per RETURNING
    object. Each table is one filtered scan (predicate stays JVM-side)."""
    q = SoslQuery.parse(sosl)
    if not q.returning:
        raise SoqlError("SOSL subset requires a RETURNING clause (which tables to search)")
    out: dict[str, DataFrame] = {}
    for table, fields, where in q.returning:
        df: DataFrame = load_table_fn(table)
        if not include_deleted and "IsDeleted" in df.columns:
            df = df.filter(~F.coalesce(F.col("IsDeleted"), F.lit(False)))
        df = df.filter(_search_predicate(df, q.term, q.scope))
        if where:
            df = df.filter(F.expr(where))
        if fields:
            missing = [f for f in fields if f not in df.columns]
            if missing:
                raise SoqlError(f"unknown fields {missing} on {table}")
            df = df.select(*fields)
        out[table] = df
    return out
