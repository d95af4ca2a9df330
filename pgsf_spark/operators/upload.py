"""Reverse-ETL chunked upload sink (K4 in SURVEY §2.2).

The reference splits a CSV into batches capped at 10 MB / 10,000 records
(header repeated per chunk) and POSTs each as a bulk-update batch
(/root/reference/upload_table.py:43-99). Spark-native: the DataFrame is
written out through foreachPartition, each partition slicing itself into
record/byte-capped chunks and handing them to a pluggable poster callable
(the HTTP client in production; a collector in tests).

Scale note: partitions upload concurrently (executor-side), so the
reference's sequential chunk loop becomes cluster-parallel for free; the
caps apply per chunk exactly as in the reference.
"""

from __future__ import annotations

import csv
import io
from typing import Callable, Iterable

from pyspark.sql import DataFrame

DEFAULT_MAX_UPLOAD_SIZE = 10_000_000  # bytes (upload_table.py:15)
DEFAULT_MAX_UPLOAD_RECORDS = 10_000  # records (upload_table.py:16)


def _render_row(row, columns) -> str:
    buf = io.StringIO()
    w = csv.writer(buf, quoting=csv.QUOTE_MINIMAL, lineterminator="\n")
    w.writerow(["" if row[c] is None else row[c] for c in columns])
    return buf.getvalue()


def chunk_rows(
    rows: Iterable,
    columns: list[str],
    max_bytes: int = DEFAULT_MAX_UPLOAD_SIZE,
    max_records: int = DEFAULT_MAX_UPLOAD_RECORDS,
) -> Iterable[str]:
    """Yield CSV chunk strings, header repeated per chunk, each within the
    byte/record caps (csv_split, upload_table.py:43-74)."""
    header = io.StringIO()
    csv.writer(header, quoting=csv.QUOTE_MINIMAL, lineterminator="\n").writerow(columns)
    header = header.getvalue()

    cur: list[str] = []
    cur_bytes = len(header.encode())
    n = 0
    for row in rows:
        line = _render_row(row, columns)
        lb = len(line.encode())
        if cur and (cur_bytes + lb > max_bytes or n + 1 > max_records):
            yield header + "".join(cur)
            cur, cur_bytes, n = [], len(header.encode()), 0
        cur.append(line)
        cur_bytes += lb
        n += 1
    if cur:
        yield header + "".join(cur)


def upload_dataframe(
    df: DataFrame,
    poster: Callable[[str], None],
    max_bytes: int = DEFAULT_MAX_UPLOAD_SIZE,
    max_records: int = DEFAULT_MAX_UPLOAD_RECORDS,
    max_retries: int = 3,
) -> None:
    """Upload df as capped CSV chunks via ``poster`` (called once per chunk).

    Retries per chunk on ConnectionError, like wait_for_batch's retry loop
    (upload_table.py:88-96). ``poster`` must be picklable (runs on
    executors).
    """
    columns = df.columns

    def handle_partition(rows):
        for chunk in chunk_rows(rows, columns, max_bytes, max_records):
            for attempt in range(max_retries):
                try:
                    poster(chunk)
                    break
                except ConnectionError:
                    if attempt == max_retries - 1:
                        raise

    df.foreachPartition(handle_partition)


def parse_batch_result(result_csv: str) -> list[dict]:
    """Parse a bulk-batch result CSV into per-record outcomes.

    The service answers each uploaded batch with one row per record:
    ``Id,Success,Created,Error`` (salesforce_bulk.py:498-546 --
    get_batch_results parses the same shape into UploadResult tuples).
    Booleans arrive as the API's literal 'true'/'false'.
    """
    rows = list(csv.reader(io.StringIO(result_csv)))
    if not rows:
        return []
    header = [h.strip().lower() for h in rows[0]]
    out = []
    for raw in rows[1:]:
        if not raw:
            continue
        rec = dict(zip(header, raw))
        out.append(
            {
                "id": rec.get("id") or None,
                "success": rec.get("success", "").strip().lower() == "true",
                "created": rec.get("created", "").strip().lower() == "true",
                "error": rec.get("error") or None,
            }
        )
    return out


def upload_dataframe_with_results(
    df: DataFrame,
    poster: Callable[[str], str],
    max_bytes: int = DEFAULT_MAX_UPLOAD_SIZE,
    max_records: int = DEFAULT_MAX_UPLOAD_RECORDS,
    max_retries: int = 3,
) -> DataFrame:
    """Upload and surface per-record outcomes as a DataFrame.

    ``poster(chunk_csv) -> result_csv``: posts one chunk and returns the
    service's result CSV for that batch. The outcomes stay distributed
    (mapPartitions -- no driver collect): downstream code can count failures,
    join errors back to source rows by id, or quarantine rejects, like the
    reference's per-batch result parsing (salesforce_bulk.py:498-546).
    Output schema: id string, success boolean, created boolean, error string.
    """
    columns = df.columns

    def handle_partition(rows):
        for chunk in chunk_rows(rows, columns, max_bytes, max_records):
            result_csv = None
            for attempt in range(max_retries):
                try:
                    result_csv = poster(chunk)
                    break
                except ConnectionError:
                    if attempt == max_retries - 1:
                        raise
            for rec in parse_batch_result(result_csv or ""):
                yield (rec["id"], rec["success"], rec["created"], rec["error"])

    return df.rdd.mapPartitions(handle_partition).toDF(
        "id string, success boolean, created boolean, error string"
    )
