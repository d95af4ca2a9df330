"""Round-11 STAGED query batch: built and oracle-gated during round 10,
registered only after the unfreeze criteria certify (PERF.md "Registry
unfreeze criteria"). ``STAGED_QUERIES`` mirrors the live registry's
``QUERIES`` contract exactly (same QuerySpec, same oracle-parity rules) so
promotion is a one-line ``QUERIES.update(STAGED_QUERIES)`` in round 11;
until then the live registry stays frozen at 382 and the driver never sees
these names.

Verified by tests/test_r11_staged.py through the same
``pgsf_spark.verify.verify_queries`` machinery the round driver uses.

Batch plan: PERF.md "Round-11 plan: the first post-unfreeze batch" --
A. streaming-stateful (8), B. multimodal (9), C. relational/at-scale
shapes (8). 25 names total.
"""

from __future__ import annotations

from pgsf_spark.analytics import shapes
from pgsf_spark.analytics.registry import _NORM, QuerySpec

# --- C. relational / at-scale shapes (8) -----------------------------------

_CENTS = "CAST(SUM(CAST(round({expr} * 100) AS BIGINT)) AS BIGINT)"

STAGED_QUERIES: dict[str, QuerySpec] = {
    "range_join_bucketed": QuerySpec(
        shapes.q_range_join_bucketed,
        f"""WITH win AS (
  SELECT n_nationkey AS window_id,
    {shapes.VALIDITY_EPOCH} + n_nationkey * {shapes.VALIDITY_STRIDE_S}.0 AS w_start,
    {shapes.VALIDITY_EPOCH} + n_nationkey * {shapes.VALIDITY_STRIDE_S}.0
      + {shapes.VALIDITY_WIDTH_S}.0 AS w_end
  FROM nation)
SELECT window_id, COUNT(*) AS n_events,
  ROUND(CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE), 4) AS sum_value
FROM win JOIN events ON epoch(ts) >= w_start AND epoch(ts) < w_end
GROUP BY window_id ORDER BY window_id""",
    ),
    "skew_salted_topk": QuerySpec(
        shapes.q_skew_salted_topk,
        f"""WITH g AS (
  SELECT CASE WHEN l_orderkey % 4 > 0 THEN 'HOT' ELSE l_returnflag END AS key,
    l_partkey, {_CENTS.format(expr='l_extendedprice')} AS cents
  FROM lineitem GROUP BY 1, 2),
r AS (
  SELECT key, l_partkey AS partkey, cents,
    ROW_NUMBER() OVER (PARTITION BY key ORDER BY cents DESC, l_partkey) AS rank
  FROM g)
SELECT key, CAST(rank AS INT) AS rank, partkey, cents
FROM r WHERE rank <= {shapes.TOPK_K} ORDER BY key, rank""",
    ),
    "bucketed_colocated_join_gate": QuerySpec(
        shapes.q_bucketed_colocated_join_gate,
        f"""SELECT c_nationkey, COUNT(*) AS n_orders,
  {_CENTS.format(expr='o_totalprice')} AS sum_cents,
  TRUE AS no_exchange
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_nationkey ORDER BY c_nationkey""",
    ),
    "snapshot_asof_read_gate": QuerySpec(
        shapes.q_snapshot_asof_read_gate,
        f"""WITH v1 AS (
  SELECT COUNT(*) AS v1_rows, {_CENTS.format(expr='o_totalprice')} AS v1_cents
  FROM orders WHERE o_orderdate < TIMESTAMP '{shapes.ASOF_CUTOFF}'),
v2 AS (
  SELECT COUNT(*) AS v2_rows, {_CENTS.format(expr='o_totalprice')} AS v2_cents
  FROM orders)
SELECT v1_rows, v1_cents, v2_rows, v2_cents,
  v1_rows < v2_rows AS versions_distinct
FROM v1, v2""",
    ),
    "window_rangebetween_native": QuerySpec(
        shapes.q_window_rangebetween_native,
        """SELECT trailing_n, COUNT(*) AS n_rows,
  CAST(SUM(trailing_dec) AS DOUBLE) AS sum_trailing_value
FROM (
  SELECT COUNT(*) OVER w AS trailing_n,
         SUM(CAST(value AS DECIMAL(27,4))) OVER w AS trailing_dec
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW))
GROUP BY trailing_n ORDER BY trailing_n""",
    ),
    "grouping_sets_cube_gate": QuerySpec(
        shapes.q_grouping_sets_cube_gate,
        """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
  COALESCE(o_orderpriority, 'ALL') AS priority,
  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
  COUNT(*) AS n,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                        (o_orderstatus), (o_orderpriority), ())
ORDER BY gid, status, priority""",
    ),
    "pivot_unpivot_roundtrip": QuerySpec(
        shapes.q_pivot_unpivot_roundtrip,
        """SELECT o_orderpriority AS priority, o_orderstatus AS status,
  COUNT(*) AS n, TRUE AS match
FROM orders GROUP BY 1, 2 ORDER BY priority, status""",
    ),
    "lateral_explode_topk": QuerySpec(
        shapes.q_lateral_explode_topk,
        f"""WITH t AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS toks
  FROM documents WHERE doc_id < {shapes.LATERAL_DOCS}),
ex AS (
  SELECT doc_id, i.range AS pos1, toks[i.range] AS token
  FROM t, range(1, {shapes.LATERAL_MAX_TOKS + 1}) i WHERE i.range <= len(toks)),
r AS (
  SELECT doc_id, token, length(token) AS tok_len, pos1,
    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY length(token) DESC, pos1) AS rank
  FROM ex)
SELECT doc_id, CAST(rank AS INT) AS rank, token,
  CAST(tok_len AS BIGINT) AS tok_len, CAST(pos1 AS BIGINT) AS pos1
FROM r WHERE rank <= {shapes.LATERAL_K} ORDER BY doc_id, rank""",
    ),
}
