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

from pgsf_spark.analytics import media_analysis, shapes

# LEAF imports only (spec.py, not registry): registry.py's ROUND-11
# REGISTRATION block imports THIS module at its bottom, so importing
# registry from here would make the module import-order-dependent
# (registry_r11-first closed a cycle on a partially-initialized module)
from pgsf_spark.analytics.spec import _NORM, HLL_PORTABLE_ORACLE, QuerySpec
from pgsf_spark.streaming import faces

# --- A. streaming oracle fragments -------------------------------------------
# Batch-equivalent SQL for the bounded streaming runs in streaming/faces.py.
# The emission/late-drop rules encoded here are the MEASURED semantics of
# this engine's micro-batch watermarking (see faces.py module docstring):
# eviction watermark during batch k = max_ts(batches < k) - delay; the
# late filter lags one batch; windows/timers resolve against the final
# no-data batch's watermark. Timer comparisons happen at MILLISECOND
# grain (Spark tracks watermarks in ms and setTimeoutTimestamp truncates
# to ms), hence epoch_ms below.

_SESS_GAP_US = int(faces.SESSION_GAP_S * 1_000_000)
_SESS_GAP_MS = int(faces.SESSION_GAP_S * 1000)

# gap-and-islands sessions over events, with per-session batch metadata
_SESSIONS_CTE = f"""e AS (
  SELECT user_id, event_id, ts, value, epoch_us(ts) AS us, epoch_ms(ts) AS ms,
    NTILE({faces.N_BATCHES}) OVER (ORDER BY ts, event_id) AS tile
  FROM events),
g AS (
  SELECT *, CASE WHEN LAG(us) OVER w IS NULL OR us - LAG(us) OVER w > {_SESS_GAP_US}
    THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, event_id, us, ms, tile, value,
    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS sid
  FROM g),
sess AS (
  SELECT user_id, sid, MIN(us) AS start_us, MAX(us) AS end_us,
    MAX(ms) AS end_ms, COUNT(*) AS n,
    SUM(CAST(value AS DECIMAL(27,4))) AS val
  FROM s GROUP BY 1, 2),
mx AS (SELECT MAX(epoch_ms(ts)) AS maxms FROM events)"""

# --- B. multimodal oracle fragments ------------------------------------------
# (closed forms of the synthetic media in media_analysis.py; the integer
# cosine matrices are embedded from the SAME Python constants the Spark
# path uses, so transform parity holds by construction)

_GATE = 64  # multimodal._GATE_DOCS; gate ids are doc_id < 64

# textured gate image params: a = 1+m%4, b = 1+(m//4)%4, c = (m//16)%2
_TEX_IDS = f"""ids AS (
  SELECT doc_id AS m, 16 + (doc_id % 32) AS w, 16 + ((doc_id * 7) % 32) AS h,
    1 + (doc_id % 4) AS a, 1 + ((doc_id // 4) % 4) AS b, (doc_id // 16) % 2 AS c
  FROM documents WHERE doc_id < {_GATE})"""


def _dct_values(matrix, first_index: int = 0) -> str:
    """VALUES list (u, x, mv) for an integer cosine matrix."""
    return ", ".join(
        f"({u + first_index}, {x}, {v})"
        for u, row in enumerate(matrix)
        for x, v in enumerate(row)
    )


def _phash_hashes_sql() -> str:
    """CTE chain ending in hashes(m, hi, lo): textured pixels -> 8x8 luma
    grid -> integer DCT -> 32nd-smallest-AC threshold -> 63-bit packing,
    mirroring media_analysis._phash_bits_from_grid step for step."""
    return f"""WITH {_TEX_IDS},
dctm AS (SELECT * FROM (VALUES {_dct_values(media_analysis.PHASH_DCT)}) m(u, x, mv)),
cells AS (
  SELECT m, i.range // 8 AS gi, i.range % 8 AS gj,
    (a * ((i.range // 8) * h // 8) + b * (3 * ((i.range % 8) * w // 8) + 0)
     + c * ((((i.range // 8) * h // 8) * (3 * ((i.range % 8) * w // 8) + 0)) % 7)) % 256
  + (a * ((i.range // 8) * h // 8) + b * (3 * ((i.range % 8) * w // 8) + 1)
     + c * ((((i.range // 8) * h // 8) * (3 * ((i.range % 8) * w // 8) + 1)) % 7)) % 256
  + (a * ((i.range // 8) * h // 8) + b * (3 * ((i.range % 8) * w // 8) + 2)
     + c * ((((i.range // 8) * h // 8) * (3 * ((i.range % 8) * w // 8) + 2)) % 7)) % 256 AS luma
  FROM ids, range(0, 64) i),
t AS (
  SELECT c.m, ma.u AS u, mb.u AS v, SUM(ma.mv * c.luma * mb.mv) AS t
  FROM cells c JOIN dctm ma ON ma.x = c.gi JOIN dctm mb ON mb.x = c.gj
  GROUP BY 1, 2, 3),
ac AS (SELECT m, u * 8 + v AS k, t FROM t WHERE NOT (u = 0 AND v = 0)),
med AS (
  SELECT m, t AS med FROM (
    SELECT m, t, ROW_NUMBER() OVER (PARTITION BY m ORDER BY t) AS rn FROM ac)
  WHERE rn = 32),
hashes AS (
  SELECT ac.m,
    CAST(SUM(CASE WHEN ac.t > med.med AND ac.k >= 33
      THEN (1::BIGINT << CAST(ac.k - 33 AS INT)) ELSE 0 END) AS BIGINT) AS hi,
    CAST(SUM(CASE WHEN ac.t > med.med AND ac.k <= 32
      THEN (1::BIGINT << CAST(ac.k - 1 AS INT)) ELSE 0 END) AS BIGINT) AS lo
  FROM ac JOIN med USING (m) GROUP BY ac.m)"""


# cross-modal: image aHash (channel-sum luma, mean threshold) and video
# keyframe aHash (single-channel, same mean threshold) from the textured form
def _cross_hashes_sql() -> str:
    drift = media_analysis.CROSS_FRAME_DRIFT
    return f"""WITH {_TEX_IDS},
icells AS (
  SELECT m, i.range AS k,
    (a * ((i.range // 8) * h // 8) + b * (3 * ((i.range % 8) * w // 8) + 0)
     + c * ((((i.range // 8) * h // 8) * (3 * ((i.range % 8) * w // 8) + 0)) % 7)) % 256
  + (a * ((i.range // 8) * h // 8) + b * (3 * ((i.range % 8) * w // 8) + 1)
     + c * ((((i.range // 8) * h // 8) * (3 * ((i.range % 8) * w // 8) + 1)) % 7)) % 256
  + (a * ((i.range // 8) * h // 8) + b * (3 * ((i.range % 8) * w // 8) + 2)
     + c * ((((i.range // 8) * h // 8) * (3 * ((i.range % 8) * w // 8) + 2)) % 7)) % 256 AS luma
  FROM ids, range(0, 64) i),
itot AS (SELECT m, SUM(luma) AS total FROM icells GROUP BY 1),
ihashes AS (
  SELECT c.m AS image_id,
    CAST(SUM(CASE WHEN c.luma * 64 > t.total AND c.k >= 32
      THEN (1::BIGINT << CAST(c.k - 32 AS INT)) ELSE 0 END) AS BIGINT) AS hi,
    CAST(SUM(CASE WHEN c.luma * 64 > t.total AND c.k < 32
      THEN (1::BIGINT << CAST(c.k AS INT)) ELSE 0 END) AS BIGINT) AS lo
  FROM icells c JOIN itot t USING (m) GROUP BY 1),
vids AS (SELECT *, 4 + (m % 5) AS n FROM ids WHERE m < {media_analysis.CROSS_VIDEOS}),
vframes AS (
  SELECT m, w, h, a, b, c, CAST(f AS BIGINT) AS f
  FROM vids, range(0, 8) r(f) WHERE f < n AND f % 4 = 0),
vcells AS (
  SELECT m, f, i.range AS k,
    (a * ((i.range // 8) * h // 8) + 3 * b * ((i.range % 8) * w // 8)
     + c * ((((i.range // 8) * h // 8) * 3 * ((i.range % 8) * w // 8)) % 7)
     + {drift} * f) % 256 AS v
  FROM vframes, range(0, 64) i),
vtot AS (SELECT m, f, SUM(v) AS total FROM vcells GROUP BY 1, 2),
vhashes AS (
  SELECT c.m AS video_id, c.f AS frame_idx,
    CAST(SUM(CASE WHEN c.v * 64 > t.total AND c.k >= 32
      THEN (1::BIGINT << CAST(c.k - 32 AS INT)) ELSE 0 END) AS BIGINT) AS hi,
    CAST(SUM(CASE WHEN c.v * 64 > t.total AND c.k < 32
      THEN (1::BIGINT << CAST(c.k AS INT)) ELSE 0 END) AS BIGINT) AS lo
  FROM vcells c JOIN vtot t USING (m, f) GROUP BY 1, 2)"""


# --- C. relational / at-scale shapes (8) -----------------------------------

_CENTS = "CAST(SUM(CAST(round({expr} * 100) AS BIGINT)) AS BIGINT)"

STAGED_QUERIES: dict[str, QuerySpec] = {
    # --- A. streaming-stateful (8) ----------------------------------------
    "stream_sessionize_gate": QuerySpec(
        faces.q_stream_sessionize_gate,
        f"""WITH {_SESSIONS_CTE},
emitted AS (
  SELECT sess.* FROM sess, mx
  WHERE sid < (SELECT MAX(sid) FROM sess s2 WHERE s2.user_id = sess.user_id)
     OR mx.maxms > end_ms + {_SESS_GAP_MS})
SELECT user_id, COUNT(*) AS n_sessions, CAST(SUM(n) AS BIGINT) AS n_events,
  CAST(SUM(end_us - start_us) AS BIGINT) AS sum_dur_us,
  ROUND(CAST(SUM(val) AS DOUBLE), 4) AS sum_value
FROM emitted GROUP BY user_id ORDER BY user_id""",
    ),
    "stream_tumbling_revenue": QuerySpec(
        faces.q_stream_tumbling_revenue,
        f"""WITH b AS (SELECT event_id % {faces.N_BATCHES} AS bk, ts, value FROM events),
m0 AS (SELECT MAX(ts) AS t FROM b WHERE bk = 0),
mall AS (SELECT MAX(ts) AS t FROM b),
inc AS (
  SELECT date_trunc('hour', ts) AS wstart, value FROM b
  WHERE bk < 2
     OR date_trunc('hour', ts) + INTERVAL 1 HOUR
        > (SELECT t FROM m0) - INTERVAL 30 MINUTE),
agg AS (
  SELECT wstart, COUNT(*) AS n_events,
    ROUND(CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE), 4) AS revenue
  FROM inc GROUP BY 1)
SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start, n_events, revenue
FROM agg, mall WHERE wstart + INTERVAL 1 HOUR <= mall.t - INTERVAL 30 MINUTE
ORDER BY window_start""",
    ),
    "stream_dedup_watermark": QuerySpec(
        faces.q_stream_dedup_watermark,
        """SELECT event_type, COUNT(*) AS n_events,
  COUNT(DISTINCT event_id) AS n_distinct,
  ROUND(CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE), 4) AS sum_value
FROM events GROUP BY 1 ORDER BY 1""",
    ),
    "stream_cdc_merge_parity": QuerySpec(
        faces.q_stream_cdc_merge_parity,
        """WITH c AS (
  SELECT c_custkey AS k, c_nationkey,
    CAST(round(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer),
final AS (
  SELECT k, c_nationkey,
    CASE WHEN k % 7 = 0 THEN cents + 700000
         WHEN k % 5 = 0 THEN cents + 100000
         ELSE cents END AS cents
  FROM c WHERE NOT (k % 11 = 3))
SELECT c_nationkey, COUNT(*) AS n_rows, CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM final GROUP BY 1 ORDER BY 1""",
    ),
    "stream_static_enrich": QuerySpec(
        faces.q_stream_static_enrich,
        """SELECT COALESCE(c_nationkey, -1) AS nationkey, COUNT(*) AS n_events,
  COUNT(DISTINCT user_id) AS n_users,
  ROUND(CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE), 4) AS sum_value
FROM events LEFT JOIN customer ON user_id = c_custkey
GROUP BY 1 ORDER BY 1""",
    ),
    "stream_interval_join_gate": QuerySpec(
        faces.q_stream_interval_join_gate,
        """WITH c AS (SELECT user_id, event_id AS click_id, ts AS cts
  FROM events WHERE event_type = 'click'),
p AS (SELECT user_id, event_id AS purchase_id, ts AS pts
  FROM events WHERE event_type = 'purchase'),
j AS (
  SELECT p.user_id, purchase_id, click_id,
    epoch_us(pts) - epoch_us(cts) AS lead_us
  FROM c JOIN p ON c.user_id = p.user_id
    AND cts >= pts - INTERVAL 30 MINUTE AND cts < pts)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs, COUNT(DISTINCT user_id) AS n_users,
  COUNT(DISTINCT purchase_id) AS n_purchases_matched,
  CAST(SUM(lead_us) AS BIGINT) AS sum_lead_us
FROM j""",
    ),
    # register merge is max(): streamed sketch == batch sketch, so the
    # batch HLL oracle applies VERBATIM (the shared spec.py text the
    # live hll_portable also uses)
    "stream_running_hll": QuerySpec(
        faces.q_stream_running_hll, HLL_PORTABLE_ORACLE
    ),
    "stream_state_timeout_audit": QuerySpec(
        faces.q_stream_state_timeout_audit,
        f"""WITH {_SESSIONS_CTE},
tm AS (
  SELECT tile, MAX(MAX(ms)) OVER (ORDER BY tile ROWS UNBOUNDED PRECEDING) AS cmms
  FROM s GROUP BY tile),
heads AS (
  SELECT user_id, sid, tile AS stile FROM (
    SELECT user_id, sid, tile,
      ROW_NUMBER() OVER (PARTITION BY user_id, sid ORDER BY us, event_id) AS rn
    FROM s) WHERE rn = 1),
lab AS (
  SELECT sess.*, heads.stile,
    CASE
      WHEN heads.stile IS NOT NULL THEN
        CASE WHEN heads.stile >= 3
              AND (SELECT cmms FROM tm WHERE tile = heads.stile - 2)
                  > sess.end_ms + {_SESS_GAP_MS}
             THEN 'timeout' ELSE 'gap' END
      WHEN (SELECT maxms FROM mx) > sess.end_ms + {_SESS_GAP_MS} THEN 'timeout'
    END AS close_reason
  FROM sess LEFT JOIN heads
    ON heads.user_id = sess.user_id AND heads.sid = sess.sid + 1)
SELECT close_reason, COUNT(*) AS n_sessions, CAST(SUM(n) AS BIGINT) AS n_events,
  COUNT(DISTINCT user_id) AS n_users,
  CAST(SUM(end_us - start_us) AS BIGINT) AS sum_dur_us
FROM lab WHERE close_reason IS NOT NULL
GROUP BY 1 ORDER BY 1""",
    ),
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
    # --- B. multimodal analysis (9) ---------------------------------------
    "image_phash_neardup": QuerySpec(
        media_analysis.q_image_phash_neardup,
        _phash_hashes_sql()
        + f"""
SELECT a.m AS ka, b.m AS kb,
  CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS INT) AS hamming
FROM hashes a JOIN hashes b ON a.m < b.m
WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= {media_analysis.PHASH_TAU}
ORDER BY ka, kb""",
    ),
    "image_channel_histogram": QuerySpec(
        media_analysis.q_image_channel_histogram,
        f"""WITH ids AS (
  SELECT doc_id AS m, 16 + (doc_id % 32) AS w, 16 + ((doc_id * 7) % 32) AS h
  FROM documents WHERE doc_id < {_GATE}),
px AS (
  SELECT i.range % 3 AS channel,
    (((i.range // (w * 3)) % 256) + (i.range % (w * 3))) % 256 // 32 AS bin
  FROM ids, range(0, 6912) i WHERE i.range < w * h * 3)
SELECT CAST(channel AS BIGINT) AS channel, CAST(bin AS BIGINT) AS bin,
  COUNT(*) AS n_px
FROM px GROUP BY 1, 2 ORDER BY channel, bin""",
    ),
    "image_resize_gate": QuerySpec(
        media_analysis.q_image_resize_gate,
        f"""WITH ids AS (
  SELECT doc_id AS m, 16 + (doc_id % 32) AS w, 16 + ((doc_id * 7) % 32) AS h
  FROM documents WHERE doc_id < {_GATE}),
lv AS (SELECT * FROM (VALUES {", ".join(f"({i}, {tw}, {th})" for i, (tw, th) in enumerate(media_analysis.PYRAMID_LEVELS))}) l(level, tw, th)),
res AS (
  SELECT m, level, tw, th,
    CAST(SUM((((((i.range // 3) // tw) * h // th) % 256
               + 3 * (((i.range // 3) % tw) * w // tw)
               + (i.range % 3)) % 256)
             * ((i.range % 9973) + 1)) AS BIGINT) AS checksum
  FROM ids, lv, range(0, {3 * max(tw * th for tw, th in media_analysis.PYRAMID_LEVELS)}) i
  WHERE i.range < tw * th * 3
  GROUP BY 1, 2, 3, 4)
SELECT m AS media_id, CAST(level AS BIGINT) AS level,
  CAST(tw AS BIGINT) AS out_w, CAST(th AS BIGINT) AS out_h, checksum
FROM res ORDER BY media_id, level""",
    ),
    "audio_spectral_centroid": QuerySpec(
        media_analysis.q_audio_spectral_centroid,
        f"""WITH ids AS (
  SELECT doc_id AS m, 1200 + (doc_id % 17) * 53 AS n
  FROM documents WHERE doc_id < {_GATE}),
mc AS (SELECT * FROM (VALUES {_dct_values(media_analysis.SPEC_DCT, first_index=1)}) s(k, i, mv)),
t AS (
  SELECT ids.m, fr.range AS f, mc.k,
    SUM(mc.mv * (((fr.range * {media_analysis.SPEC_FRAME} + mc.i) * 37) % 20000 - 10000)) AS t
  FROM ids, range(0, 128) fr, mc
  WHERE fr.range < n // {media_analysis.SPEC_FRAME}
  GROUP BY 1, 2, 3),
p AS (SELECT m, k, SUM(t * t) AS p FROM t GROUP BY 1, 2),
agg AS (
  SELECT m, SUM(k * p) AS num, SUM(p) AS den FROM p GROUP BY 1)
SELECT ids.m AS media_id, CAST(ids.n // {media_analysis.SPEC_FRAME} AS BIGINT) AS n_frames_spec,
  ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS centroid,
  CAST(den % {media_analysis.SPEC_MOD} AS BIGINT) AS power_mod
FROM ids JOIN agg USING (m) ORDER BY media_id""",
    ),
    "audio_silence_ratio": QuerySpec(
        media_analysis.q_audio_silence_ratio,
        f"""WITH ids AS (
  SELECT doc_id AS m, 1200 + (doc_id % 17) * 53 AS n
  FROM documents WHERE doc_id < {_GATE}),
s AS (
  SELECT m, CASE WHEN (i.range // {media_analysis.GAP_BLOCK}) % 4 = 3 THEN 0
    ELSE ((i.range * 37) % 20000) - 10000 END AS v
  FROM ids, range(0, 2048) i WHERE i.range < n),
agg AS (
  SELECT m, COUNT(*) AS n_samples,
    CAST(SUM(CASE WHEN v > -{media_analysis.SILENCE_AMP}
      AND v < {media_analysis.SILENCE_AMP} THEN 1 ELSE 0 END) AS BIGINT) AS n_silent
  FROM s GROUP BY 1)
SELECT m AS media_id, n_samples, n_silent,
  ROUND(CAST(n_silent AS DOUBLE) / CAST(n_samples AS DOUBLE), 6) AS silence_ratio
FROM agg ORDER BY media_id""",
    ),
    "video_shot_boundaries": QuerySpec(
        media_analysis.q_video_shot_boundaries,
        f"""WITH ids AS (
  SELECT doc_id AS m, 16 + (doc_id % 16) AS w, 12 + ((doc_id * 5) % 12) AS h,
    8 + (doc_id % 9) AS n, 3 + (doc_id % 4) AS sl
  FROM documents WHERE doc_id < {_GATE}),
fr AS (
  SELECT m, w, h, n, sl, CAST(f AS BIGINT) AS f,
    (m * 31 + 17 * (f // sl)) % 251 AS base,
    (m * 31 + 17 * ((f - 1) // sl)) % 251 AS pbase
  FROM ids, range(1, 17) r(f) WHERE f < n),
px AS (
  SELECT m, f, n, w * h AS npx,
    SUM(abs((base + (p.i % w) + (p.i // w)) % 256
          - (pbase + (p.i % w) + (p.i // w)) % 256)) AS d
  FROM fr, range(0, 2048) p(i) WHERE p.i < w * h
  GROUP BY 1, 2, 3, 4),
agg AS (
  SELECT m, MAX(n) AS n_frames,
    CAST(SUM(CASE WHEN d * 1000 > {media_analysis.SHOT_TAU_MILLI} * npx
      THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
    CAST(SUM(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_static,
    COALESCE(STRING_AGG(CASE WHEN d * 1000 > {media_analysis.SHOT_TAU_MILLI} * npx
      THEN CAST(f AS VARCHAR) END, ',' ORDER BY f), '') AS cut_frames
  FROM px GROUP BY 1)
SELECT m AS media_id, CAST(n_frames AS BIGINT) AS n_frames, n_cuts, n_static, cut_frames
FROM agg ORDER BY media_id""",
    ),
    "video_motion_profile": QuerySpec(
        media_analysis.q_video_motion_profile,
        f"""WITH ids AS (
  SELECT doc_id AS m, 16 + (doc_id % 16) AS w, 12 + ((doc_id * 5) % 12) AS h,
    8 + (doc_id % 9) AS n, doc_id % 251 AS base
  FROM documents WHERE doc_id < {_GATE}),
fr AS (
  SELECT m, w, h, n, base, CAST(f AS BIGINT) AS f
  FROM ids, range(1, 17) r(f) WHERE f < n),
d AS (
  SELECT m, MAX(n) AS n, MAX(w * h) AS npx,
    SUM(abs((base + 3 * f + (p.i % w) + (p.i // w)) % 256
          - (base + 3 * (f - 1) + (p.i % w) + (p.i // w)) % 256)) AS total
  FROM fr, range(0, 2048) p(i) WHERE p.i < w * h
  GROUP BY m)
SELECT m AS media_id, CAST(n AS BIGINT) AS n_frames, CAST(npx AS BIGINT) AS n_px,
  CAST(total AS BIGINT) AS total_abs_diff,
  CAST(total * 1000 // (npx * (n - 1)) AS BIGINT) AS mean_diff_milli
FROM d ORDER BY media_id""",
    ),
    "multimodal_dedup_cross": QuerySpec(
        media_analysis.q_multimodal_dedup_cross,
        _cross_hashes_sql()
        + """
SELECT i.image_id, v.video_id, v.frame_idx,
  CAST(bit_count(xor(i.hi, v.hi)) + bit_count(xor(i.lo, v.lo)) AS INT) AS hamming
FROM ihashes i JOIN vhashes v
  ON bit_count(xor(i.hi, v.hi)) + bit_count(xor(i.lo, v.lo)) <= 3
ORDER BY image_id, video_id, frame_idx""",
    ),
    "media_metadata_quality_gate": QuerySpec(
        media_analysis.q_media_metadata_quality_gate,
        f"""WITH ids AS (
  SELECT doc_id AS m,
    CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
      WHEN 2 THEN 'wav' ELSE 'rvid' END AS kind,
    CASE WHEN (doc_id // 4) % 6 = 5 THEN 1 ELSE 0 END AS corrupt,
    CASE doc_id % 4
      WHEN 0 THEN (8 + doc_id % 24) * (8 + (doc_id * 3) % 24)
      WHEN 1 THEN (16 + doc_id % 32) * (16 + doc_id % 16)
      WHEN 2 THEN 1000 + (doc_id % 23) * 41
      ELSE (16 + doc_id % 16) * (12 + (doc_id * 5) % 12) * (8 + doc_id % 9)
    END AS declared
  FROM documents WHERE doc_id < {media_analysis.QUALITY_DOCS}),
rows_ AS (
  SELECT kind, corrupt, declared,
    CASE WHEN corrupt = 1 THEN 0 ELSE 1 END AS meta_ok,
    CASE WHEN corrupt = 1 OR kind = 'jpeg' THEN 0 ELSE 1 END AS complete,
    CASE WHEN corrupt = 1 OR kind = 'jpeg' THEN 0 ELSE declared END AS decoded
  FROM ids)
SELECT kind, COUNT(*) AS n_rows,
  CAST(SUM(meta_ok) AS BIGINT) AS n_meta_ok,
  CAST(SUM(complete) AS BIGINT) AS n_complete,
  CAST(SUM(corrupt) AS BIGINT) AS n_corrupt,
  CAST(SUM(decoded) AS BIGINT) AS sum_units_decoded,
  CAST(SUM(declared) AS BIGINT) AS sum_units_declared,
  CAST(SUM(decoded) * 1000 // SUM(declared) AS BIGINT) AS completeness_milli
FROM rows_ GROUP BY kind ORDER BY kind""",
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
