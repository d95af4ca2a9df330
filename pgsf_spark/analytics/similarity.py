"""Similarity search over the embeddings table (array<float> column).

Brute-force cosine top-k is the exact baseline (one pass, no shuffle until
the final top-k reduce). The scale path buckets vectors with a random-
hyperplane LSH (deterministic md5-seeded planes) so candidate generation
joins only within buckets -- same pattern as MinHash-LSH for text.

Dot products use F.aggregate over F.zip_with (JVM, no Python): element
order is preserved, so double-precision sums are bit-identical to DuckDB's
list_dot_product on the same data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pgsf_spark.tables import load_table, spread


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _to_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 cosine neighbors of vec_id=0 (brute force).

    The query vector is broadcast (crossJoin of a 1-row DF); the scan is a
    single projection pass; top-k is TakeOrderedAndProject -- the right
    brute-force plan at any scale."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = e.select("vec_id", _to_double(F.col("embedding")).alias("v"))
    q = emb.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    dot = _dot(F.col("v"), F.col("qv"))
    norm = F.sqrt(_dot(F.col("v"), F.col("v"))) * F.sqrt(_dot(F.col("qv"), F.col("qv")))
    return (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != 0)
        .select("vec_id", F.round(dot / norm, 4).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(10)
    )


def q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector L2 norm + label stats -- sanity/statistics pass."""
    e = load_table(spark, sf_dir, "embeddings")
    v = _to_double(F.col("embedding"))
    return e.select(
        "vec_id",
        F.col("label").cast("int").alias("label"),
        F.round(F.sqrt(_dot(v, v)), 4).alias("l2_norm"),
        F.size("embedding").alias("dim"),
    )


def q_label_centroid_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean intra-label cosine-to-centroid: per-label centroid via
    element-wise array aggregation (posexplode + groupBy), then one
    broadcast join back. The centroid agg shuffles dim*labels rows only."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = e.select("vec_id", F.col("label").cast("int").alias("label"), _to_double(F.col("embedding")).alias("v"))
    pos = emb.select("label", F.posexplode("v").alias("i", "x"))
    cent = (
        pos.groupBy("label", "i")
        # exact decimal accumulation -> order-independent (oracle_utils)
        .agg((F.sum(F.col("x").cast("decimal(18,9)")).cast("double") / F.count("x")).alias("cx"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("i", "cx"))).alias("pairs"))
        .select("label", F.transform("pairs", lambda p: p.cx).alias("cv"))
    )
    j = emb.join(F.broadcast(cent), "label")
    cos = _dot(F.col("v"), F.col("cv")) / (
        F.sqrt(_dot(F.col("v"), F.col("v"))) * F.sqrt(_dot(F.col("cv"), F.col("cv")))
    )
    return j.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(cos.cast("decimal(18,12)")).cast("double") / F.count(cos), 4).alias(
            "avg_cos_to_centroid"
        ),
    )


def plane_weights(n_planes: int = 8, dim: int = 64, seed: int = 7) -> list[list[float]]:
    """Deterministic hyperplane weights: md5(seed,plane,i) -> [-1, 1].

    Computed driver-side (no RNG state, reproducible across runs and
    engines); embedded as literals in both the Spark plan and the oracle."""
    import hashlib

    return [
        [
            int(hashlib.md5(f"p{seed}:{p}:{i}".encode()).hexdigest()[:8], 16) / 0xFFFFFFFF * 2.0 - 1.0
            for i in range(dim)
        ]
        for p in range(n_planes)
    ]


def hyperplane_lsh_bucket(v, n_planes: int = 8, dim: int = 64, seed: int = 7):
    """Random-hyperplane LSH bucket id (sign pattern over n_planes dots)."""
    bits = []
    for p, row in enumerate(plane_weights(n_planes, dim, seed)):
        w = F.array(*[F.lit(x) for x in row])
        bits.append(F.when(_dot(v, w) >= 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(1 << p))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return bucket


def _label_centroids(e: DataFrame) -> DataFrame:
    """label -> centroid vector (exact decimal component means)."""
    emb = e.select(F.col("label").cast("int").alias("label"), _to_double(F.col("embedding")).alias("v"))
    pos = emb.select("label", F.posexplode("v").alias("i", "x"))
    return (
        pos.groupBy("label", "i")
        .agg((F.sum(F.col("x").cast("decimal(18,9)")).cast("double") / F.count("x")).alias("cx"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("i", "cx"))).alias("pairs"))
        .select("label", F.transform("pairs", lambda p: p.cx).alias("cv"))
    )


def _assign_max_cosine(emb: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, v, cluster): per-vector argmax-cosine centroid label, ties
    to the LOWEST label -- the coarse-quantizer assignment of the IVF
    family, as a pure map.

    The label centroids fold into ONE array row (collect_list) attached by
    a 1-row broadcast cross join; the argmax is array_min over
    (-cosine, label) structs, whose field-by-field ordering reproduces the
    (cos_c DESC, label ASC) tie-break of the previous row_number window
    bit-for-bit (negation of a double is exact). The previous shape
    (crossJoin against the k-row centroid table + row_number window)
    exploded every vector k-fold and shuffled those wide rows -- each
    carrying TWO 64-double arrays -- on vec_id; this one computes the same
    k cosines per row with no Exchange and no Sort (OPTIMIZATION_r14,
    guide §2.4; same device as _assign_nearest)."""
    cents = cent.agg(F.array_sort(F.collect_list(F.struct("label", "cv"))).alias("cents"))

    def neg_cos(c):
        return -(
            _dot(F.col("v"), c["cv"])
            / (F.sqrt(_dot(F.col("v"), F.col("v"))) * F.sqrt(_dot(c["cv"], c["cv"])))
        )

    best = F.array_min(
        F.transform(
            F.col("cents"),
            lambda c: F.struct(neg_cos(c).alias("nc"), c["label"].alias("label")),
        )
    )
    return (
        emb.crossJoin(F.broadcast(cents))
        .select("vec_id", "v", best.alias("best"))
        .select("vec_id", "v", F.col("best.label").alias("cluster"))
    )


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: assign every vector to its nearest centroid (coarse
    quantizer = the 10 label centroids, deterministic -- no RNG), then
    search only the query's cluster with exact cosine.

    The assign step is a broadcast array-fold over the tiny centroid
    table (_assign_max_cosine -- no shuffle); the search step touches
    ~1/nlist of the data -- the textbook IVF cost model."""
    e = load_table(spark, sf_dir, "embeddings")
    e = spread(e)  # no-op (no Exchange) when the scan is already wide
    emb = e.select("vec_id", _to_double(F.col("embedding")).alias("v"))
    cent = _label_centroids(e)
    assigned = _assign_max_cosine(emb, cent)
    q = assigned.filter(F.col("vec_id") == 0).select(
        F.col("v").alias("qv"), F.col("cluster").alias("qcluster")
    )
    cos_q = _dot(F.col("v"), F.col("qv")) / (
        F.sqrt(_dot(F.col("v"), F.col("v"))) * F.sqrt(_dot(F.col("qv"), F.col("qv")))
    )
    return (
        assigned.join(F.broadcast(q), F.col("cluster") == F.col("qcluster"))
        .filter(F.col("vec_id") != 0)
        .select("vec_id", F.round(cos_q, 4).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(5)
    )


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate detection: candidate pairs share an
    LSH bucket, survivors have cosine >= 0.35; each duplicate maps to its
    lowest-id canonical. The 100 TB plan: bucket equi-join for candidates
    (never O(n^2)), exact cosine only on candidates."""
    e = load_table(spark, sf_dir, "embeddings")
    e = spread(e)  # no-op (no Exchange) when the scan is already wide
    emb = e.select("vec_id", _to_double(F.col("embedding")).alias("v")).withColumn(
        "bucket", hyperplane_lsh_bucket(F.col("v"))
    )
    a = emb.select(F.col("vec_id").alias("ka"), F.col("v").alias("va"), "bucket")
    b = emb.select(F.col("vec_id").alias("kb"), F.col("v").alias("vb"), "bucket")
    cos = _dot(F.col("va"), F.col("vb")) / (
        F.sqrt(_dot(F.col("va"), F.col("va"))) * F.sqrt(_dot(F.col("vb"), F.col("vb")))
    )
    pairs = (
        a.join(b, "bucket")
        .filter(F.col("ka") < F.col("kb"))
        .select("ka", "kb", F.round(cos, 4).alias("cosine"))
        .filter(F.col("cosine") >= 0.35)
    )
    # canonical = min neighbor id per duplicate
    return pairs.groupBy(F.col("kb").alias("dup_vec_id")).agg(
        F.min("ka").alias("canonical_vec_id"), F.round(F.max("cosine"), 4).alias("max_cosine")
    )


def q_ann_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN: search the query's bucket PLUS every bucket at
    Hamming distance 1 (flip each of the 8 plane bits) -- the standard
    recall fix for bucketed ANN without adding hash tables (Lv et al.,
    multi-probe LSH). 9 probed buckets out of 256 still touch ~3.5% of the
    corpus; candidates come from a bucket equi-join (broadcast probe list),
    never a cross join."""
    e = load_table(spark, sf_dir, "embeddings")
    e = spread(e)  # no-op (no Exchange) when the scan is already wide
    emb = e.select("vec_id", _to_double(F.col("embedding")).alias("v")).withColumn(
        "bucket", hyperplane_lsh_bucket(F.col("v"))
    )
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("v").alias("qv"),
        F.explode(
            F.array(
                F.col("bucket"), *[F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(8)]
            )
        ).alias("probe"),
    )
    cos = _dot(F.col("v"), F.col("qv")) / (
        F.sqrt(_dot(F.col("v"), F.col("v"))) * F.sqrt(_dot(F.col("qv"), F.col("qv")))
    )
    return (
        emb.join(F.broadcast(q), F.col("bucket") == F.col("probe"))
        .filter(F.col("vec_id") != 0)
        .select("vec_id", F.round(cos, 4).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(5)
    )


def q_ann_recall_at_5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall gate for the ANN stack: recall@5 of multi-probe LSH against
    the brute-force exact top-5 on the same data. Both sides are
    deterministic (literal plane weights, sequential-fold dots, fixed
    tie-breaks), so the recall NUMBER itself is a cross-engine assertion --
    this turns "the ANN is probably fine" into a hash-checked row. At scale
    this is the standard offline quality gate run per index build: sample
    queries, compare against exact top-k on the sample."""
    ann = q_ann_multiprobe_topk(spark, sf_dir).select("vec_id")
    exact5 = q_cosine_topk(spark, sf_dir).limit(5).select("vec_id")
    return ann.join(exact5, "vec_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_hits"),
        (F.count(F.lit(1)) / F.lit(5.0)).alias("recall_at_5"),
    )


def q_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket histogram for the hyperplane LSH -- the candidate-generation
    stage of ANN at scale (join within buckets instead of O(n^2))."""
    e = load_table(spark, sf_dir, "embeddings")
    e = spread(e)  # no-op (no Exchange) when the scan is already wide
    emb = e.select("vec_id", _to_double(F.col("embedding")).alias("v"))
    return (
        emb.select(hyperplane_lsh_bucket(F.col("v")).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- iterative k-means (Lloyd) ----------------------------------------------

KMEANS_K = 8
KMEANS_ITERS = 2  # assignment rounds; centroids recompute between rounds


def _sqdist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda acc, v: acc + v
    )


def _assign_nearest(emb: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: argmin by (distance, cluster) -- ties
    break to the lowest cluster id.

    The k centroids are folded into ONE array row (collect_list) and
    attached with a 1-row broadcast cross join; the argmin is then
    array_min over per-centroid (d, cluster) structs -- struct ordering is
    field-by-field, exactly the (d ASC, cluster ASC) tie-break the oracle's
    ROW_NUMBER uses. The previous shape (crossJoin against the k-row
    table + row_number window) exploded every vector k-fold and shuffled
    those wide rows on vec_id once per Lloyd round; this one is a pure
    map over the scan -- no Exchange, no Sort, k distances per row either
    way (OPTIMIZATION_r14)."""
    cents = cent.agg(F.array_sort(F.collect_list(F.struct("cluster", "cv"))).alias("cents"))
    best = F.array_min(
        F.transform(
            F.col("cents"),
            lambda c: F.struct(
                _sqdist(F.col("v"), c["cv"]).alias("d"), c["cluster"].alias("cluster")
            ),
        )
    )
    # two projections on purpose: `best` is referenced twice (d + cluster),
    # and CollapseProject keeps the boundary rather than duplicating the
    # non-cheap argmin expression
    return (
        emb.crossJoin(F.broadcast(cents))
        .select("vec_id", "v", best.alias("best"))
        .select(
            "vec_id",
            "v",
            F.col("best.cluster").alias("cluster"),
            F.col("best.d").alias("d"),
        )
    )


def _recompute_centroids(assigned: DataFrame) -> DataFrame:
    """cluster -> exact decimal component means (same parity discipline as
    _label_centroids; order-independent, so bit-identical at any
    partitioning)."""
    pos = assigned.select("cluster", F.posexplode("v").alias("i", "x"))
    return (
        pos.groupBy("cluster", "i")
        .agg((F.sum(F.col("x").cast("decimal(18,9)")).cast("double") / F.count("x")).alias("cx"))
        .groupBy("cluster")
        .agg(F.array_sort(F.collect_list(F.struct("i", "cx"))).alias("p"))
        .select("cluster", F.transform("p", lambda q: q.cx).alias("cv"))
    )


def _kmeans_assigned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared Lloyd chain: KMEANS_ITERS assignment rounds from the
    deterministic seed (centroids = vectors 0..k-1); returns
    (vec_id, v, cluster, d). Used by q_kmeans_clusters and
    q_semantic_dedup so both faces share one oracle CTE chain."""
    e = load_table(spark, sf_dir, "embeddings")
    # materialize the (vec_id, v) projection ONCE: every Lloyd round's
    # assignment pass plus the seed-centroid filter re-read the embeddings
    # parquet and re-ran the decimal->double conversion (6 scans in the
    # r14 after-plan, plans/r14/kmeans_clusters_after.txt); rounds now
    # re-derive from one scan's worth of narrow (id, vector) rows
    # (VERDICT r14 ask #5, guide §5/§6 -- the projection is the exact
    # frame each round must read in full, so the checkpoint trades k
    # redundant corpus scans for one bounded materialization)
    emb = e.select("vec_id", _to_double(F.col("embedding")).alias("v")).localCheckpoint(
        eager=True
    )
    cent = emb.filter(F.col("vec_id") < KMEANS_K).select(
        F.col("vec_id").cast("int").alias("cluster"), F.col("v").alias("cv")
    )
    assigned = _assign_nearest(emb, cent)
    for _ in range(KMEANS_ITERS - 1):
        cent = _recompute_centroids(assigned)
        assigned = _assign_nearest(emb, cent)
    return assigned


SEMDEDUP_TAU = 0.35  # same similarity bar as q_embedding_near_dup


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic near-duplicate pruning via
    cluster-then-compare. K-means bounds the candidate space -- cosine is
    computed only WITHIN a cluster (equi-join on the cluster id, exactly
    the LSH-bucket shape) -- then every vector with a higher-priority
    (lower vec_id) neighbor at cosine >= SEMDEDUP_TAU is pruned as a
    semantic duplicate. Reports per-cluster survivors.

    At 100 TB: k grows with the corpus so the per-cluster population stays
    bounded (the paper runs k=50k on LAION); the pairwise step is then an
    equi-join whose per-key fan-out is capped, never O(n^2) global.
    Cosines are rounded before the threshold so the keep/prune decision is
    the same bit in every engine; the Lloyd chain is the deterministic
    broadcast template of q_kmeans_clusters."""
    assigned = _kmeans_assigned(spark, sf_dir)
    # materialize the assignment once: it feeds three consumers (both join
    # sides + the per-cluster totals), and each reference would otherwise
    # re-run the entire Lloyd chain -- the SemDeDup paper materializes the
    # cluster assignment for exactly this reason; the copy is (id, vector,
    # cluster), the same order as the input
    m = assigned.select("cluster", "vec_id", "v").localCheckpoint(eager=True)
    a = m.select("cluster", F.col("vec_id").alias("ka"), F.col("v").alias("va"))
    b = m.select("cluster", F.col("vec_id").alias("kb"), F.col("v").alias("vb"))
    cos = _dot(F.col("va"), F.col("vb")) / (
        F.sqrt(_dot(F.col("va"), F.col("va"))) * F.sqrt(_dot(F.col("vb"), F.col("vb")))
    )
    dup = (
        a.join(b, "cluster")
        .filter(F.col("ka") < F.col("kb"))
        .select("cluster", F.col("kb").alias("vec_id"), F.round(cos, 4).alias("cosine"))
        .filter(F.col("cosine") >= SEMDEDUP_TAU)
        .select("cluster", "vec_id")
        .distinct()
    )
    per = m.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_vectors"))
    pruned = dup.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_pruned"))
    return (
        per.join(pruned, "cluster", "left")
        .na.fill(0, ["n_pruned"])
        .select(
            "cluster",
            "n_vectors",
            "n_pruned",
            F.round((F.col("n_vectors") - F.col("n_pruned")) / F.col("n_vectors"), 4).alias(
                "keep_frac"
            ),
        )
    )


def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd k-means, KMEANS_ITERS assignment rounds from a
    deterministic seed (centroids = vectors 0..k-1), reporting per-cluster
    size and mean distance.

    The iterative-algorithm shape on Spark: each round is one broadcast
    crossJoin against a k-row centroid table (no shuffle of the vectors)
    plus one posexplode aggregation keyed by (cluster, dim) -- k*dim = 512
    groups -- to rebuild centroids. Nothing ever collects to the driver;
    at 100 TB each round is a scan + a tiny-key shuffle, and rounds chain
    as one declarative plan. Empty clusters drop out naturally (their
    centroid row vanishes), matching the SQL oracle."""
    assigned = _kmeans_assigned(spark, sf_dir)
    from pgsf_spark.analytics.oracle_utils import davg

    return assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        davg(F.sqrt(F.col("d")), ndigits=4).alias("avg_dist"),
    )


# --- int8 scalar quantization ------------------------------------------------


def _sq_quantized(emb: DataFrame) -> DataFrame:
    """Per-dim min/max scalar quantization to 0..255 ints.

    The range table is an exact (min/max only -- no float-sum ordering)
    posexplode aggregate of dim rows, broadcast back; quantized vectors are
    integer arrays, so every downstream dot product is EXACT integer math --
    the property that makes SQ indexes byte-stable across engines and
    re-shards. At 100 TB this is the 4x memory cut (float32 -> uint8) that
    lets an ANN index fit executor RAM."""
    pos = emb.select(F.posexplode("v").alias("i", "x"))
    rng = (
        pos.groupBy("i")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
        .groupBy()
        .agg(F.array_sort(F.collect_list(F.struct("i", "lo", "hi"))).alias("p"))
        .select(
            F.transform("p", lambda q: q.lo).alias("los"),
            F.transform("p", lambda q: q.hi).alias("his"),
        )
    )
    qz = F.expr(
        "transform(v, (x, i) -> cast(round((x - los[i]) / (his[i] - los[i]) * 255.0, 0) as long))"
    )
    return emb.crossJoin(F.broadcast(rng)).select("vec_id", qz.alias("qv"))


def q_sq_recall_at_5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate for int8 scalar quantization: recall@5 of quantized
    cosine against exact float cosine for query vec 0. Quantized scores are
    ratios of exact integer dot products (deterministic to the bit), so the
    recall number is a hash-checked cross-engine assertion, like
    ann_recall_at_5."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = e.select("vec_id", _to_double(F.col("embedding")).alias("v"))
    qz = _sq_quantized(emb)
    q = qz.filter(F.col("vec_id") == 0).select(F.col("qv").alias("qq"))
    dq = _dot(F.col("qv"), F.col("qq"))
    nq = F.sqrt(_dot(F.col("qv"), F.col("qv"))) * F.sqrt(_dot(F.col("qq"), F.col("qq")))
    approx5 = (
        qz.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != 0)
        .select("vec_id", (dq / nq).alias("qcos"))
        .orderBy(F.col("qcos").desc(), F.col("vec_id"))
        .limit(5)
        .select("vec_id")
    )
    exact5 = q_cosine_topk(spark, sf_dir).limit(5).select("vec_id")
    return approx5.join(exact5, "vec_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_hits"),
        (F.count(F.lit(1)) / F.lit(5.0)).alias("recall_at_5"),
    )


def q_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension distribution stats over the embedding column -- the
    feature-health profile a training pipeline runs before normalizing or
    quantizing vectors (dead dimensions, scale drift).

    Plan: posexplode fans each vector into 64 (dim, value) rows, then one
    shuffle on the 64-value dim key with map-side partial aggregation --
    the classic narrow profile. Means accumulate in DECIMAL(27,8) so the
    result is order-exact at any partitioning; min/max are exact picks.
    """
    e = load_table(spark, sf_dir, "embeddings")
    x = e.select(F.posexplode("embedding").alias("pos", "v")).select(
        (F.col("pos") + 1).cast("int").alias("dim"),
        F.col("v").cast("double").alias("v"),
    )
    dec = "decimal(27,8)"
    return (
        x.groupBy("dim")
        .agg(
            F.round(F.sum(F.col("v").cast(dec)).cast("double") / F.count("v"), 6).alias("mean_val"),
            F.round(F.min("v"), 6).alias("min_val"),
            F.round(F.max("v"), 6).alias("max_val"),
            F.sum((F.col("v") > 0).cast("bigint")).alias("n_positive"),
        )
        .orderBy("dim")
    )


# --- product quantization (PQ) ----------------------------------------------

PQ_M = 8  # subspaces (64 dims -> 8 x 8)
PQ_SUB = 8  # dims per subspace
PQ_K = 8  # codewords per subspace (seeded from vectors 0..PQ_K-1)


def q_pq_recall_at_5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization ANN gate (Jegou et al. 2011): split each 64-dim
    vector into 8 subvectors, encode each against an 8-codeword subspace
    codebook (64 bits/vector -- a 32x compression over float32), then
    answer vec-0's top-5 by ASYMMETRIC DISTANCE COMPUTATION: the query's 64
    query-to-codeword distances are tabulated once and each candidate's
    approximate distance is 8 table lookups. Reports recall@5 vs the exact
    scan plus the corpus-wide quantization error.

    Codebooks here are SEEDED (subvectors of vectors 0..7, embedded as an
    ~4 KB literal like the hyperplane planes and the bloom filter) --
    codebook TRAINING plugs in via the q_kmeans_clusters template per
    subspace; this gate pins the encode/ADC mechanics that training would
    reuse. Scale shape: encoding and ADC are pure projections (no shuffle,
    no join -- the codebook rides in the closure); top-5 is
    TakeOrderedAndProject. Float parity: every subspace distance is a
    left-to-right fold, and all cross-row sums go through DECIMAL casts,
    so results are bit-identical across engines and partitionings."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = e.select("vec_id", _to_double(F.col("embedding")).alias("v"))
    cw = [list(r["v"]) for r in emb.filter(F.col("vec_id") < PQ_K).orderBy("vec_id").collect()]
    if not cw:
        # empty corpus -> no seed vectors -> no codebook; mirror the
        # oracle's degenerate answer (0 hits, recall 0, NULL error) instead
        # of building element_at() over an empty literal
        return spark.createDataFrame([(0,)], "n_hits int").select(
            "n_hits",
            (F.col("n_hits") / 5.0).alias("recall_at_5"),
            F.lit(None).cast("double").alias("total_quant_err"),
        )
    dec = "decimal(25,12)"

    df = emb.crossJoin(
        F.broadcast(emb.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv")))
    )
    quant_terms = []
    adc_terms = []
    for m in range(PQ_M):
        off = m * PQ_SUB + 1
        sub = F.slice(F.col("v"), off, PQ_SUB)
        qsub = F.slice(F.col("qv"), off, PQ_SUB)
        # slice each codeword's subvector in PYTHON and inject it as a
        # PQ_SUB-element literal: the previous shape carried the whole
        # codebook as a per-row array column and re-ran element_at + slice
        # over it 2*PQ_K times per subspace per row -- 128 runtime slices
        # of a 64x8 literal per row that are all loop-invariant
        # (OPTIMIZATION_r14, guide §1.2 per-task work; identical operands,
        # so identical arithmetic and hash)
        sub_cw = [c[m * PQ_SUB : m * PQ_SUB + PQ_SUB] for c in cw]
        dists_m = F.array(
            *[_sqdist(sub, F.lit(sub_cw[k])) for k in range(PQ_K)]
        )
        # argmin, ties to the lowest code id: array_position returns the
        # FIRST index holding the minimum
        code_m = F.array_position(dists_m, F.array_min(dists_m)).cast("int")
        dq_m = F.array(
            *[_sqdist(qsub, F.lit(sub_cw[k])) for k in range(PQ_K)]
        )
        quant_terms.append(F.array_min(dists_m).cast(dec))
        adc_terms.append(F.element_at(dq_m, code_m).cast(dec))
    row_quant = quant_terms[0]
    row_adc = adc_terms[0]
    for t in quant_terms[1:]:
        row_quant = row_quant + t
    for t in adc_terms[1:]:
        row_adc = row_adc + t
    scored = df.select(
        "vec_id", row_quant.alias("qe"), row_adc.cast("double").alias("approx_d")
    ).localCheckpoint()
    approx5 = (
        scored.filter(F.col("vec_id") != 0)
        .orderBy("approx_d", "vec_id")
        .limit(5)
        .select("vec_id")
    )
    q0 = emb.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    exact5 = (
        emb.crossJoin(F.broadcast(q0))
        .filter(F.col("vec_id") != 0)
        .select("vec_id", _sqdist(F.col("v"), F.col("qv")).alias("d"))
        .orderBy("d", "vec_id")
        .limit(5)
        .select("vec_id")
    )
    hits = approx5.join(exact5, "vec_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_hits")
    )
    tot = scored.agg(F.sum("qe").cast("double").alias("total_quant_err"))
    return hits.crossJoin(tot).select(
        "n_hits", (F.col("n_hits") / 5.0).alias("recall_at_5"), "total_quant_err"
    )


NDCG_K = 5  # evaluates the multiprobe ANN list against the exact top-5


def _ndcg_discounts() -> list[float]:
    """1/log2(i+1) per position, computed ONCE in Python and injected as
    literals on both engines -- the gate needs no runtime libm at all."""
    import math

    return [1.0 / math.log2(i + 1) for i in range(1, NDCG_K + 1)]


def q_ann_ndcg_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded ranking quality of the ANN list: nDCG@5 of multi-probe LSH
    against the exact cosine ranking (relevance = 6 - exact_rank, 0 for
    docs outside the exact top-5). recall@5 says WHETHER the right docs
    surface; nDCG says whether they surface in the right ORDER -- the
    second number an index build gates on. Both lists and the positional
    discounts are deterministic, so the score is a hash-exact row."""
    from pyspark.sql.window import Window

    disc = _ndcg_discounts()
    idcg = sum((NDCG_K + 1 - r) * disc[r - 1] for r in range(1, NDCG_K + 1))
    ann = q_ann_multiprobe_topk(spark, sf_dir).select(
        "vec_id",
        F.row_number().over(Window.orderBy(F.col("cosine").desc(), "vec_id")).alias("i"),
    )
    exact = q_cosine_topk(spark, sf_dir).limit(NDCG_K).select(
        "vec_id",
        F.row_number().over(Window.orderBy(F.col("cosine").desc(), "vec_id")).alias("r"),
    )
    disc_col = F.element_at(F.array(*[F.lit(d) for d in disc]), F.col("i"))
    rel = F.coalesce(F.lit(NDCG_K + 1) - F.col("r"), F.lit(0))
    from pgsf_spark.analytics.oracle_utils import dsum

    return (
        ann.join(exact, "vec_id", "left")
        .select((rel * disc_col).alias("g"), F.col("r").isNotNull().cast("int").alias("hit"))
        .agg(
            F.sum("hit").cast("int").alias("n_hits"),
            F.round(dsum(F.col("g"), "decimal(18,12)"), 6).alias("dcg"),
            F.round(F.lit(idcg), 6).alias("idcg"),
            F.round(dsum(F.col("g"), "decimal(18,12)") / F.lit(idcg), 6).alias("ndcg"),
        )
    )


# --- IVF-PQ (the production ANN index shape) --------------------------------

IVFPQ_C = 8  # coarse centroids (seeded: vectors 0..C-1)
IVFPQ_NPROBE = 2  # probed inverted lists per query


def q_ivfpq_recall_at_5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ, composed end-to-end (Jegou et al. 2011, the index behind
    faiss's IVFxx,PQyy -- THE production ANN architecture): a coarse
    quantizer routes each vector to an inverted list, PQ encodes the
    RESIDUAL (v - centroid) at 64 bits, and a query probes only the
    NPROBE nearest lists, scoring candidates by asymmetric distance with a
    per-list query-residual lookup table. Reports recall@5 vs the exact
    scan and how many candidates the probe actually touched -- the
    recall-vs-scan-fraction trade in one hash-green row.

    Seeding: coarse centroids are vectors 0..C-1 and residual codebooks
    are the residuals of vectors 0..PQ_K-1 (training plugs in via the
    q_kmeans_clusters template; this gate pins routing, residual encode,
    probe, and ADC mechanics). Scale shape: assignment/encode are
    broadcast-crossJoin projections (vectors never shuffle); the probe
    filter is a broadcast semi-join on the list id, so the scored relation
    is corpus_size * nprobe / C, not the corpus; top-5 is
    TakeOrderedAndProject. Every subspace distance is a left-to-right
    fold; cross-row sums go through DECIMAL -- bit-identical across
    engines (the DuckDB oracle recomputes centroids, residuals, codes, and
    lookup tables from the same seeds)."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "embeddings")
    emb = e.select("vec_id", _to_double(F.col("embedding")).alias("v"))
    cc = emb.filter(F.col("vec_id") < IVFPQ_C).select(
        F.col("vec_id").cast("int").alias("cid"), F.col("v").alias("cv")
    )
    # shuffle-free coarse assignment: fold the C centroids into one array
    # row, argmin by (d, cid) via array_min over structs -- field-by-field
    # struct ordering IS the (d ASC, cid ASC) tie-break of the previous
    # row_number window, and cid is unique so the trailing cv field is
    # never compared. The previous shape exploded every vector C-fold and
    # shuffled those wide rows (two 64-double arrays each) on vec_id
    # (OPTIMIZATION_r14, guide §2.4; same device as _assign_nearest).
    ccs = cc.agg(F.array_sort(F.collect_list(F.struct("cid", "cv"))).alias("ccs"))
    best = F.array_min(
        F.transform(
            F.col("ccs"),
            lambda c: F.struct(
                _sqdist(F.col("v"), c["cv"]).alias("d"),
                c["cid"].alias("cid"),
                c["cv"].alias("cv"),
            ),
        )
    )
    assigned = (
        emb.crossJoin(F.broadcast(ccs))
        .select("vec_id", "v", best.alias("best"))
        .select(
            "vec_id",
            "v",
            F.col("best.cid").alias("cid"),
            F.col("best.cv").alias("cv"),
        )
    )
    res = assigned.withColumn("r", F.zip_with("v", "cv", lambda a, b: a - b)).select(
        "vec_id", "cid", "r"
    )
    cwr = [list(x["r"]) for x in res.filter(F.col("vec_id") < PQ_K).orderBy("vec_id").collect()]
    if not cwr:
        return spark.createDataFrame([(0,)], "n_hits int").select(
            "n_hits",
            (F.col("n_hits") / 5.0).alias("recall_at_5"),
            (F.col("n_hits") / 5.0).alias("routing_recall_at_5"),
            F.lit(0).cast("bigint").alias("n_candidates"),
        )
    q0 = emb.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    wp = Window.orderBy("qd", "cid")
    probes = (
        cc.crossJoin(F.broadcast(q0))
        .withColumn("qd", _sqdist(F.col("cv"), F.col("qv")))
        .withColumn("prn", F.row_number().over(wp))
        .filter(F.col("prn") <= IVFPQ_NPROBE)
        .withColumn("qr", F.zip_with("qv", "cv", lambda a, b: a - b))
        .select("cid", "qr")
    )
    cand = res.join(F.broadcast(probes), "cid").filter(F.col("vec_id") != 0)
    dec = "decimal(25,12)"
    adc_terms = []
    for m in range(PQ_M):
        off = m * PQ_SUB + 1
        sub = F.slice(F.col("r"), off, PQ_SUB)
        qsub = F.slice(F.col("qr"), off, PQ_SUB)
        # codeword subvectors sliced in PYTHON and injected as literals
        # instead of carrying the whole residual codebook as a per-row
        # column and re-slicing it 2*PQ_K times per subspace per row
        # (same change as q_pq_recall_at_5: identical operands, identical
        # arithmetic, loop-invariant work hoisted off the per-row path)
        sub_cw = [c[m * PQ_SUB : m * PQ_SUB + PQ_SUB] for c in cwr]
        dists_m = F.array(
            *[_sqdist(sub, F.lit(sub_cw[k])) for k in range(PQ_K)]
        )
        code_m = F.array_position(dists_m, F.array_min(dists_m)).cast("int")
        dq_m = F.array(
            *[_sqdist(qsub, F.lit(sub_cw[k])) for k in range(PQ_K)]
        )
        adc_terms.append(F.element_at(dq_m, code_m).cast(dec))
    ad = adc_terms[0]
    for t in adc_terms[1:]:
        ad = ad + t
    scored = cand.select("vec_id", ad.cast("double").alias("ad")).localCheckpoint()
    approx5 = scored.orderBy("ad", "vec_id").limit(5).select("vec_id")
    exact5 = (
        emb.crossJoin(F.broadcast(q0))
        .filter(F.col("vec_id") != 0)
        .select("vec_id", _sqdist(F.col("v"), F.col("qv")).alias("d"))
        .orderBy("d", "vec_id")
        .limit(5)
        .select("vec_id")
    )
    exact5 = exact5.localCheckpoint()
    hits = approx5.join(exact5, "vec_id").agg(F.count(F.lit(1)).cast("int").alias("n_hits"))
    ncand = scored.agg(F.count(F.lit(1)).alias("n_candidates"))
    # routing recall: how many exact neighbors land in a PROBED list at all
    # -- separates coarse-quantizer loss from residual-ADC ranking loss
    routed = (
        exact5.join(res.select("vec_id", "cid"), "vec_id")
        .join(F.broadcast(probes.select("cid")), "cid")
        .agg(F.count(F.lit(1)).cast("int").alias("n_routed"))
    )
    return (
        hits.crossJoin(F.broadcast(ncand))
        .crossJoin(F.broadcast(routed))
        .select(
            "n_hits",
            (F.col("n_hits") / F.lit(5.0)).alias("recall_at_5"),
            (F.col("n_routed") / F.lit(5.0)).alias("routing_recall_at_5"),
            "n_candidates",
        )
    )


def q_triplet_margin_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-pair mining statistics: for every anchor vector, the
    hardest positive (farthest same-label candidate) and hardest negative
    (nearest different-label candidate) among its LSH-bucket candidates,
    rolled up per label as mean triplet margin (d_neg - d_pos) and the
    violation count (margin < 0) -- the mining pass that feeds triplet /
    contrastive embedding training, and a label-quality audit for free
    (negative margins = probable mislabels or collapsed classes).

    Scale shape: candidates come from the hyperplane-LSH bucket equi-join
    (never all-pairs); per-anchor extremes are one keyed aggregate; the
    label rollup is |labels|-sized. Distances are left-to-right folds,
    margins go through DECIMAL -- hash-exact."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = e.select(
        "vec_id", F.col("label").cast("int").alias("label"), _to_double(F.col("embedding")).alias("v")
    ).withColumn("bucket", hyperplane_lsh_bucket(F.col("v")))
    a = emb.select(
        F.col("vec_id").alias("ka"), F.col("label").alias("la"), F.col("v").alias("va"), "bucket"
    )
    b = emb.select(
        F.col("vec_id").alias("kb"), F.col("label").alias("lb"), F.col("v").alias("vb"), "bucket"
    )
    pairs = (
        a.join(b, "bucket")
        .filter(F.col("ka") != F.col("kb"))
        .select("ka", "la", "lb", _sqdist(F.col("va"), F.col("vb")).alias("d"))
    )
    per_anchor = pairs.groupBy("ka", "la").agg(
        F.max(F.when(F.col("la") == F.col("lb"), F.col("d"))).alias("d_pos"),
        F.min(F.when(F.col("la") != F.col("lb"), F.col("d"))).alias("d_neg"),
    )
    margin = (F.col("d_neg") - F.col("d_pos")).cast("decimal(25,12)")
    return (
        per_anchor.filter(F.col("d_pos").isNotNull() & F.col("d_neg").isNotNull())
        .groupBy(F.col("la").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n_anchors"),
            F.round(F.sum(margin).cast("double") / F.count(F.lit(1)), 6).alias("mean_margin"),
            F.sum((F.col("d_neg") < F.col("d_pos")).cast("bigint")).alias("n_violations"),
        )
    )


PCA_ITERS = 8
PCA_DIM = 64


def q_pca_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PCA, top TWO principal components (second via Hotelling
    deflation A - lambda1 v1 v1') with explained-variance ratios against
    the covariance trace: covariance via
    OUTER-PRODUCT partial aggregation (each row contributes its 64x64
    upper product map-side; the shuffle carries dim^2 = 4096 cells, the
    vectors themselves never shuffle), then PCA_ITERS unrolled power-
    iteration rounds ON THE CELL TABLE (matrix-vector product = join on j
    + per-i sum, normalize by the decimal-exact 2-norm) -- the same
    rounds-unrolled iterative template as k-means/PageRank/BPE, completing
    the in-engine linear-algebra family. Eigenvector sign is pinned by the
    deterministic uniform start (1/sqrt(dim) exactly 0.125 for dim=64).

    Covariance cells use E[x_i x_j] - mu_i mu_j from decimal-exact raw
    moments, so no centering pass touches the data. Output: per-dim
    loadings + the Rayleigh-quotient eigenvalue, rounded 6dp."""
    e = load_table(spark, sf_dir, "embeddings")
    x = e.select(F.col("embedding").alias("v"))
    # one explode per ordered pair: struct(i, j, xi*xj) for all 64x64
    pairs = x.select(
        F.explode(
            F.flatten(
                F.transform(
                    "v",
                    lambda xi, i: F.transform(
                        "v",
                        lambda xj, j: F.struct(
                            i.alias("i"),
                            j.alias("j"),
                            (xi.cast("double") * xj.cast("double")).alias("p"),
                        ),
                    ),
                )
            )
        ).alias("c")
    )
    dec = "decimal(27,10)"
    moments = pairs.select("c.i", "c.j", "c.p").groupBy("i", "j").agg(
        F.sum(F.col("p").cast(dec)).alias("s")
    )
    mu = x.select(F.posexplode("v").alias("i", "xi")).groupBy("i").agg(
        F.sum(F.col("xi").cast(dec)).alias("m")
    )
    n = x.count()  # tiny scalar, same literal in the oracle
    cells = (
        moments.join(mu.select(F.col("i").alias("i_"), F.col("m").alias("mi")), F.col("i") == F.col("i_"))
        .join(mu.select(F.col("i").alias("j_"), F.col("m").alias("mj")), F.col("j") == F.col("j_"))
        .select(
            "i",
            "j",
            (
                F.col("s").cast("double") / F.lit(float(n))
                - (F.col("mi").cast("double") / F.lit(float(n)))
                * (F.col("mj").cast("double") / F.lit(float(n)))
            ).alias("a"),
        )
        .localCheckpoint()
    )
    def power_iterate(c):
        v = spark.range(PCA_DIM).select(
            F.col("id").cast("int").alias("i"), F.lit(0.125).alias("x")
        )
        for _ in range(PCA_ITERS):
            mv = (
                c.join(v.select(F.col("i").alias("j"), F.col("x")), "j")
                .select("i", (F.col("a") * F.col("x")).alias("ax"))
                .groupBy("i")
                .agg(F.sum(F.col("ax").cast(dec)).cast("double").alias("y"))
            )
            norm = mv.agg(
                F.sqrt(F.sum((F.col("y") * F.col("y")).cast(dec)).cast("double")).alias("nm")
            )
            # checkpoint per round: v is referenced twice downstream, so the
            # lazy plan would otherwise double every round (2^ITERS replays
            # of the cell join -- measured 87s; checkpointed, ~2s). 64 rows.
            v = (
                mv.crossJoin(norm)
                .select("i", (F.col("y") / F.col("nm")).alias("x"))
                .localCheckpoint()
            )
        # Rayleigh quotient lambda = v' A v (v already unit)
        lam = (
            c.join(v.select(F.col("i").alias("j"), F.col("x").alias("xj")), "j")
            .join(v.select(F.col("i"), F.col("x").alias("xi")), "i")
            .agg(
                F.sum((F.col("xi") * F.col("a") * F.col("xj")).cast(dec))
                .cast("double")
                .alias("l")
            )
        )
        return v, lam

    v1, lam1 = power_iterate(cells)
    # Hotelling deflation: A2 = A - lambda1 * v1 v1', then iterate again --
    # the second component from the same template (checkpointed like cells)
    cells2 = (
        cells.join(v1.select(F.col("i").alias("j"), F.col("x").alias("xj")), "j")
        .join(v1.select(F.col("i"), F.col("x").alias("xi")), "i")
        .crossJoin(lam1.select(F.col("l").alias("l1")))
        .select(
            "i", "j", (F.col("a") - F.col("l1") * F.col("xi") * F.col("xj")).alias("a")
        )
        .localCheckpoint()
    )
    v2, lam2 = power_iterate(cells2)
    trace = cells.filter(F.col("i") == F.col("j")).agg(
        F.sum(F.col("a").cast(dec)).cast("double").alias("tr")
    )
    return (
        v1.select("i", F.col("x").alias("x1"))
        .join(v2.select("i", F.col("x").alias("x2")), "i")
        .crossJoin(lam1.select(F.col("l").alias("l1")))
        .crossJoin(lam2.select(F.col("l").alias("l2")))
        .crossJoin(trace)
        .select(
            (F.col("i") + 1).alias("dim"),
            F.round("x1", 6).alias("loading1"),
            F.round("x2", 6).alias("loading2"),
            F.round("l1", 6).alias("eigenvalue1"),
            F.round("l2", 6).alias("eigenvalue2"),
            F.round(F.col("l1") / F.col("tr"), 6).alias("evr1"),
            F.round(F.col("l2") / F.col("tr"), 6).alias("evr2"),
        )
        .orderBy("dim")
    )


MAT_Q = 8  # query vectors (vec_id < MAT_Q)
MAT_DIM = 32  # truncated prefix dims (of 64)
MAT_K = 5


def q_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation audit (Kusupati et al. 2022): recall@5 of
    cosine search over the FIRST MAT_DIM dims against the full-dimension
    ranking, averaged over MAT_Q query vectors -- the measurement that
    decides whether a prefix-truncated index (2x cheaper to store and
    scan) is good enough to serve retrieval, exactly the trade modern
    embedding APIs expose.

    Scale shape: the bounded query set broadcasts against one corpus
    scan; per-query top-5 is computed in TWO stages -- top-5 within each
    (query, doc_id mod 32) shard, then top-5 over the <=160 shard
    survivors -- so no rank window ever sees a corpus-sized partition
    (the exact-per-group top-k device a 1000-executor ranking job needs).
    Cosines round to 6 with vec_id tie-breaks before ranking, so the
    top-5 SETS are engine-exact."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = e.select("vec_id", _to_double(F.col("embedding")).alias("v"))
    q = emb.filter(F.col("vec_id") < MAT_Q).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    pairs = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(
                _dot(F.col("v"), F.col("qv"))
                / (F.sqrt(_dot(F.col("v"), F.col("v"))) * F.sqrt(_dot(F.col("qv"), F.col("qv")))),
                6,
            ).alias("cf"),
            F.round(
                _dot(F.slice(F.col("v"), 1, MAT_DIM), F.slice(F.col("qv"), 1, MAT_DIM))
                / (
                    F.sqrt(_dot(F.slice(F.col("v"), 1, MAT_DIM), F.slice(F.col("v"), 1, MAT_DIM)))
                    * F.sqrt(
                        _dot(F.slice(F.col("qv"), 1, MAT_DIM), F.slice(F.col("qv"), 1, MAT_DIM))
                    )
                ),
                6,
            ).alias("ch"),
            F.pmod(F.col("vec_id"), F.lit(32)).alias("shard"),
        )
        .localCheckpoint(eager=True)
    )
    from pyspark.sql.window import Window

    def topk(col: str):
        w1 = Window.partitionBy("qid", "shard").orderBy(F.col(col).desc(), "vec_id")
        w2 = Window.partitionBy("qid").orderBy(F.col(col).desc(), "vec_id")
        return (
            pairs.withColumn("r1", F.row_number().over(w1))
            .filter(F.col("r1") <= MAT_K)
            .withColumn("r2", F.row_number().over(w2))
            .filter(F.col("r2") <= MAT_K)
            .select("qid", "vec_id")
        )
    exact, approx = topk("cf"), topk("ch")
    nq = q.agg(F.count(F.lit(1)).cast("bigint").alias("n_queries"))
    hits = exact.join(approx, ["qid", "vec_id"]).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hits")
    )
    return (
        nq.crossJoin(F.broadcast(hits)).select(
            "n_queries",
            "n_hits",
            F.round(
                F.try_divide(F.col("n_hits"), F.lit(MAT_K) * F.col("n_queries")), 4
            ).alias("recall_at_5"),
        )
    )


MRR_Q = 8  # query vectors (vec_id 0..MRR_Q-1) scored by the MRR gate


def q_mrr_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean Reciprocal Rank of the IVF index over MRR_Q query vectors --
    the MULTI-query retrieval gate next to the single-query recall/nDCG
    gates: for each query, the "relevant" item is its exact brute-force
    top-1 neighbor, and rr = 1/rank of that item in the query's IVF
    candidate list (0 when the relevant item lands outside the probed
    cluster -- the miss mode MRR exists to expose). One number summarizes
    whether the index puts the RIGHT FIRST answer on top across a query
    workload, which is what an interactive retrieval SLA actually gates.

    Determinism: cosines are rounded to 4 on both faces before any
    comparison (the house ANN device); the relevant item is
    (max cosine, min vec_id); rank is COUNT-based (1 + #candidates
    strictly better under the same (cosine desc, vec_id asc) order), so
    no window over data-sized partitions exists anywhere. Per-query rr is
    rounded to 9 and decimal-summed into the mean.

    Scale shape: queries and centroids are broadcast (MRR_Q and C rows);
    the brute pass is ONE projection scan x MRR_Q (the exact-baseline
    audit cost, linear by design -- the serve path is the IVF side, which
    touches ~1/nlist of the data per query); ranks come from keyed
    aggregates, never a global sort."""
    e = load_table(spark, sf_dir, "embeddings")
    e = spread(e)  # no-op (no Exchange) when the scan is already wide
    emb = e.select("vec_id", _to_double(F.col("embedding")).alias("v"))
    cent = _label_centroids(e)
    # shuffle-free argmax-cosine assignment (see _assign_max_cosine: the
    # previous crossJoin + row_number window shuffled k wide rows per
    # vector on vec_id; this is a pure map with the same tie-break)
    assigned = _assign_max_cosine(emb, cent)
    # bounded materialization (MRR_Q rows): the query panel feeds the brute
    # pass, the candidate pass, and the broadcast -- without it each
    # reference re-runs the full centroid-assignment scan
    queries = (
        assigned.filter(F.col("vec_id") < MRR_Q)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("v").alias("qv"),
            F.col("cluster").alias("qcluster"),
        )
        .localCheckpoint(eager=True)
    )
    cos_q = F.round(
        _dot(F.col("v"), F.col("qv"))
        / (
            F.sqrt(_dot(F.col("v"), F.col("v")))
            * F.sqrt(_dot(F.col("qv"), F.col("qv")))
        ),
        4,
    )
    brute = (
        emb.crossJoin(F.broadcast(queries.select("qid", "qv")))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", cos_q.alias("cos"))
    )
    mx = brute.groupBy("qid").agg(F.max("cos").alias("mc"))
    # bounded materialization (one row per query): the exact-baseline
    # answer set is joined into the candidate scoring below; without it
    # the brute corpus pass re-runs per consumer
    top1 = (
        brute.join(F.broadcast(mx), "qid")
        .filter(F.col("cos") == F.col("mc"))
        .groupBy("qid")
        .agg(F.min("vec_id").alias("rel_id"), F.first("mc").alias("rel_cos"))
        .localCheckpoint(eager=True)
    )
    cand = (
        assigned.join(F.broadcast(queries), F.col("cluster") == F.col("qcluster"))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", cos_q.alias("cos"))
    )
    scored = cand.join(F.broadcast(top1), "qid").select(
        "qid",
        (
            (F.col("cos") > F.col("rel_cos"))
            | ((F.col("cos") == F.col("rel_cos")) & (F.col("vec_id") < F.col("rel_id")))
        )
        .cast("long")
        .alias("better"),
        (F.col("vec_id") == F.col("rel_id")).cast("long").alias("hit"),
    )
    per_q = scored.groupBy("qid").agg(
        F.sum("better").alias("nb"),
        F.max("hit").alias("found"),
        F.count(F.lit(1)).alias("n_cand"),
    )
    rr = F.when(
        F.col("found") == 1, F.round(1.0 / (1.0 + F.col("nb").cast("double")), 9)
    ).otherwise(F.lit(0.0))
    per_query = queries.select("qid").join(per_q, "qid", "left").select(
        F.coalesce(F.col("found"), F.lit(0)).alias("found"),
        F.coalesce(rr, F.lit(0.0)).cast("decimal(18,9)").alias("rr"),
        F.coalesce(F.col("n_cand"), F.lit(0)).alias("n_cand"),
    )
    return per_query.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        F.sum("found").cast("bigint").alias("n_hits"),
        F.round(F.sum("rr").cast("double") / F.count(F.lit(1)), 6).alias("mrr"),
        F.sum("n_cand").cast("bigint").alias("total_candidates"),
    )


MAHA_TOP = 10  # outliers reported by the diagonal-Mahalanobis gate


def q_embedding_outlier_mahalanobis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-MAHA_TOP embedding outliers by DIAGONAL Mahalanobis distance --
    the curation gate that catches corrupt or out-of-distribution vectors
    before they poison an ANN index or a centroid fit: score(v) =
    sum_i (v_i - mu_i)^2 / var_i, which standardizes each dimension (a
    plain L2 norm lets one high-variance dimension drown the rest; the
    full covariance inverse is unnecessary for the screening use and
    doesn't decompose into a scan).

    Exactness: per-dimension means and variances come from exact decimal
    moments (the _label_centroids device, corpus-wide); the score is a
    SEQUENTIAL fold over dimensions (F.aggregate, matching the oracle's
    left-to-right unrolled sum exactly like _dot/_dot_sql), rounded to 4.

    Plan: one posexplode aggregate to the 64-row moment table, broadcast
    back, one projection scan with a top-k (TakeOrderedAndProject) -- the
    same brute-scan shape as q_cosine_topk, linear and shuffle-free past
    the moment table."""
    e = load_table(spark, sf_dir, "embeddings")
    e = spread(e)  # no-op (no Exchange) when the scan is already wide
    emb = e.select("vec_id", _to_double(F.col("embedding")).alias("v"))
    pos = emb.select(F.posexplode("v").alias("i", "x"))
    dsq = F.col("x").cast("decimal(18,9)")
    mom = (
        pos.groupBy("i")
        .agg(
            (F.sum(dsq).cast("double") / F.count("x")).alias("mu"),
            F.count("x").alias("n"),
            F.sum(dsq * dsq).cast("double").alias("sxx"),
        )
        .select(
            "i",
            "mu",
            (
                F.col("sxx") / F.col("n").cast("double") - F.col("mu") * F.col("mu")
            ).alias("var"),
        )
    )
    stats = mom.groupBy().agg(
        F.array_sort(F.collect_list(F.struct("i", "mu", "var"))).alias("pairs")
    ).select(
        F.transform("pairs", lambda p: p.mu).alias("mu"),
        F.transform("pairs", lambda p: p["var"]).alias("vr"),
    )
    diffs = F.zip_with(F.col("v"), F.col("mu"), lambda x, m: x - m)
    terms = F.zip_with(diffs, F.col("vr"), lambda d, s: d * d / s)
    score = F.aggregate(terms, F.lit(0.0), lambda acc, t: acc + t)
    return (
        emb.crossJoin(F.broadcast(stats))
        .select("vec_id", F.round(score, 4).alias("mahalanobis_sq"))
        .orderBy(F.col("mahalanobis_sq").desc(), "vec_id")
        .limit(MAHA_TOP)
    )


KNN_Q = 16  # leave-one-out probe panel size
KNN_K = 5  # neighbors voting


def q_knn_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out k-NN label accuracy over a KNN_Q-vector probe panel
    -- the embedding-quality gate that asks whether the space RESPECTS the
    label structure (recall@k asks whether an index finds neighbors; this
    asks whether the neighbors mean anything): each panel vector's KNN_K
    exact nearest neighbors vote on its label (majority, ties to the
    smallest label), and the gate reports the panel accuracy.

    Determinism: cosines rounded to 4, neighbor order (cosine desc,
    vec_id), vote winner (count desc, label asc) -- total orders
    everywhere. Top-k uses the two-stage SHARDED window device from
    q_matryoshka_recall (per-(query, vec_id%32) top-k, then top-k over
    the 32k survivors), so no data-sized single partition exists; the
    vote window runs over <= 10 label rows per query.

    Plan: one scan crossed with the broadcast panel, two bounded windows,
    two small aggregates."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "embeddings")
    e = spread(e)  # no-op (no Exchange) when the scan is already wide
    emb = e.select(
        "vec_id", F.col("label").cast("int").alias("label"), _to_double(F.col("embedding")).alias("v")
    )
    panel = emb.filter(F.col("vec_id") < KNN_Q).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("true_label"),
        F.col("v").alias("qv"),
    )
    cos = F.round(
        _dot(F.col("v"), F.col("qv"))
        / (
            F.sqrt(_dot(F.col("v"), F.col("v")))
            * F.sqrt(_dot(F.col("qv"), F.col("qv")))
        ),
        4,
    )
    pairs = (
        emb.crossJoin(F.broadcast(panel))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "true_label",
            "vec_id",
            "label",
            cos.alias("cos"),
            F.pmod(F.col("vec_id"), F.lit(32)).alias("shard"),
        )
    )
    w1 = Window.partitionBy("qid", "shard").orderBy(F.col("cos").desc(), "vec_id")
    w2 = Window.partitionBy("qid").orderBy(F.col("cos").desc(), "vec_id")
    topk = (
        pairs.withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= KNN_K)
        .withColumn("r2", F.row_number().over(w2))
        .filter(F.col("r2") <= KNN_K)
    )
    votes = topk.groupBy("qid", "true_label", "label").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wv = Window.partitionBy("qid").orderBy(F.col("cnt").desc(), "label")
    pred = (
        votes.withColumn("rv", F.row_number().over(wv))
        .filter(F.col("rv") == 1)
        .select(
            "qid",
            (F.col("label") == F.col("true_label")).cast("long").alias("correct"),
            F.col("cnt").alias("votes"),
        )
    )
    return pred.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        F.sum("correct").cast("bigint").alias("n_correct"),
        F.round(F.sum("correct").cast("double") / F.count(F.lit(1)), 6).alias("accuracy"),
        F.round(
            F.sum("votes").cast("double") / (F.count(F.lit(1)) * F.lit(float(KNN_K))), 6
        ).alias("avg_winner_share"),
    )


KCENTER_K = 8  # coreset size (greedy 2-approximation rounds)


def q_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset over the embedding table -- the
    DIVERSITY-maximizing sample selector for training-data curation
    (random sampling over-picks dense clusters; the farthest-first
    traversal guarantees a 2-approximation of the optimal covering
    radius, so KCENTER_K rows summarize the embedding space's extent):
    start from vec_id 0, then KCENTER_K - 1 times pick the vector
    farthest (squared L2) from every center chosen so far.

    Determinism: distances round to 6 before any comparison; the argmax
    is (max dist, min vec_id) via two keyed aggregates -- no data-sized
    window. Each round's running min-distance column is checkpointed (the
    house kmeans lesson: unrolled rounds must not replay the chain).

    Plan: KCENTER_K scans, each a broadcast of ONE new center vector and
    one keyed aggregate; the farthest-point argmax never sorts. Output:
    the chosen centers in selection order with the coverage radius at
    selection time (dist_sq of the newly chosen point = how badly the
    previous centers covered the space)."""
    e = load_table(spark, sf_dir, "embeddings")
    e = spread(e)  # no-op (no Exchange) when the scan is already wide
    emb = e.select("vec_id", _to_double(F.col("embedding")).alias("v")).localCheckpoint(
        eager=True
    )
    c0 = emb.filter(F.col("vec_id") == 0).select(F.col("v").alias("cv"))
    md = (
        emb.crossJoin(F.broadcast(c0))
        .select("vec_id", "v", F.round(_sqdist(F.col("v"), F.col("cv")), 6).alias("md"))
        .localCheckpoint(eager=True)
    )
    if md.first() is None:  # empty table (or no seed vector): stable empty result
        return spark.createDataFrame(
            [], "center_rank int, vec_id bigint, dist_sq double, radius double"
        )
    chosen = [(0, 0, 0.0)]  # (rank, vec_id placeholder resolved at build)
    picked = []
    for r in range(1, KCENTER_K):
        mx = md.filter(~F.col("vec_id").isin([0, *picked])).agg(F.max("md").alias("mx"))
        nxt = (
            md.crossJoin(F.broadcast(mx))
            .filter((F.col("md") == F.col("mx")) & ~F.col("vec_id").isin([0, *picked]))
            .groupBy()
            .agg(F.min("vec_id").alias("nid"), F.first("mx").alias("nd"))
        ).first()
        if nxt is None or nxt.nid is None:  # fewer than KCENTER_K vectors
            break
        picked.append(int(nxt.nid))
        chosen.append((r, int(nxt.nid), float(nxt.nd)))
        cv = emb.filter(F.col("vec_id") == nxt.nid).select(F.col("v").alias("cv"))
        md = (
            md.crossJoin(F.broadcast(cv))
            .select(
                "vec_id",
                "v",
                F.least(
                    F.col("md"), F.round(_sqdist(F.col("v"), F.col("cv")), 6)
                ).alias("md"),
            )
            .localCheckpoint(eager=True)
        )
    rows = [(r, vid, float(d)) for r, vid, d in chosen]
    out = spark.createDataFrame(rows, "center_rank int, vec_id bigint, dist_sq double")
    radius = md.filter(~F.col("vec_id").isin([0, *picked])).agg(
        F.round(F.max("md"), 6).alias("radius")
    )
    return (
        out.crossJoin(F.broadcast(radius))
        .select("center_rank", "vec_id", F.round("dist_sq", 6).alias("dist_sq"), "radius")
        .orderBy("center_rank")
    )


SQ_MSE_BITS = (8, 4, 2)  # bit budgets audited by the quantization-error gate


def q_sq_mse_by_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantization reconstruction error by bit budget -- the
    memory-vs-fidelity table behind the choice q_sq_recall_at_5 gates
    only at 8 bits: per bits b in SQ_MSE_BITS, quantize each dimension to
    2^b - 1 levels on its min/max range (the same quantizer as
    _sq_quantized) and report MSE, RMSE, and the worst absolute error of
    the reconstruction.  An index owner reads this next to the recall
    gate to pick the coarsest budget whose error is still below the
    score-margin noise floor.

    Exactness: per-value errors are fixed double chains off exact
    min/max ranges; e^2 terms round to 12 and decimal-sum, so MSE is
    order-independent; constant dimensions (hi == lo) contribute zero on
    both faces.

    Plan: one posexplode, one 64-row range aggregate broadcast back,
    one pass per bit budget over the (vec, dim) frame -- three keyed
    aggregates, no windows."""
    e = load_table(spark, sf_dir, "embeddings")
    e = spread(e)  # no-op (no Exchange) when the scan is already wide
    emb = e.select("vec_id", _to_double(F.col("embedding")).alias("v"))
    pos = emb.select(F.posexplode("v").alias("i", "x"))
    rng = pos.groupBy("i").agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    j = pos.join(F.broadcast(rng), "i").select("x", "lo", "hi")
    parts = []
    for b in SQ_MSE_BITS:
        levels = float(2**b - 1)
        x, lo, hi = F.col("x"), F.col("lo"), F.col("hi")
        err = F.when(hi == lo, F.lit(0.0)).otherwise(
            x - (lo + F.round((x - lo) / (hi - lo) * levels, 0) * (hi - lo) / levels)
        )
        sq_t = F.round(err * err, 12).cast("decimal(27,12)")
        g = j.select(err.alias("err"), sq_t.alias("t")).agg(
            F.count(F.lit(1)).alias("n_values"),
            (F.sum("t").cast("double") / F.count(F.lit(1))).alias("m"),
            F.max(F.abs(F.col("err"))).alias("mx"),
        )
        parts.append(
            g.select(
                F.lit(b).alias("bits"),
                F.col("n_values").cast("bigint").alias("n_values"),
                F.round(F.col("m"), 8).alias("mse"),
                F.round(F.sqrt(F.col("m")), 6).alias("rmse"),
                F.round(F.col("mx"), 6).alias("max_abs_err"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy(F.col("bits").desc())


ECOD_TOP = 10  # outliers reported by the rank-based screen


def q_ecod_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ECOD-style rank-based embedding outliers -- the distribution-free
    companion to q_embedding_outlier_mahalanobis (moments break under
    heavy tails; empirical CDFs don't): each vector's score sums, over
    dimensions, the smaller log tail mass -ln(min(F(x), 1 - F(x-)))
    of its per-dimension EMPIRICAL CDF -- a point deep in either tail of
    many dimensions scores high with no distributional assumption
    (Li et al.'s ECOD, simplified to the two-sided tail form).

    Exactness: ECDF masses are exact integer ranks over per-dimension
    distinct-value tables (the mann_whitney cumulative device, partitioned
    BY DIMENSION -- never a global window); each -ln rounds to 9 and
    decimal-sums across the 64 dimensions per vector.

    Plan: one posexplode, one (dim, value)-keyed aggregate, a cumulative
    window per dimension over its distinct values, one join back on
    (dim, value), one vector-keyed sum, one top-k."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "embeddings")
    e = spread(e)  # no-op (no Exchange) when the scan is already wide
    emb = e.select("vec_id", _to_double(F.col("embedding")).alias("v"))
    pos = emb.select("vec_id", F.posexplode("v").alias("i", "x"))
    by_val = pos.groupBy("i", "x").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("i").orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    wp = Window.partitionBy("i").orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
    n_per_dim = Window.partitionBy("i")
    ranked = by_val.select(
        "i",
        "x",
        F.sum("c").over(w).alias("cle"),  # count <= x
        F.coalesce(F.sum("c").over(wp), F.lit(0)).alias("clt"),  # count < x
        F.sum("c").over(n_per_dim).alias("n"),
    )
    lo = F.col("cle").cast("double") / F.col("n").cast("double")  # F(x)
    hi = (F.col("n") - F.col("clt")).cast("double") / F.col("n").cast("double")  # 1-F(x-)
    term = F.round(-F.log(F.least(lo, hi)), 9).cast("decimal(18,9)")
    scored = pos.join(ranked.select("i", "x", term.alias("t")), ["i", "x"])
    return (
        scored.groupBy("vec_id")
        .agg(F.sum("t").cast("double").alias("ecod_score"))
        .select("vec_id", F.round("ecod_score", 6).alias("ecod_score"))
        .orderBy(F.col("ecod_score").desc(), "vec_id")
        .limit(ECOD_TOP)
    )


def q_calinski_harabasz_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calinski-Harabasz index of the LABEL clustering over the embedding
    table -- the variance-ratio cluster-quality number (between-cluster
    dispersion over within-cluster dispersion, scaled by (n-k)/(k-1));
    higher = tighter, better-separated clusters.  The evaluation the
    kmeans/centroid shelf reports when someone asks "are the labels even
    geometrically real?".

    Exactness: per-(label, dimension) first and second moments accumulate
    in DECIMAL; each cell's within contribution s2 - s1^2/n and between
    contribution n_c (mu_c - mu)^2 is a fixed double chain rounded to 9
    and decimal-summed over the <= k x 64 cell rows.

    Plan: one posexplode aggregate keyed on (label, dim), a broadcast
    64-row global margin, everything after on bounded rows."""
    e = load_table(spark, sf_dir, "embeddings")
    e = spread(e)  # no-op (no Exchange) when the scan is already wide
    pos = e.select(
        F.col("label").cast("int").alias("label"),
        F.posexplode(_to_double(F.col("embedding"))).alias("i", "x"),
    )
    dsq = F.col("x").cast("decimal(18,9)")
    cell = pos.groupBy("label", "i").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dsq).alias("s1"),
        F.sum(dsq * dsq).alias("s2"),
    )
    glob = cell.groupBy("i").agg(
        F.sum("n").alias("gn"), F.sum("s1").alias("g1")
    )
    j = cell.join(F.broadcast(glob), "i")
    nd = F.col("n").cast("double")
    s1d, s2d = F.col("s1").cast("double"), F.col("s2").cast("double")
    mu_c = s1d / nd
    mu_g = F.col("g1").cast("double") / F.col("gn").cast("double")
    wterm = F.round(s2d - s1d * s1d / nd, 9).cast("decimal(27,9)")
    bterm = F.round(nd * (mu_c - mu_g) * (mu_c - mu_g), 9).cast("decimal(27,9)")
    sizes = e.groupBy().agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.countDistinct(F.col("label")).alias("k"),
    )
    g = j.agg(
        F.sum(wterm).cast("double").alias("w"),
        F.sum(bterm).cast("double").alias("b"),
    )
    out = g.crossJoin(F.broadcast(sizes))
    n, k = F.col("n_vectors").cast("double"), F.col("k").cast("double")
    ch = F.try_divide(
        F.col("b") / (k - 1), F.col("w") / (n - k)
    )
    return out.select(
        F.col("n_vectors").cast("bigint").alias("n_vectors"),
        F.col("k").cast("bigint").alias("k"),
        F.round("b", 4).alias("between_ss"),
        F.round("w", 4).alias("within_ss"),
        F.round(ch, 6).alias("ch_index"),
    )


SIL_PANEL = 16  # silhouette probe panel (vec_id < SIL_PANEL)


def q_silhouette_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silhouette scores for a SIL_PANEL-vector probe panel against the
    label clustering -- the per-point companion to the CH index (CH is a
    global ratio; silhouette says WHICH points sit badly): s = (b - a) /
    max(a, b) with a = mean distance to the own cluster (self excluded)
    and b = the closest other cluster's mean distance; s near -1 flags a
    probably-mislabeled vector.

    Determinism: distances are rounded Euclidean (sqrt of the _sqdist
    fold, rounded 6); per-(probe, cluster) means decimal-sum the rounded
    distances; the b argmin is (min mean, min label) via one keyed
    aggregate.

    Plan: the panel is a broadcast; one scan crossed with it, one
    (probe, label) rollup, bounded algebra after."""
    e = load_table(spark, sf_dir, "embeddings")
    e = spread(e)  # no-op (no Exchange) when the scan is already wide
    emb = e.select(
        "vec_id", F.col("label").cast("int").alias("label"), _to_double(F.col("embedding")).alias("v")
    )
    # bounded materialization (SIL_PANEL rows): the probe panel is crossed
    # with the corpus AND re-read by the final projection; without it each
    # reference re-scans embeddings
    panel = (
        emb.filter(F.col("vec_id") < SIL_PANEL)
        .select(
            F.col("vec_id").alias("pid"),
            F.col("label").alias("plabel"),
            F.col("v").alias("pv"),
        )
        .localCheckpoint(eager=True)
    )
    dist = F.round(F.sqrt(_sqdist(F.col("v"), F.col("pv"))), 6)
    pairs = (
        emb.crossJoin(F.broadcast(panel))
        .filter(F.col("vec_id") != F.col("pid"))
        .select("pid", "plabel", "label", dist.cast("decimal(18,6)").alias("d"))
    )
    # bounded materialization (SIL_PANEL x clusters rows): the own-cluster
    # and closest-other consumers would otherwise each re-run the corpus
    # cross pass
    per_cluster = (
        pairs.groupBy("pid", "plabel", "label")
        .agg((F.sum("d").cast("double") / F.count(F.lit(1))).alias("md"))
        .localCheckpoint(eager=True)
    )
    own = per_cluster.filter(F.col("label") == F.col("plabel")).select(
        "pid", F.col("md").alias("a")
    )
    other_min = per_cluster.filter(F.col("label") != F.col("plabel")).groupBy("pid").agg(
        F.min("md").alias("b")
    )
    scored = (
        panel.select("pid", "plabel")
        .join(own, "pid", "left")
        .join(other_min, "pid", "left")
        .select(
            F.col("pid").alias("vec_id"),
            F.col("plabel").alias("label"),
            F.round("a", 6).alias("mean_own_dist"),
            F.round("b", 6).alias("mean_other_dist"),
            F.round(
                F.try_divide(F.col("b") - F.col("a"), F.greatest("a", "b")), 6
            ).alias("silhouette"),
        )
    )
    mean = scored.agg(
        F.round(
            F.sum(F.coalesce(F.col("silhouette"), F.lit(0.0)).cast("decimal(18,9)")).cast(
                "double"
            )
            / F.count(F.lit(1)),
            6,
        ).alias("panel_mean")
    )
    return (
        scored.crossJoin(F.broadcast(mean))
        .orderBy("vec_id")
    )


def q_embedding_effective_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective rank (participation ratio) of the embedding covariance
    -- the representation-collapse diagnostic (RankMe-family: how many
    directions does the embedding space REALLY use; 64 = isotropic,
    ~1 = collapsed to a line) computed without any eigensolve:
    PR = (sum_i lambda_i)^2 / sum_i lambda_i^2 = trace(C)^2 / ||C||_F^2,
    both invariants read directly off the covariance cells.

    Exactness: raw second moments and dim means accumulate in exact
    DECIMAL via the PCA outer-product device; each covariance cell is
    the fixed chain round(s_ij/n - (m_i/n)(m_j/n), 9) -> DECIMAL; the
    trace is an exact decimal sum of diagonal cells and the Frobenius
    term decimal-sums round(c^2, 12); PR is one double division.

    Plan: one embeddings scan exploding the UPPER-TRIANGLE outer
    product (2080 structs/row; map-side combine bounds the shuffle at
    2080 cells), then bounded cell algebra -- the vectors themselves
    never shuffle. Deliberately linear in n_vectors x dim^2 (this IS
    the covariance computation)."""
    e = load_table(spark, sf_dir, "embeddings")
    x = e.select(F.col("embedding").alias("v"))
    # upper triangle only (j >= i): 2080 cells instead of 4096 -- the
    # symmetric half is reconstructed by the weight-2 Frobenius terms
    pairs = x.select(
        F.explode(
            F.flatten(
                F.transform(
                    "v",
                    lambda xi, i: F.transform(
                        F.slice(F.col("v"), i + 1, F.size("v") - i),
                        lambda xj, jj: F.struct(
                            i.alias("i"),
                            (i + jj).alias("j"),
                            (xi.cast("double") * xj.cast("double")).alias("p"),
                        ),
                    ),
                )
            )
        ).alias("c")
    )
    dec = "decimal(27,10)"
    moments = pairs.select("c.i", "c.j", "c.p").groupBy("i", "j").agg(
        F.sum(F.col("p").cast(dec)).alias("s")
    )
    mu = x.select(F.posexplode("v").alias("i", "xi")).groupBy("i").agg(
        F.sum(F.col("xi").cast(dec)).alias("m")
    )
    n_agg = x.agg(F.count(F.lit(1)).alias("n"))
    nd = F.col("n").cast("double")
    cells = (
        moments.join(
            F.broadcast(mu.select(F.col("i").alias("i_"), F.col("m").alias("mi"))),
            F.col("i") == F.col("i_"),
        )
        .join(
            F.broadcast(mu.select(F.col("i").alias("j_"), F.col("m").alias("mj"))),
            F.col("j") == F.col("j_"),
        )
        .crossJoin(F.broadcast(n_agg))
        .select(
            "i",
            "j",
            F.round(
                F.col("s").cast("double") / nd
                - (F.col("mi").cast("double") / nd)
                * (F.col("mj").cast("double") / nd),
                9,
            ).alias("c"),
            "n",
        )
    )
    w2 = F.when(F.col("i") == F.col("j"), F.lit(1)).otherwise(F.lit(2))
    agg = cells.groupBy("n").agg(
        F.sum(F.when(F.col("i") == F.col("j"), F.col("c").cast("decimal(18,9)"))).alias(
            "tr"
        ),
        F.sum(
            (F.round(F.col("c") * F.col("c"), 12) * w2.cast("double")).cast(
                "decimal(18,12)"
            )
        ).alias("fr"),
    )
    trd = F.col("tr").cast("double")
    frd = F.col("fr").cast("double")
    return agg.select(
        F.col("n").cast("bigint").alias("n_vectors"),
        F.round(trd, 6).alias("trace"),
        F.round(frd, 9).alias("frobenius_sq"),
        F.round(F.try_divide(trd * trd, frd), 6).alias("effective_rank"),
    )


DIMCORR_TOP = 10


def q_embedding_dim_correlation_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most correlated embedding-dimension pairs -- the redundancy map
    behind the effective-rank number (PR says HOW MANY directions are
    real; this names WHICH stored dimensions duplicate each other, the
    input to a Matryoshka-style truncation decision): the DIMCORR_TOP
    |Pearson| pairs off the covariance cells.

    Exactness: the same upper-triangle decimal moment device as
    q_embedding_effective_rank; each correlation is one fixed double
    chain on exact sums, rounded to 6; ordering is (abs desc, i, j).

    Plan: one outer-product scan (2080-cell shuffle), bounded-pair
    algebra after."""
    e = load_table(spark, sf_dir, "embeddings")
    x = e.select(F.col("embedding").alias("v"))
    pairs = x.select(
        F.explode(
            F.flatten(
                F.transform(
                    "v",
                    lambda xi, i: F.transform(
                        F.slice(F.col("v"), i + 1, F.size("v") - i),
                        lambda xj, jj: F.struct(
                            i.alias("i"),
                            (i + jj).alias("j"),
                            (xi.cast("double") * xj.cast("double")).alias("p"),
                        ),
                    ),
                )
            )
        ).alias("c")
    )
    dec = "decimal(27,10)"
    moments = pairs.select("c.i", "c.j", "c.p").groupBy("i", "j").agg(
        F.sum(F.col("p").cast(dec)).alias("s")
    )
    mu = x.select(F.posexplode("v").alias("i", "xi")).groupBy("i").agg(
        F.sum(F.col("xi").cast(dec)).alias("m")
    )
    n_agg = x.agg(F.count(F.lit(1)).alias("n"))
    nd = F.col("n").cast("double")
    cells = (
        moments.join(
            F.broadcast(mu.select(F.col("i").alias("i_"), F.col("m").alias("mi"))),
            F.col("i") == F.col("i_"),
        )
        .join(
            F.broadcast(mu.select(F.col("i").alias("j_"), F.col("m").alias("mj"))),
            F.col("j") == F.col("j_"),
        )
        .crossJoin(F.broadcast(n_agg))
        .select(
            "i",
            "j",
            F.round(
                F.col("s").cast("double") / nd
                - (F.col("mi").cast("double") / nd)
                * (F.col("mj").cast("double") / nd),
                9,
            ).alias("c"),
        )
        # bounded materialization (2080 covariance cells): the relation is
        # referenced four times below (off-diagonal base + the diagonal
        # joined per side), and WITHOUT this each reference re-executes the
        # whole outer-product + mean + count subtree -- 12 corpus scans
        # where the docstring's "one outer-product scan" is the contract
        # (plan-pinned in tests/test_plans.py SCAN_BUDGET)
        .localCheckpoint(eager=True)
    )
    diag = cells.filter(F.col("i") == F.col("j")).select(
        F.col("i").alias("d"), F.col("c").alias("var")
    )
    offd = (
        cells.filter(F.col("i") != F.col("j"))
        .join(F.broadcast(diag.select(F.col("d").alias("i"), F.col("var").alias("vi"))), "i")
        .join(F.broadcast(diag.select(F.col("d").alias("j"), F.col("var").alias("vj"))), "j")
        .select(
            "i",
            "j",
            F.round(
                F.try_divide(F.col("c"), F.sqrt(F.col("vi") * F.col("vj"))), 6
            ).alias("corr"),
        )
    )
    return (
        offd.select(
            F.col("i").cast("bigint").alias("dim_i"),
            F.col("j").cast("bigint").alias("dim_j"),
            "corr",
        )
        .orderBy(F.abs(F.col("corr")).desc(), "dim_i", "dim_j")
        .limit(DIMCORR_TOP)
    )


def q_embedding_norm_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-norm profile per label cluster -- the normalization audit
    (cosine retrieval assumes comparable norms; a cluster whose norms
    run hot dominates dot-product scores): mean/min/max and the
    3dp-bucketed median norm per label.

    Exactness: the squared norm is the in-row fold of exact double
    products (the house _dot device shape); norms round to 3dp before
    the median bucketing, so the order-statistic spine is bounded (a few
    thousand distinct values at ANY corpus scale); mean uses 6dp-rounded
    decimal sums.

    Plan: one embeddings scan, one (label, bucket) rollup, rank lookups
    on the bounded bucket spine per label."""
    e = load_table(spark, sf_dir, "embeddings")
    sq = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    base = e.select(
        F.col("label").cast("int").alias("label"),
        F.round(F.sqrt(sq), 3).alias("norm"),
    )
    per_b = base.groupBy("label", "norm").agg(F.count(F.lit(1)).alias("c"))
    wc = Window.partitionBy("label").orderBy("norm").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = per_b.select("label", "norm", F.sum("c").over(wc).alias("cum"))
    tot = base.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("norm").cast("decimal(18,3)")).alias("s"),
        F.min("norm").alias("mn"),
        F.max("norm").alias("mx"),
    )
    j = cum.join(tot, "label")
    agg = j.groupBy("label", "n", "s", "mn", "mx").agg(
        F.min(
            F.when(
                F.col("cum") >= F.ceil(F.lit(0.5) * F.col("n").cast("double")),
                F.col("norm"),
            )
        ).alias("p50")
    )
    return agg.select(
        F.col("label").cast("bigint").alias("label"),
        F.col("n").cast("bigint").alias("n_vectors"),
        F.round(F.col("s").cast("double") / F.col("n").cast("double"), 6).alias(
            "mean_norm"
        ),
        F.col("p50").alias("p50_norm"),
        F.col("mn").alias("min_norm"),
        F.col("mx").alias("max_norm"),
    ).orderBy("label")


def q_label_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-balance audit of the embedding corpus -- the class-imbalance
    check every classifier/clustering gate upstream assumes (normalized
    entropy near 1 = balanced; a dominant class silently inflates
    accuracy-style metrics): per-label counts with share, plus the
    corpus-wide normalized entropy and max/min ratio on every row.

    Exactness: counts are integers; each share's entropy term rounds to
    12 into DECIMAL before the bounded sum; the normalization divides by
    the ln(k) of the exact class count.

    Plan: one label rollup, bounded class algebra."""
    e = load_table(spark, sf_dir, "embeddings")
    per = e.groupBy(F.col("label").cast("int").alias("label")).agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = per.agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.max("c").alias("mx"),
        F.min("c").alias("mn"),
    )
    j = per.crossJoin(F.broadcast(tot))
    share = F.col("c").cast("double") / F.col("n").cast("double")
    term = F.round(-share * F.log(share), 12).cast("decimal(18,12)")
    ent = j.groupBy("n", "k", "mx", "mn").agg(F.sum(term).alias("h"))
    j2 = j.join(F.broadcast(ent.select("n", "h")), "n")
    norm_ent = F.col("h").cast("double") / F.log(F.col("k").cast("double"))
    return (
        j2.select(
            F.col("label").cast("bigint").alias("label"),
            F.col("c").cast("bigint").alias("n_vectors"),
            F.round(share, 6).alias("share"),
            F.round(norm_ent, 6).alias("normalized_entropy"),
            F.round(
                F.col("mx").cast("double") / F.col("mn").cast("double"), 6
            ).alias("max_min_ratio"),
        )
        .orderBy("label")
    )
