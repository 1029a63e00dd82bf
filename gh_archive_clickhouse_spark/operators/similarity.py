"""Similarity search over embedding columns (``array<float>``).

Scale design:

- **Brute-force top-k** (the exact baseline): broadcast the query
  vector(s), score row-local with JVM higher-order functions, then
  take top-k with a single TakeOrderedAndProject (orderBy+limit) — no
  wide shuffle, the per-partition top-k is merged on the driver.
- **IVF (inverted-file) path**: assign every vector to its nearest
  centroid once (map-only against broadcast centroids, written out
  partitioned by cluster in a real deployment); a query then probes
  only its centroid's partition — at 100 TB this turns a full scan
  into a partition-pruned read of ~1/n_clusters of the data.
- **Near-dup pairs**: blocked self-join (same label/cluster) instead of
  a full cross join; at scale the blocking key is the IVF cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gh_archive_clickhouse_spark.operators._util import (
    ensure_parallelism,
    local_rows_df,
)
from gh_archive_clickhouse_spark.functions.vectors import (
    dot,
    dot_unrolled,
    l2_norm,
    l2_norm_unrolled,
)


def _dot(a: str, b: str, dim: int | None):
    """Codegen'd unrolled dot when the dimension is known (the normal
    case for one model's embedding column), interpreted fold otherwise.
    Bit-identical results either way (same accumulation order)."""
    return dot_unrolled(a, b, dim) if dim else dot(a, b)


def _with_norm(
    df: DataFrame, vec_col: str, out_vec: str, out_norm: str,
    dim: int | None = None,
) -> DataFrame:
    """Project (vec as double array, its norm) once per row.

    Scoring N pairs against the same row then costs one dot product per
    pair instead of dot + two norms: same fold order and double
    precision as ``cosine_similarity``, so results are bit-identical,
    but the per-pair work drops ~3x. At 100 TB the norm column is
    computed in the map stage before any join fan-out.
    """
    withv = df.withColumn(out_vec, F.col(vec_col).cast("array<double>"))
    norm = (
        l2_norm_unrolled(out_vec, dim) if dim else l2_norm(F.col(out_vec))
    )
    return withv.withColumn(out_norm, norm)


def cosine_topk(
    emb: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str = "q",
    dim: int | None = None,
) -> DataFrame:
    """Exact cosine top-k of ``emb`` against a single broadcast query row.

    Returns (id_col, cos_sim) ordered desc with deterministic id
    tie-break. ``orderBy().limit(k)`` compiles to
    TakeOrderedAndProject: each task keeps k rows, merge at driver —
    no global sort shuffle.
    """
    e = _with_norm(emb, vec_col, "__v", "__n", dim)
    q = _with_norm(query, query_vec_col, "__qv", "__qn", dim)
    scored = e.crossJoin(F.broadcast(q)).select(
        F.col(id_col),
        F.round(
            F.when(
                (F.col("__n") > 0) & (F.col("__qn") > 0),
                _dot("__v", "__qv", dim) / (F.col("__n") * F.col("__qn")),
            ),
            6,
        ).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)


def _ivf_cluster_sql() -> str:
    """THE nearest-centroid assignment expression (argmax cosine over
    a broadcast one-row ``__cents`` table built by :func:`_prep_cents`,
    evaluated against a ``__v``/``__n`` normed vector): sim rounded to
    6 dp, ties -> lowest centroid id, zero-norm vectors coalesce their
    (NULL) sims to -Infinity so they land in the LOWEST centroid id.
    One definition shared by :func:`ivf_assign`, :func:`kmeans_fit`
    and :func:`ivfpq_index_rows` so the batch assignment, the Lloyd
    iteration, and the persisted-index projection can never
    desynchronize."""
    sim = (
        "coalesce(CASE WHEN __n > 0 AND e.cn > 0 THEN "
        "round(aggregate(zip_with(__v, e.cvec, (p, q) -> p * q), "
        "cast(0 as double), (s, v) -> s + v) / (__n * e.cn), 6) "
        "ELSE CAST(NULL AS DOUBLE) END, cast('-Infinity' as double))"
    )
    return (
        f"aggregate("
        f"transform(__cents, e -> named_struct('s', {sim}, 'c', e.cid)), "
        f"named_struct('s', CAST(NULL AS DOUBLE), 'c', 2147483647), "
        f"(acc, el) -> IF(acc.s IS NULL OR el.s > acc.s OR "
        f"(el.s = acc.s AND el.c < acc.c), el, acc)).c"
    )


def ivf_assign(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "c",
    dim: int | None = None,
) -> DataFrame:
    """Assign each vector to its nearest centroid (max cosine).

    ONE map-only stage (r15, guide §2.3/§2.4): the centroid table
    collapses to a broadcast one-row array (:func:`_prep_cents`) and
    each vector's argmax is a row-local fold (:func:`_ivf_cluster_sql`
    — sim rounded to 6 dp, ties -> lowest id, the exact convention the
    former explode+``max_by`` form computed). The previous shape
    exploded k candidate rows per vector and shuffled all n·k of them
    into a groupBy(id) — a corpus-scale exchange the fold eliminates;
    it is also the shape :func:`ivfpq_index_rows` already used, so the
    two assignment paths now share one expression. In a persisted
    index the result is written ``partitionBy(centroid_id)`` so probes
    prune partitions.
    """
    cents = _prep_cents(centroids, centroid_id_col, centroid_vec_col)
    e = _with_norm(emb, vec_col, "__v", "__n", dim)
    return (
        e.select(F.col(id_col), "__v", "__n")
        .crossJoin(F.broadcast(cents))
        .select(
            F.col(id_col), F.expr(_ivf_cluster_sql()).alias("cluster_id")
        )
    )


def srp_bucket(
    emb: DataFrame,
    planes: list[list[int]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-random-projection (SRP) LSH bucket per vector.

    Bit p of the bucket is 1 iff ``dot(v, planes[p]) > 0`` — the
    classic SimHash-for-vectors scheme: vectors in the same bucket are
    cosine-close with probability 1 - angle/pi per plane. ``planes``
    are ±1 rows derived deterministically (see plans/ext_queries), so
    any SQL oracle can reproduce the buckets.

    Scale path: a map-only projection (no shuffle, no Python). A
    persisted index writes ``partitionBy(bucket)``; a query then scans
    only its own bucket (plus Hamming-adjacent buckets for recall) —
    the LSH-bucketed alternative to the IVF index, with no training
    step. Returns the input plus an int ``bucket`` column.
    """
    # Planes have a known, fixed dimension, so each projection unrolls
    # into a flat codegen'd multiply-add chain over a double-cast
    # column (same left-assoc fold order, seeded 0.0, as the
    # zip_with/aggregate form — bit-identical results) built as ONE
    # SQL-text parse instead of ~dim py4j Column calls per plane.
    tmp = emb.withColumn("__vd", F.col(vec_col).cast("array<double>"))
    plane_terms = []
    for p, signs in enumerate(planes):
        proj = " + ".join(
            f"(__vd[{d}] * {float(s)})" for d, s in enumerate(signs)
        )
        plane_terms.append(
            f"(CASE WHEN (CAST(0.0 AS DOUBLE) + {proj}) > 0 "
            f"THEN {1 << p} ELSE 0 END)"
        )
    bucket = F.expr(" + ".join(plane_terms)).cast("int")
    return tmp.withColumn("bucket", bucket).drop("__vd")


NEARDUP_MAX_BLOCK = 10_000


def hot_blocks(
    emb: DataFrame,
    block_col: str = "label",
    max_block_size: int = NEARDUP_MAX_BLOCK,
) -> DataFrame:
    """Blocks LARGER than ``max_block_size`` — the ones
    :func:`near_duplicate_pairs` excludes from pairing.

    Companion detection surface for the cap: callers run this (a tiny
    aggregate, ≤ n/cap rows) to learn WHICH blocks were skipped and
    how big they are, then subdivide them with a finer key (IVF
    sub-cluster via ``ivf_assign`` over the block's members) instead
    of silently losing their pairs. Returns (block_col, block_size).
    """
    if max_block_size <= 0:
        raise ValueError(
            f"max_block_size must be positive, got {max_block_size}"
        )
    return (
        emb.groupBy(F.col(block_col))
        .agg(F.count(F.lit(1)).alias("block_size"))
        .filter(F.col("block_size") > max_block_size)
    )


def near_duplicate_pairs_subdivided(
    emb: DataFrame,
    planes: list[list[int]],
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    dim: int | None = None,
    max_block_size: int = NEARDUP_MAX_BLOCK,
) -> DataFrame:
    """Near-duplicate pairs with AUTOMATIC hot-block subdivision —
    the production closure of :func:`near_duplicate_pairs`'s cap:
    instead of excluding over-cap blocks, their members are
    sub-blocked by an SRP-LSH bucket (:func:`srp_bucket` over
    ``planes`` — map-only, training-free, deterministic) and paired
    within (block, srp_bucket).

    Cost: cold blocks pay exactly the base operator's sum(block²);
    a hot block of size H splits into ≤ 2^planes sub-blocks of ~H/2^p
    rows, so its pair volume drops quadratically with the plane
    count. Recall: subdivision is the standard LSH trade — a true
    near-dup pair lands in the same SRP bucket with probability
    (1 - angle/π)^planes, so pairs straddling sub-buckets are missed;
    more planes = cheaper and lower-recall. Degenerate sub-blocks
    that STILL exceed the cap (identical vectors can defeat any
    projection) remain excluded by the inner cap rather than going
    quadratic.

    A pair is emitted at most once: blocks partition the rows, and
    within the hot side a pair needs equal (block, bucket).
    """
    from gh_archive_clickhouse_spark.plans.common import materialize

    # The hot list feeds TWO joins (anti for cold, semi for hot) —
    # materialized so the full-corpus block aggregate underneath runs
    # once, not once per join side; ≤ n/cap rows, so broadcast on
    # both sides.
    hot = materialize(
        hot_blocks(emb, block_col, max_block_size).select(block_col),
        "subdiv_hot_blocks",
    )
    cold = emb.join(F.broadcast(hot), block_col, "left_anti")
    # cold blocks are ≤ cap by construction — skip the inner re-check
    cold_pairs = near_duplicate_pairs(
        cold, block_col, id_col, vec_col, threshold, dim,
        max_block_size=None,
    )
    hot_emb = emb.join(F.broadcast(hot), block_col, "left_semi")
    sub = srp_bucket(
        hot_emb, planes, id_col=id_col, vec_col=vec_col
    ).withColumn(
        "__subblk",
        F.concat_ws(
            "#",
            F.col(block_col).cast("string"),
            F.col("bucket").cast("string"),
        ),
    )
    hot_pairs = near_duplicate_pairs(
        sub, "__subblk", id_col, vec_col, threshold, dim,
        max_block_size=max_block_size,
    )
    return cold_pairs.unionByName(hot_pairs)


def near_duplicate_pairs(
    emb: DataFrame,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    dim: int | None = None,
    max_block_size: int | None = NEARDUP_MAX_BLOCK,
) -> DataFrame:
    """Embedding near-duplicate pairs above a cosine threshold.

    Blocked self-join on ``block_col`` (label here; IVF cluster id in a
    real pipeline): only same-block pairs are scored, so the pair space
    is sum(block²) not n². Returns (vec_a, vec_b, cos_sim).

    HOT-BLOCK CAP — the worst case of sum(block²) is one degenerate
    block holding most of the corpus, which silently reintroduces the
    all-pairs O(n²) this operator exists to avoid. Blocks larger than
    ``max_block_size`` are therefore EXCLUDED from pairing (the same
    policy as the containment path's stop-shingle df cap): per-block
    cost is bounded by cap², total candidate volume stays additive in
    the number of blocks no matter how skewed the blocking key is. A
    production pipeline subdivides a hot block with a finer key (IVF
    sub-cluster via ``ivf_assign`` over the block's members) instead of
    pairing inside it. The exclusion list is a tiny aggregate
    (≤ n/cap rows — only blocks ABOVE the cap); ``max_block_size=None``
    disables the cap (fixture-scale tests only). The exclusion is
    SILENT here by design (this operator stays a pure pair stream);
    callers that need to know which blocks were skipped run
    :func:`hot_blocks` with the same cap — same tiny aggregate, and
    the list doubles as the worklist for finer-key subdivision.

    The threshold filter is deliberately left where Catalyst pushes it:
    into the broadcast-join condition, so non-dup pairs die inside the
    join and are never materialized. That makes the probe side's
    partitioning the ONLY parallelism knob — hence ensure_parallelism
    on it (a single-file local read would otherwise score every pair
    in one task; a well-partitioned cluster input passes through).
    """
    from gh_archive_clickhouse_spark.plans.common import materialize

    if max_block_size is not None:
        hot = hot_blocks(emb, block_col, max_block_size).select(block_col)
        emb = emb.join(hot, on=block_col, how="left_anti")
    # Materialize the normed projection BEFORE the self-join (r16,
    # guide §1.2 — the qx13 persist-signatures-before-pairing shape):
    # both join sides consume this frame, and Spark plans each side
    # independently, so un-checkpointed the norm pass, the hot-block
    # cap's aggregate + anti-join, and any caller-side blocking
    # expression in the lineage (qx54's 512-term SRP bucket
    # projection) all executed TWICE per call. The checkpoint also
    # keeps those big expression trees out of AQE's per-stage
    # re-optimizations, which dominated qx54's wall (job census: 0.9 s
    # of executor time under 3.1 s of wall — the rest was
    # single-threaded driver planning). Interleaved A/B at sf0.1:
    # qx54 shape 2.9-3.3 -> 1.4-1.7 s, qx32 shape 1.3-1.7 -> 1.1-1.3 s.
    normed = materialize(
        _with_norm(emb, vec_col, "__v", "__n", dim).select(
            block_col, id_col, "__v", "__n"
        ),
        "neardup_normed",
    )
    a = ensure_parallelism(normed).select(
        F.col(block_col).alias("__blk"),
        F.col(id_col).alias("vec_a"),
        F.col("__v").alias("__va"),
        F.col("__n").alias("__na"),
    )
    b = normed.select(
        F.col(block_col).alias("__blk"),
        F.col(id_col).alias("vec_b"),
        F.col("__v").alias("__vb"),
        F.col("__n").alias("__nb"),
    )
    pairs = a.join(b, on="__blk").filter(F.col("vec_a") < F.col("vec_b"))
    scored = pairs.select(
        "vec_a",
        "vec_b",
        F.round(
            F.when(
                (F.col("__na") > 0) & (F.col("__nb") > 0),
                _dot("__va", "__vb", dim) / (F.col("__na") * F.col("__nb")),
            ),
            6,
        ).alias("cos_sim"),
    )
    return scored.filter(F.col("cos_sim") >= threshold)


def build_vector_index(
    emb: DataFrame,
    centroids: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the IVF index: vectors written ``partitionBy(cluster_id)``.

    This is the materialization of the IVF scale path: the assignment
    is the one-off map-only pass (broadcast centroids), and the layout
    makes every subsequent probe a *partition-pruned* read of
    ~1/n_clusters of the data — Catalyst eliminates the other
    partitions at planning time (see ``probe_vector_index`` and the
    pruning assertion in tests/test_operators.py). Precomputed norms
    are stored so probes skip the norm pass entirely.
    """
    # Assignment computed INLINE on the normed projection (the shared
    # _ivf_cluster_sql fold against broadcast centroids) — one
    # map-only pass, no corpus-sized assign-then-join shuffle (r15,
    # the ivfpq_index_rows shape).
    cents = _prep_cents(centroids)
    normed = _with_norm(emb, vec_col, "__v", "__n")
    (
        normed.select(F.col(id_col), "__v", "__n")
        .crossJoin(F.broadcast(cents))
        .select(
            F.col(id_col),
            F.col("__v").alias("vec"),
            F.col("__n").alias("norm"),
            F.expr(_ivf_cluster_sql()).alias("cluster_id"),
        )
        .write.mode("overwrite")
        .partitionBy("cluster_id")
        .parquet(path)
    )


def probe_vector_index(
    spark,
    path: str,
    query_vec: list[float],
    cluster_ids: list[int],
    k: int = 5,
) -> DataFrame:
    """ANN probe over a persisted index: scan ONLY the listed cluster
    partition(s). ``cluster_ids`` is the caller's EXPLICIT probe set
    (nearest centroid for single-probe; the n closest for wider
    recall) — centroid ids carry no spatial adjacency, so the
    operator never guesses neighboring ids itself (same contract as
    probe_ivfpq_index).

    The ``cluster_id`` equality/IN filter is a partition filter — the
    scan's PartitionFilters prune every other cluster directory, so
    probe cost is data-in-cluster, independent of corpus size.
    """
    idx = spark.read.parquet(path)
    members = idx.filter(F.col("cluster_id").isin(list(cluster_ids)))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = sum(float(x) * float(x) for x in query_vec) ** 0.5
    scored = members.select(
        "vec_id",
        F.round(
            F.when(
                (F.col("norm") > 0) & (F.lit(qn) > 0),
                dot(F.col("vec"), q) / (F.col("norm") * F.lit(qn)),
            ),
            6,
        ).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc()).limit(k)


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Symmetric int8 quantization of an embedding column: per-vector
    max-abs scale, q = round(127 * x / scale) — the 4x storage/shuffle
    compression every billion-vector ANN index applies before
    clustering/search.

    Map-only (no shuffle): each row quantizes independently inside one
    projection; zero-vectors quantize to all-zero (scale 0 guard).
    Emits integer-exact checksums (sum, L1, dim) so the contract is
    verifiable without floating-point ambiguity, plus the scale.
    """
    ed = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    df = df.withColumn("__e", ed).withColumn(
        "__scale", F.array_max(F.transform(F.col("__e"), F.abs))
    )
    q = F.when(
        F.col("__scale") > 0,
        F.transform(
            F.col("__e"),
            lambda x: F.round(x * 127.0 / F.col("__scale"), 0).cast("int"),
        ),
    ).otherwise(F.transform(F.col("__e"), lambda x: F.lit(0)))
    df = df.withColumn("__q", q)
    return df.select(
        F.col(id_col),
        F.round(F.col("__scale"), 6).alias("scale_r"),
        F.expr(
            "aggregate(__q, CAST(0 AS BIGINT), (a, x) -> a + x)"
        ).alias("q_sum"),
        F.expr(
            "aggregate(__q, CAST(0 AS BIGINT), (a, x) -> a + abs(x))"
        ).alias("q_l1"),
        F.size(F.col("__q")).alias("dim"),
    )


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Distributed spherical k-means (Lloyd) — the REAL IVF coarse-
    quantizer build that `ivf_assign` presupposes.

    Per iteration, ONE distributed stage (r15): assignment is the
    row-local argmax fold against the broadcast one-row centroid
    table (:func:`_ivf_cluster_sql` — the expression shared with
    ``ivf_assign``), computed INLINE on the same projection that
    posexplodes the member components, so the former
    assignment-then-``emb ⋈ assigned`` equi-join (a corpus-sized
    shuffle per iteration) is gone; the only exchange left per
    iteration is the update's hash agg per (cluster, pos) — shuffle
    volume k·dim rows after map-side partials, independent of corpus
    size.

    Determinism (the property that makes the result oracle-checkable
    and run-to-run stable under AQE re-partitioning):
      - deterministic init: the k vectors with id < k;
      - assignment ties break on lowest cluster id (ivf_assign);
      - means accumulate in DECIMAL(38,20) — exact, order-independent
        addition — then round to 6 decimals. This round is
        LOAD-BEARING for engine parity, not just display (measured
        r14): the unscaled sum exceeds 2^53, so a DECIMAL(38,20) →
        double cast is double-rounded in engines that convert via
        int128→double→/1e20 (DuckDB) while Spark's BigDecimal
        .doubleValue() rounds once — the quotients then differ by
        ULPs (observed: -0.0001658712681091857 vs ...497 at sf0.01)
        and only the 6-dp round re-synchronizes them. Same class as
        the cosine ordering rounds; do NOT drop it in a knife-edge
        sweep (the hazardous class is integer-ratio quotients whose
        inputs ARE bit-identical — see SURVEY's rounding ledger).
    Centroids are materialized per round via
    ``plans.common.materialize`` (lazy localCheckpoint by default, a
    written table per round under SPARK_GRAFT_MATERIALIZE_DIR) so a
    cluster run records each completed round durably.

    Returns the final update as flat rows:
    (cluster_id, pos, c_val, n_members). Clusters that lose all
    members disappear (standard Lloyd degeneracy; deterministic).
    """
    centroids = emb.filter(F.col(id_col) < k).select(
        F.col(id_col).cast("int").alias("centroid_id"),
        F.col(vec_col).alias("c"),
    )
    out = None
    normed = _with_norm(emb, vec_col, "__v", "__n", dim).select(
        "__v", "__n"
    )
    for _ in range(iters):
        cents = _prep_cents(centroids)
        members = (
            normed.crossJoin(F.broadcast(cents))
            .select(
                F.expr(_ivf_cluster_sql()).alias("cluster_id"), "__v"
            )
            .select(
                "cluster_id",
                F.posexplode(F.col("__v")).alias("pos", "x"),
            )
        )
        out = members.groupBy("cluster_id", "pos").agg(
            F.round(
                F.sum(F.col("x").cast("decimal(38,20)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("c_val"),
            F.count(F.lit(1)).alias("n_members"),
        )
        from gh_archive_clickhouse_spark.plans.common import materialize

        centroids = materialize(
            out.groupBy("cluster_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "c_val"))
                ).alias("__pc")
            )
            .select(
                F.col("cluster_id").alias("centroid_id"),
                F.transform(F.col("__pc"), lambda s: s.c_val).alias("c"),
            ),
            f"kmeans_centroids_{_}",
        )
    return out.select(
        "cluster_id",
        F.col("pos").cast("int").alias("pos"),
        "c_val",
        "n_members",
    )


def pq_codebook(
    emb: DataFrame,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization codebook as ONE broadcastable row.

    Deterministic "training" mirrors kmeans_fit's init: the k vectors
    with id < k become the codes (code = id, so code c sits at list
    position c). A production pipeline would run kmeans_fit per
    subspace instead; the encode/scan shape below is identical either
    way. Output: a single row ``__cb`` =
    array<struct<code:int, cvec:array<double>>> sorted by code —
    k*dim doubles, kilobytes, always broadcast.
    """
    return (
        emb.filter(F.col(id_col) < k)
        .select(
            F.col(id_col).cast("int").alias("code"),
            F.col(vec_col).cast("array<double>").alias("cvec"),
        )
        .agg(
            F.array_sort(F.collect_list(F.struct("code", "cvec"))).alias(
                "__cb"
            )
        )
    )


def _pq_sub_l2(vec: str, cent: str, mm: str, sub: int) -> str:
    """SQL for the squared L2 distance between subspace ``mm`` of two
    double arrays: sequential left fold, bit-identical to the oracle's
    ``list_aggregate(list_transform(...), 'sum')``."""
    return (
        f"aggregate(zip_with(slice({vec}, {mm}*{sub}+1, {sub}), "
        f"slice({cent}, {mm}*{sub}+1, {sub}), (p, q) -> (p-q)*(p-q)), "
        f"cast(0 as double), (s, v) -> s + v)"
    )


def _pq_codes_expr(m: int, sub: int) -> str:
    """SQL for the per-subspace argmin-L2 PQ code array over a
    broadcast ``__cb`` codebook and a ``__v`` double vector — THE
    encode convention (strict-< first-wins fold, (d, c) tie-break),
    shared by pq_encode and build_ivfpq_index so the persisted index
    can never desynchronize from the encode path."""
    dist = _pq_sub_l2("__v", "e.cvec", "mm", sub)
    return (
        f"transform(sequence(0, {m - 1}), mm -> "
        f"aggregate("
        f"transform(__cb, e -> named_struct('d', {dist}, 'c', e.code)), "
        f"named_struct('d', cast('Infinity' as double), 'c', 2147483647), "
        f"(acc, el) -> IF(el.d < acc.d OR (el.d = acc.d AND el.c < acc.c), "
        f"el, acc)).c)"
    )


def pq_encode(
    emb: DataFrame,
    m: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: DataFrame | None = None,
) -> DataFrame:
    """PQ-encode every vector: dim floats -> m small codes.

    The 100 TB shape: encoding is embarrassingly parallel — ONE
    map-only stage, zero shuffle. The codebook arrives as a broadcast
    one-row frame; per row, a single JVM higher-order expression finds
    the argmin-L2 code in each of the m subspaces (ties -> lowest
    code; evaluated once per code via a transform->fold rewrite, not a
    re-evaluating CASE). Output: (id_col, codes array<int> length m)
    — a 64x compression of a float64[64] column, the layout every
    billion-scale ANN index stores.
    """
    sub = dim // m
    if m * sub != dim:
        raise ValueError(f"dim {dim} not divisible into {m} subspaces")
    cb = codebook if codebook is not None else pq_codebook(emb)
    codes = _pq_codes_expr(m, sub)
    return (
        ensure_parallelism(emb)
        .select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
        )
        .crossJoin(F.broadcast(cb))
        .select(F.col(id_col), F.expr(codes).alias("codes"))
    )


def pq_adc_topk(
    encoded: DataFrame,
    query: DataFrame,
    codebook: DataFrame,
    k_top: int = 10,
    m: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    query_vec_col: str = "q",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k scan over PQ codes.

    The query is scored against the CODEBOOK once — an m x k table of
    subspace distances (``__dt``), built on the broadcast one-row
    frames — then every database vector's approximate distance is m
    table lookups + a fold: no float vector is touched during the
    scan. orderBy+limit compiles to TakeOrderedAndProject (per-task
    top-k, driver merge — no global sort). This is the memory-bound
    scan loop of IVF-PQ systems (FAISS-style), expressed as two
    broadcast joins and one map stage.

    Requires codebook codes to be exactly 0..k-1 (pq_codebook's
    contract), so ``codes[mm]`` indexes the distance table directly.

    SINGLE-QUERY contract: the distance table is built for exactly one
    query row — a multi-row (or empty) query frame raises ValueError
    instead of silently picking an arbitrary row, since the caller bug
    would otherwise yield a plausible-looking answer for an
    unspecified query vector. Batched multi-query search is the
    rank-window shape (qx41), not this scan. The validating ``take``
    IS the query-side computation: the collected vector is re-lifted
    as a literal one-row frame, so the (possibly expensive) query
    subplan — a join+filter in ivfpq_search — executes exactly once
    instead of once for the check and again for the broadcast.
    """
    rows = query.select(
        F.col(query_vec_col).cast("array<double>").alias("__q")
    ).take(2)
    if len(rows) != 1:
        raise ValueError(
            "pq_adc_topk is a single-query scan: the query frame must "
            "have exactly one row (batched multi-query search is "
            "the qx41 rank-window shape)"
        )
    q_lit = local_rows_df(
        encoded.sparkSession,
        [(list(rows[0]["__q"]),)],
        "__q array<double>",
    )
    sub = dim // m
    dist = _pq_sub_l2("__q", "e.cvec", "mm", sub)
    dtable = (
        f"transform(sequence(0, {m - 1}), mm -> "
        f"transform(__cb, e -> {dist}))"
    )
    dt_row = (
        q_lit.crossJoin(F.broadcast(codebook))
        .select(F.expr(dtable).alias("__dt"))
    )
    adist = (
        f"aggregate(sequence(0, {m - 1}), cast(0 as double), (s, mm) -> "
        f"s + element_at(element_at(__dt, mm + 1), "
        f"element_at(codes, mm + 1) + 1))"
    )
    return (
        encoded.crossJoin(F.broadcast(dt_row))
        .select(
            F.col(id_col), F.round(F.expr(adist), 6).alias("adc_dist")
        )
        .orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
        .limit(k_top)
    )


def _prep_cents(
    centroids: DataFrame,
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "c",
) -> DataFrame:
    """Centroid table → ONE broadcastable row of
    array<struct<cid, cvec, cn>> sorted by id (norms precomputed so
    the per-vector assignment fold never recomputes them)."""
    return (
        centroids.select(
            F.col(centroid_id_col).cast("int").alias("cid"),
            F.col(centroid_vec_col).cast("array<double>").alias("cvec"),
        )
        .withColumn(
            "cn",
            F.expr(
                "sqrt(aggregate(cvec, cast(0 as double), "
                "(s, v) -> s + v * v))"
            ),
        )
        .agg(
            F.array_sort(
                F.collect_list(F.struct("cid", "cvec", "cn"))
            ).alias("__cents")
        )
    )


def ivfpq_index_rows(
    emb: DataFrame,
    codebook: DataFrame,
    cents: DataFrame,
    m: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The IVF-PQ index projection — ONE map-only stage producing
    (id, codes, vec, norm, cluster_id) per vector against the two
    broadcast one-row frames (``codebook`` from :func:`pq_codebook`,
    ``cents`` from :func:`_prep_cents`). No shuffle, no corpus-sized
    join. Shared by the batch build (:func:`build_ivfpq_index`) and
    the incremental stream sink (streaming/index_stream.py), so the
    persisted layout can never desynchronize between the two paths.
    """
    sub = dim // m
    if m * sub != dim:
        raise ValueError(f"dim {dim} not divisible into {m} subspaces")
    codes = _pq_codes_expr(m, sub)
    # Shared assignment expression (see _ivf_cluster_sql): zero-norm
    # vectors coalesce their (NULL) sims to -Infinity, so they land in
    # the LOWEST centroid id — ivf_assign's convention — never in a
    # sentinel cell.
    cluster = _ivf_cluster_sql()
    return (
        ensure_parallelism(_with_norm(emb, vec_col, "__v", "__n", dim))
        .select(F.col(id_col), "__v", "__n")
        .crossJoin(F.broadcast(codebook))
        .crossJoin(F.broadcast(cents))
        .select(
            F.col(id_col),
            F.expr(codes).alias("codes"),
            F.col("__v").alias("vec"),
            F.col("__n").alias("norm"),
            F.expr(cluster).alias("cluster_id"),
        )
    )


def build_ivfpq_index(
    emb: DataFrame,
    centroids: DataFrame,
    path: str,
    m: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: DataFrame | None = None,
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "c",
) -> None:
    """Persist the full IVF-PQ index: one row per vector carrying its
    PQ codes AND the float vector + norm, written
    ``partitionBy(cluster_id)``.

    The layout is what makes the probe corpus-size-independent AND
    memory-bound-optimal: the cluster partition prunes the scan to
    ~1/n_clusters of the rows, and because parquet is columnar the ADC
    pass reads ONLY the codes column (m bytes/vector) — the float
    vectors on the same rows cost nothing until the final shortlist
    re-rank touches a handful of them.

    Build cost — genuinely ONE map-only projection over the corpus:
    both the cluster assignment (argmax cosine, ties -> lowest id,
    same convention as ivf_assign) and the PQ codes are computed as
    fold expressions against two broadcast one-row frames (centroids,
    codebook). No shuffle, no join of corpus-sized sides — unlike an
    assign-then-join formulation, which would shuffle the corpus by id
    twice.
    """
    if not centroids.head(1):
        raise ValueError("centroid table is empty — nothing to index by")
    cb = codebook if codebook is not None else pq_codebook(emb)
    cents = _prep_cents(centroids, centroid_id_col, centroid_vec_col)
    (
        ivfpq_index_rows(
            emb, cb, cents, m=m, dim=dim, id_col=id_col, vec_col=vec_col
        )
        .write.mode("overwrite")
        .partitionBy("cluster_id")
        .parquet(path)
    )


def probe_ivfpq_index(
    spark,
    path: str,
    query: DataFrame,
    codebook: DataFrame,
    cluster_ids: list[int],
    k: int = 5,
    shortlist_k: int = 20,
    m: int = 8,
    dim: int = 64,
    query_vec_col: str = "q",
) -> DataFrame:
    """Two-stage probe over a persisted IVF-PQ index.

    ``cluster_ids`` is the EXPLICIT list of coarse cells to probe —
    the caller computes it by scoring the query against the centroid
    table (nearest for n_probe=1, the n closest for wider recall).
    Centroid ids carry no spatial adjacency, so the operator never
    guesses "adjacent" ids itself.

    Stage 1 (ADC): partition-pruned scan of the probed cluster(s)
    reading ONLY (vec_id, codes) — column pruning keeps the float
    vectors on disk — scored by table lookups against the broadcast
    query distance table, TakeOrdered shortlist.
    Stage 2 (re-rank): the shortlist joins back to the SAME pruned
    partitions for exact cosine on ``shortlist_k`` rows only.

    Returns (vec_id, cos_sim, adc_dist) top-k by exact score.
    """
    idx = spark.read.parquet(path).filter(
        F.col("cluster_id").isin(list(cluster_ids))
    )
    shortlist = pq_adc_topk(
        idx.select("vec_id", "codes"),
        query,
        codebook,
        k_top=shortlist_k,
        m=m,
        dim=dim,
        query_vec_col=query_vec_col,
    )
    q = _with_norm(query, query_vec_col, "__qv", "__qn", dim)
    return (
        shortlist.join(idx.select("vec_id", "vec", "norm"), "vec_id")
        .crossJoin(F.broadcast(q.select("__qv", "__qn")))
        .select(
            "vec_id",
            F.round(
                F.when(
                    (F.col("norm") > 0) & (F.col("__qn") > 0),
                    _dot("vec", "__qv", dim)
                    / (F.col("norm") * F.col("__qn")),
                ),
                6,
            ).alias("cos_sim"),
            "adc_dist",
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(k)
    )
