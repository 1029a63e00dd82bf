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

from gh_archive_clickhouse_spark.functions.vectors import cosine_similarity


def cosine_topk(
    emb: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str = "q",
) -> DataFrame:
    """Exact cosine top-k of ``emb`` against a single broadcast query row.

    Returns (id_col, cos_sim) ordered desc with deterministic id
    tie-break. ``orderBy().limit(k)`` compiles to
    TakeOrderedAndProject: each task keeps k rows, merge at driver —
    no global sort shuffle.
    """
    scored = emb.crossJoin(F.broadcast(query)).select(
        F.col(id_col),
        F.round(cosine_similarity(vec_col, query_vec_col), 6).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)


def ivf_assign(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "c",
) -> DataFrame:
    """Assign each vector to its nearest centroid (max cosine).

    Broadcast-join against the (small) centroid set, score, keep the
    argmax via max_by — one narrow stage plus a groupBy on the vector
    id (uniform key). In a persisted index the result is written
    ``partitionBy(centroid_id)`` so probes prune partitions.
    """
    scored = emb.crossJoin(F.broadcast(centroids)).select(
        F.col(id_col),
        F.col(centroid_id_col),
        F.round(cosine_similarity(vec_col, centroid_vec_col), 6).alias("sim"),
    )
    # Deterministic argmax: highest sim, then lowest centroid id.
    return scored.groupBy(id_col).agg(
        F.max_by(
            F.col(centroid_id_col),
            F.struct(F.col("sim"), -F.col(centroid_id_col)),
        ).alias("cluster_id")
    )


def near_duplicate_pairs(
    emb: DataFrame,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding near-duplicate pairs above a cosine threshold.

    Blocked self-join on ``block_col`` (label here; IVF cluster id in a
    real pipeline): only same-block pairs are scored, so the pair space
    is sum(block²) not n². Returns (vec_a, vec_b, cos_sim).
    """
    a = emb.select(
        F.col(block_col).alias("__blk"),
        F.col(id_col).alias("vec_a"),
        F.col(vec_col).alias("__va"),
    )
    b = emb.select(
        F.col(block_col).alias("__blk"),
        F.col(id_col).alias("vec_b"),
        F.col(vec_col).alias("__vb"),
    )
    pairs = a.join(b, on="__blk").filter(F.col("vec_a") < F.col("vec_b"))
    scored = pairs.select(
        "vec_a",
        "vec_b",
        F.round(cosine_similarity("__va", "__vb"), 6).alias("cos_sim"),
    )
    return scored.filter(F.col("cos_sim") >= threshold)
