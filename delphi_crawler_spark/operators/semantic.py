"""Semantic (embedding-space) deduplication: k-means cells + within-cell
cosine pruning — the SemDeDup shape (Abbas et al. 2023, public literature):
instead of an LSH recall curve, confine exact near-duplicate detection to
k-means cells so the pair space is cluster-local, never corpus-quadratic.
Complements ``dedup_fuzzy.embedding_neardup_pairs`` (random-hyperplane LSH):
k-means cells give deterministic, tunable partition sizes and reuse the IVF
coarse quantizer the similarity family already trains.

Scale shape at 10^9+ vectors:

- centroid training touches only a fixed-size deterministic sample
  (hash-ordered TakeOrdered — same rows at any partition count);
- assignment is ONE narrow Arrow pass over a broadcast (k × dim) float
  matrix — no shuffle of the corpus;
- the candidate stage is a self-equi-join on ``cluster_id`` — with
  k ≈ sqrt(n) cells the expected cell is sqrt(n)-sized, so the pair work is
  ~n^1.5/k² per cell and bounded; oversized cells (skewed embedding space)
  are the documented extension point: re-cluster the cell hierarchically or
  salt it (``operators/salting.py``), both of which compose here because the
  verdict only needs pairs WITHIN a cell;
- the per-vector verdict is a hash-agg keyed by the higher id of each pair —
  partial-aggregating, skew-free.

Reference parity: the reference engine (a Maven crawler) has no embedding
ops; this is part of the training-data extension family (SURVEY §2.10).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

from delphi_crawler_spark.operators.similarity import (
    _normalize,
    cosine_col,
    train_centroids,
)


def kmeans_assign(
    emb: DataFrame,
    n_clusters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 10_000,
    iters: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Add a ``cluster_id`` column: nearest spherical-k-means centroid by
    cosine. One broadcast of (k × dim) floats + one narrow Arrow pass."""
    spark = emb.sparkSession
    centroids = train_centroids(
        emb, n_clusters, id_col, vec_col, sample_size, iters, seed
    )
    bc = spark.sparkContext.broadcast(centroids)

    @F.pandas_udf(IntegerType())
    def nearest(vecs: pd.Series) -> pd.Series:
        c = bc.value
        m = _normalize(np.stack(vecs.map(np.asarray).to_list()).astype(np.float64))
        return pd.Series((m @ c.T).argmax(1).astype(np.int32))

    return emb.withColumn("cluster_id", nearest(F.col(vec_col)))


def semantic_dedup(
    emb: DataFrame,
    n_clusters: int = 8,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 10_000,
    iters: int = 5,
    seed: int = 42,
    max_block_rows: int = 100_000,
) -> DataFrame:
    """Per-vector semantic-dup verdict: a vector is DROPPED iff some
    lower-id vector in the same k-means cell has cosine >= threshold
    (first-occurrence-wins, the engine-wide dedup convention — deterministic
    and rerun-stable, unlike SemDeDup's random keep choice).

    Returns (id_col, cluster_id, n_dup_lower, max_cos_lower, keep):
    ``n_dup_lower`` = lower-id in-cell neighbors at/above threshold,
    ``max_cos_lower`` = best such cosine (null when none), ``keep`` = no
    such neighbor exists.

    The cosine is rounded to 6 places BEFORE the threshold compare (the
    family-wide convention — keeps the verdict reproducible in the
    independent numpy oracle, tools/gen_expected.py).

    **Oversized-cell guard (triangle tiling).** The verdict is defined over
    ALL within-cell pairs, so a skewed embedding space (one dominant cell of
    m rows) cannot be re-clustered or salted away without changing the
    answer. Instead, any cell larger than ``max_block_rows`` is split into
    ``B = ceil(m / max_block_rows)`` deterministic hash-blocks and the
    B(B+1)/2 block tiles become separate equi-join keys: every within-cell
    pair lands in exactly one tile, but no single task ever materializes
    more than ``max_block_rows²`` candidate pairs — the cell's quadratic
    pair space spreads over B² tasks instead of collapsing into one. Rows of
    an oversized cell are replicated ~(B+1)/2× on each side (the inherent
    cost of tiling a triangle); cells at or under the cap keep B=1, which
    reduces to the plain cluster-id self-join, bit-identically.
    """
    spark = emb.sparkSession
    # The assignment (centroid sample + one Arrow pass) feeds FOUR consumers
    # below (cell-size collect, both self-join roles, verdict join); persist
    # it once so the corpus sees one assignment pass, not four — one cached
    # (id, vec, cluster) copy replaces three recomputed Arrow scans. Release
    # via the result's `_release_semantic` hook (house persist discipline).
    assigned = (
        kmeans_assign(emb, n_clusters, id_col, vec_col, sample_size, iters, seed)
        .select(F.col(id_col), F.col(vec_col), "cluster_id")
        .persist()
    )

    # per-cell block counts: one k-row hash-agg (k ~ sqrt(n): driver-safe);
    # this collect also materializes the cache for the joins below
    sizes = assigned.groupBy("cluster_id").count().collect()
    nblocks = {
        r["cluster_id"]: max(1, -(-int(r["count"]) // max_block_rows))
        for r in sizes
    }
    nb_df = F.broadcast(
        spark.createDataFrame(
            [(int(c), int(b)) for c, b in nblocks.items()],
            "cluster_id int, __nb int",
        )
    )
    blocked = assigned.join(nb_df, "cluster_id").withColumn(
        "__blk",
        F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.col("__nb").cast("bigint"))
        .cast("int"),
    )
    # role A covers tiles (blk, j), j >= blk; role B covers (i, blk), i <= blk
    # -> every unordered block pair (i <= j) is one equi-join key, hit once
    left = blocked.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        "cluster_id",
        F.col("__blk").alias("ti"),
        F.explode(F.sequence(F.col("__blk"), F.col("__nb") - 1)).alias("tj"),
    )
    right = blocked.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        "cluster_id",
        F.explode(F.sequence(F.lit(0), F.col("__blk"))).alias("ti"),
        F.col("__blk").alias("tj"),
    )
    pairs = (
        left.join(right, ["cluster_id", "ti", "tj"])
        # diagonal tiles see both orderings of a pair: keep one. Off-diagonal
        # tiles see exactly one ordering (roles fixed by block), keep both
        # directions and canonicalize below — an id_a<id_b filter here would
        # drop pairs whose lower id hashed into the higher block.
        .filter((F.col("ti") != F.col("tj")) | (F.col("id_a") < F.col("id_b")))
        .withColumn("cosine", F.round(cosine_col(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select(F.greatest("id_a", "id_b").alias("id_b"), "cosine")
    )
    dup_stats = pairs.groupBy("id_b").agg(
        F.count(F.lit(1)).alias("n_dup_lower"),
        F.max("cosine").alias("max_cos_lower"),
    )
    out = (
        assigned.select(F.col(id_col), "cluster_id")
        .join(dup_stats, F.col(id_col) == F.col("id_b"), "left")
        .select(
            F.col(id_col),
            "cluster_id",
            F.coalesce(F.col("n_dup_lower"), F.lit(0)).alias("n_dup_lower"),
            "max_cos_lower",
            F.col("n_dup_lower").isNull().alias("keep"),
        )
    )
    out._release_semantic = lambda: assigned.unpersist()  # type: ignore[attr-defined]
    return out


def kmeans_lloyd(
    emb: DataFrame,
    n_clusters: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 10_000,
    init_iters: int = 5,
    seed: int = 42,
):
    """Distributed Lloyd refinement of spherical k-means (Lloyd 1982):
    ``train_centroids`` fits the coarse quantizer on a fixed-size
    deterministic sample; this runs ``iters`` FULL-CORPUS rounds — the
    step a 10^9+-vector curation pipeline needs when the sample-trained
    centroids drift from the true mass distribution (cluster-balanced
    sampling, SemDeDup cells, IVF lists all sharpen with it).

    Returns ``(assignments, centroids)``: the assignment DataFrame
    ``(id_col, cluster_id)`` under the FINAL centroids, and the final
    (k × dim) unit-row numpy matrix.

    **Determinism at any partition count** (the property every oracle-
    checked operator here holds): per-row float math (normalize, round,
    dot) happens in numpy inside Arrow batches — no cross-row float
    reduction ever runs on the JVM. The centroid update — the one
    genuinely cross-row sum — accumulates the 6-dp-rounded components as
    ``decimal(28,6)``, which Spark sums EXACTLY and order-independently
    (integer arithmetic under the hood), so the new centroids are a pure
    function of the assignment, not of partitioning or scan order. A
    plain double sum here would make every downstream assignment drift
    with the shuffle layout.

    Scale shape: per round, one narrow Arrow pass over a broadcast
    (k × dim) matrix (no corpus shuffle) + one posexplode'd hash-agg on
    the (cluster, pos) grain — k·dim groups, partially aggregated
    map-side, so the shuffle moves O(partitions · k · dim) partials, not
    the corpus. The driver materializes only the (k × dim) sum table
    (bounded by model size, like graph.py's scalar collects). Empty
    clusters keep their previous centroid (the ``_kmeans`` convention).
    """
    if iters < 0:
        raise ValueError("kmeans_lloyd() needs iters >= 0")
    spark = emb.sparkSession
    cent = train_centroids(
        emb, n_clusters, id_col, vec_col, sample_size, init_iters, seed
    )
    dim = cent.shape[1]
    vecs = emb.select(id_col, vec_col).persist()

    def _nearest_udf(bc):
        @F.pandas_udf(IntegerType())
        def nearest(v: pd.Series) -> pd.Series:
            c = bc.value
            m = _normalize(np.stack(v.map(np.asarray).to_list()).astype(np.float64))
            return pd.Series((m @ c.T).argmax(1).astype(np.int32))

        return nearest

    @F.pandas_udf("array<double>")
    def norm6(v: pd.Series) -> pd.Series:
        m = _normalize(np.stack(v.map(np.asarray).to_list()).astype(np.float64))
        return pd.Series(list(np.round(m, 6)))

    for _ in range(iters):
        bc = spark.sparkContext.broadcast(cent)
        parts = (
            vecs.withColumn("cluster_id", _nearest_udf(bc)(F.col(vec_col)))
            .withColumn("nv", norm6(F.col(vec_col)))
            .select("cluster_id", F.posexplode("nv").alias("pos", "val"))
            .groupBy("cluster_id", "pos")
            .agg(
                F.sum(F.col("val").cast("decimal(28,6)")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        sums = {(r["cluster_id"], r["pos"]): r["s"] for r in parts}
        counts = {r["cluster_id"]: r["n"] for r in parts}
        new = cent.copy()
        for c in range(len(cent)):
            n = counts.get(c)
            if n:
                mean = np.array(
                    [float(sums[(c, p)]) / n for p in range(dim)], dtype=np.float64
                )
                new[c] = mean / max(np.linalg.norm(mean), 1e-12)
        cent = new
    bc = spark.sparkContext.broadcast(cent)
    assigned = vecs.withColumn("cluster_id", _nearest_udf(bc)(F.col(vec_col))).select(
        F.col(id_col), F.col("cluster_id").cast("int").alias("cluster_id")
    )
    vecs.unpersist()
    return assigned, cent
