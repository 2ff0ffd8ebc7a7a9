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
    """
    assigned = kmeans_assign(
        emb, n_clusters, id_col, vec_col, sample_size, iters, seed
    ).select(F.col(id_col), F.col(vec_col), "cluster_id")
    left = assigned.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "cluster_id"
    )
    right = assigned.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "cluster_id"
    )
    pairs = (
        left.join(right, "cluster_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cosine_col(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_b", "cosine")
    )
    dup_stats = pairs.groupBy("id_b").agg(
        F.count(F.lit(1)).alias("n_dup_lower"),
        F.max("cosine").alias("max_cos_lower"),
    )
    return (
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
