"""KMV (k-minimum-values) distinct-count synopsis with set-overlap estimates.

The crawl telemetry question HLL cannot answer: "how many URLs do round A
and round B SHARE?" — HLL sketches union cheaply but not intersection.
The KMV synopsis (Bar-Yossef et al. 2002; Beyer et al., SIGMOD 2007
"On synopses for distinct-value estimation under multiset operations")
keeps the k smallest distinct hash values of a set; then

  DV(S)   ≈ (k-1) / pos(h_(k))          (pos = hash's uniform CDF position)
  sketch(A ∪ B) = k smallest of (sketch(A) ∪ sketch(B))   — EXACT closure
  |A ∩ B| ≈ (|{u ∈ U : u ∈ A and u ∈ B}| / k) · DV(A ∪ B)
            where U = the union sketch's values; u ∈ U belonging to set A
            is GUARANTEED to be in sketch(A) (it is among the k smallest
            of A ∪ B, hence among the k smallest of A), so the membership
            test needs only the sketches.

Everything is deterministic given ``xxhash64`` — no rng — so the whole
estimator is reproducible and oracle-checkable bit-for-bit.

Scale shape: the only full-data pass is one narrow hash projection +
per-partition distinct-top-k pruning inside an Arrow ``mapInPandas``
(numpy unique + partition sort; each partition emits ≤ k rows), then a
tiny global distinct + TakeOrdered over k·n_partitions rows. No full
distinct shuffle — the 10^10-row frontier never shuffles, only ≤ k rows
per partition do. Sketches are k-row DataFrames: mergeable, joinable,
checkpointable next to the bloom segments.

Reference parity: the reference tracks per-source document counts via
Elasticsearch count queries (ElasticStoreQueries.scala); cross-round
overlap synopses are the web-tier telemetry extension (SURVEY §2.10).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# signed-int64 hash -> uniform position in [0, 1): pos = h / 2^64 + 0.5
_TWO64 = 18446744073709551616.0


def _pos(col):
    return col.cast("double") / F.lit(_TWO64) + F.lit(0.5)


def kmv_sketch(df: DataFrame, key_col: str, k: int = 256) -> DataFrame:
    """Build the KMV synopsis of ``df[key_col]``: a DataFrame of the k
    smallest DISTINCT ``xxhash64(key)`` values, single column ``h``.

    Per-partition Arrow pruning (numpy unique + partial sort, ≤ k rows out
    per partition) keeps the global distinct + TakeOrdered tiny; no
    full-cardinality shuffle ever happens.
    """
    if k < 2:
        raise ValueError(f"kmv_sketch requires k >= 2, got {k}")
    hashed = df.select(F.xxhash64(F.col(key_col)).alias("h"))

    def prune(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        best: np.ndarray | None = None
        for b in batches:
            vals = np.unique(b["h"].to_numpy())
            merged = vals if best is None else np.unique(np.concatenate([best, vals]))
            best = merged[:k] if len(merged) > k else merged
        if best is not None and len(best):
            yield pd.DataFrame({"h": best})

    pruned = hashed.mapInPandas(prune, schema="h long")
    return pruned.distinct().orderBy("h").limit(k)


def kmv_merge(a: DataFrame, b: DataFrame, k: int = 256) -> DataFrame:
    """Union synopsis: k smallest of the two sketches' value union — exact
    closure, the merged sketch equals ``kmv_sketch`` of the concatenated
    inputs."""
    return a.unionByName(b).distinct().orderBy("h").limit(k)


def kmv_distinct_estimate(sketch: DataFrame, k: int = 256) -> DataFrame:
    """One-row (n_kept, est): if the sketch holds fewer than k values the
    set's distinct count is exact (= n_kept); otherwise the Beyer 2007
    unbiased estimator (k-1)/pos(h_(k))."""
    agg = sketch.agg(
        F.count(F.lit(1)).alias("n_kept"), F.max("h").alias("kth")
    )
    return agg.select(
        "n_kept",
        F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
        .otherwise(F.lit(float(k - 1)) / _pos(F.col("kth")))
        .alias("est"),
    )


def kmv_overlap(a: DataFrame, b: DataFrame, k: int = 256) -> DataFrame:
    """One-row overlap synopsis between two KMV sketches:
    (est_a, est_b, est_union, est_intersect, jaccard_est).

    est_intersect = (|U ∩ A ∩ B| / |U|) · est_union with U the union
    sketch — membership against full sets reduces to sketch joins (see
    module docstring). When |U| < k the union value set is complete and
    the intersection count is exact.
    """
    a = a.persist()
    b = b.persist()
    u = kmv_merge(a, b, k).persist()
    n_u = u.count()
    in_both = (
        u.join(a.withColumnRenamed("h", "ha"), u["h"] == F.col("ha"), "left_semi")
        .join(b.withColumnRenamed("h", "hb"), F.col("h") == F.col("hb"), "left_semi")
        .count()
    )
    est_a = kmv_distinct_estimate(a, k).collect()[0]["est"]
    est_b = kmv_distinct_estimate(b, k).collect()[0]["est"]
    est_u = kmv_distinct_estimate(u, k).collect()[0]["est"]
    est_int = (in_both / float(n_u)) * est_u if n_u else 0.0
    jacc = (in_both / float(n_u)) if n_u else 0.0
    a.unpersist()
    b.unpersist()
    u.unpersist()
    spark = u.sparkSession
    return spark.createDataFrame(
        [(k, float(est_a), float(est_b), float(est_u), float(est_int), float(jacc))],
        "k int, est_a double, est_b double, est_union double, "
        "est_intersect double, jaccard_est double",
    )
