"""Coreset selection: greedy k-center (farthest-point) sampling over an
embedding column — the diversity-selection primitive of training-data
curation (Sener & Savarese, ICLR 2018 use it for active learning; the same
greedy 2-approximation of the k-center objective, Gonzalez 1985, picks a
maximally-spread document subset for annotation budgets, eval-set seeding,
or diverse fine-tuning mixtures). Complements the density-oriented family
(semantic dedup drops redundancy; k-center picks coverage).

Scale shape: the classic distributed greedy loop. State is one narrow
(id, vec, min_dist) table; each of the k rounds is

- one Arrow pass against a broadcast 1×dim center (update
  ``min_dist = min(min_dist, dist-to-new-center)`` — no shuffle), and
- one global top-1 by (min_dist DESC, id ASC) — Spark compiles
  ``orderBy().limit(1)`` to TakeOrderedAndProject, a per-partition top-1
  + driver merge, never a full sort shuffle.

So k centers cost k narrow passes, O(k · n / p) work per executor, driver
memory O(k · dim). State is localCheckpoint-ed per round so the plan stays
O(1) in k. Determinism at any partition count: per-row float math stays in
numpy (replicable by the independent oracle), distances are rounded to 6
decimals BEFORE the (dist, id) ordering, so the global argmax tie-breaks
exactly, and already-selected ids are excluded explicitly (duplicate
points at distance 0 can never re-enter).

Reference parity: the reference engine (a Maven crawler) has no embedding
ops; §2.10 training-data extension family.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from delphi_crawler_spark.operators.similarity import _normalize

__all__ = ["kcenter_select"]


def _dist_udf(spark, center: np.ndarray):
    bc = spark.sparkContext.broadcast(center)

    @F.pandas_udf(DoubleType())
    def dist(v: pd.Series) -> pd.Series:
        c = bc.value
        m = _normalize(np.stack(v.map(np.asarray).to_list()).astype(np.float64))
        return pd.Series(np.round(1.0 - m @ c, 6))

    return dist


def kcenter_select(
    emb: DataFrame,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy k-center over cosine distance (1 - cosine on unit vectors).

    Seed = the minimum-id row; each following round selects the point
    whose rounded distance to the selected set is largest (ties -> the
    smallest id). Returns a small DataFrame (sel_rank, id_col, dist6):
    ``dist6`` is the point's min-distance to the set at selection time
    (null for the seed) — the sequence of dist6 values is the classic
    non-increasing coverage-radius curve.
    """
    if k < 1:
        raise ValueError("kcenter_select() needs k >= 1")
    spark = emb.sparkSession
    vecs = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))

    seed = vecs.orderBy(F.col("id")).limit(1).collect()
    if not seed:
        return spark.createDataFrame(
            [], f"sel_rank bigint, {id_col} bigint, dist6 double"
        )
    seed_id = seed[0]["id"]
    center = _normalize(
        np.asarray(seed[0]["v"], dtype=np.float64)[None, :]
    )[0]
    picked = [(1, int(seed_id), None)]
    state = vecs.withColumn("mind", _dist_udf(spark, center)(F.col("v"))).localCheckpoint(
        eager=True
    )
    for r in range(2, k + 1):
        sel_ids = [p[1] for p in picked]
        top = (
            state.where(~F.col("id").isin(sel_ids))
            .orderBy(F.col("mind").desc(), F.col("id").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        row = top[0]
        picked.append((r, int(row["id"]), float(row["mind"])))
        center = _normalize(np.asarray(row["v"], dtype=np.float64)[None, :])[0]
        state = state.withColumn(
            "mind", F.least(F.col("mind"), _dist_udf(spark, center)(F.col("v")))
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        picked, f"sel_rank bigint, {id_col} bigint, dist6 double"
    )
