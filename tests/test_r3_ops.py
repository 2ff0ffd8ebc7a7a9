"""Round-3 operator tests: semantic dedup (k-means cells), exact heavy
hitters (Misra-Gries two-pass), DSIR-style importance weights, and
crawler-trap URL pattern mining."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from delphi_crawler_spark.operators.heavy import _mg_fold, heavy_hitters, mg_candidates
from delphi_crawler_spark.operators.corpus import importance_weights
from delphi_crawler_spark.operators.semantic import kmeans_assign, semantic_dedup
from delphi_crawler_spark.operators.traps import trap_patterns, url_pattern


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


# ---------------------------------------------------------------- semantic


def test_semantic_dedup_crafted(spark):
    # two tight groups on orthogonal axes + one isolated vector
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0, 0.0]),
        Row(vec_id=1, embedding=[0.999, 0.03, 0.0]),   # dup of 0
        Row(vec_id=2, embedding=[0.0, 1.0, 0.0]),
        Row(vec_id=3, embedding=[0.02, 0.999, 0.0]),   # dup of 2
        Row(vec_id=4, embedding=[0.0, 0.0, 1.0]),      # isolated
    ]
    emb = spark.createDataFrame(rows)
    out = semantic_dedup(emb, n_clusters=3, threshold=0.95, sample_size=100).collect()
    by_id = {r["vec_id"]: r for r in out}
    assert by_id[0]["keep"] and by_id[2]["keep"] and by_id[4]["keep"]
    assert not by_id[1]["keep"] and by_id[1]["n_dup_lower"] == 1
    assert not by_id[3]["keep"]
    assert by_id[1]["max_cos_lower"] >= 0.95
    assert by_id[4]["max_cos_lower"] is None


def test_semantic_dedup_matches_per_cluster_bruteforce(spark, emb):
    """The cell-local verdict must equal a brute-force recomputation inside
    the same cells (independent pandas/numpy path)."""
    import numpy as np

    out = semantic_dedup(emb, n_clusters=4, threshold=0.35).toPandas()
    assigned = kmeans_assign(emb, n_clusters=4).select("vec_id", "cluster_id", "embedding").toPandas()
    got = out.sort_values("vec_id").reset_index(drop=True)
    # brute force per cluster
    drops: dict[int, tuple[int, float]] = {}
    for _, grp in assigned.groupby("cluster_id"):
        g = grp.sort_values("vec_id")
        ids = g["vec_id"].to_numpy()
        m = np.stack(g["embedding"].map(np.asarray).to_list()).astype(np.float64)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = mn @ mn.T
        for i in range(len(ids)):
            n_dup, best = 0, None
            for j in range(i):
                c = round(sims[i, j], 6)
                if c >= 0.35:
                    n_dup += 1
                    best = c if best is None else max(best, c)
            if n_dup:
                drops[int(ids[i])] = (n_dup, best)
    for _, r in got.iterrows():
        vid = int(r["vec_id"])
        if vid in drops:
            assert not r["keep"]
            assert int(r["n_dup_lower"]) == drops[vid][0]
            assert abs(float(r["max_cos_lower"]) - drops[vid][1]) < 2e-6
        else:
            assert r["keep"]


def test_kmeans_assign_deterministic(spark, emb):
    a = kmeans_assign(emb, n_clusters=4).select("vec_id", "cluster_id")
    b = kmeans_assign(emb.repartition(7), n_clusters=4).select("vec_id", "cluster_id")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


# ------------------------------------------------------------ heavy hitters


def test_mg_fold_bounded_and_conservative():
    import pandas as pd

    s: dict = {}
    s = _mg_fold(s, pd.Series({"a": 50, "b": 30}), k=3)
    s = _mg_fold(s, pd.Series({f"x{i}": 1 for i in range(100)}), k=3)
    assert len(s) <= 3
    assert "a" in s  # the dominant key survives every fold


def test_heavy_hitters_exact_vs_full_shuffle(spark):
    rows = (
        [Row(key="a")] * 50 + [Row(key="b")] * 30 + [Row(key=f"s{i}") for i in range(100)]
    )
    df = spark.createDataFrame(rows).repartition(7)
    got = {(r["key"], r["cnt"]) for r in heavy_hitters(df, "key", k=5).collect()}
    n = df.count()
    exact = {
        (r["key"], r["cnt"])
        for r in df.groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * 5 >= n)
        .collect()
    }
    assert got == exact == {("a", 50)}


def test_mg_candidates_superset_guarantee(spark):
    # key with global share exactly 1/k must appear among candidates
    rows = [Row(key="hh")] * 40 + [Row(key=f"z{i % 160}") for i in range(160)]
    df = spark.createDataFrame(rows).repartition(11)  # n=200, k=5 -> thr 40
    cands = {r["key"] for r in mg_candidates(df, "key", k=5).collect()}
    assert "hh" in cands
    got = {r["key"] for r in heavy_hitters(df, "key", k=5).collect()}
    assert got == {"hh"}


# ------------------------------------------------------- importance weights


def test_importance_weights_crafted(spark):
    rows = [
        Row(doc_id=0, text="good good fine", tgt=True),
        Row(doc_id=1, text="bad bad ugly", tgt=False),
        Row(doc_id=2, text="good bad", tgt=False),
    ]
    docs = spark.createDataFrame(rows)
    out = {
        r["doc_id"]: r
        for r in importance_weights(docs, F.col("tgt"), "doc_id", "text").collect()
    }
    # independent python replication
    raw = {"good": 3, "fine": 1, "bad": 3, "ugly": 1}
    tgt = {"good": 2, "fine": 1, "bad": 0, "ugly": 0}
    R, T, V = 8.0, 3.0, 4.0
    def lr(w):
        return math.log((tgt[w] + 1) / (T + V)) - math.log((raw[w] + 1) / (R + V))
    exp0 = round((2 * lr("good") + lr("fine")) / 3, 6)
    exp1 = round((2 * lr("bad") + lr("ugly")) / 3, 6)
    assert out[0]["n_tokens"] == 3
    assert abs(out[0]["avg_logratio"] - exp0) < 1e-9
    assert abs(out[1]["avg_logratio"] - exp1) < 1e-9
    # target-like doc scores above target-unlike doc
    assert out[0]["avg_logratio"] > out[2]["avg_logratio"] > out[1]["avg_logratio"]


# ------------------------------------------------------------ trap patterns


def test_url_pattern_collapse(spark):
    df = spark.createDataFrame(
        [
            Row(p="/cal/2024/123/view"),
            Row(p="/item/deadbeefcafe1234/x"),
            Row(p="/a1b2/page9"),
        ]
    ).select(url_pattern(F.col("p")).alias("pat"))
    got = [r["pat"] for r in df.collect()]
    assert got[0] == "/cal/N/N/view"
    assert got[1] == "/item/H/x"  # hex run collapses BEFORE digit rule
    assert got[2] == "/aNbN/pageN"


def test_trap_patterns_flags_dominant_template(spark):
    rows = [Row(host="h0", path=f"/cal/2024/{i}/view") for i in range(60)] + [
        Row(host="h0", path=f"/about/team{i % 3}") for i in range(20)
    ] + [Row(host="h1", path=f"/p/{i}") for i in range(10)]
    out = trap_patterns(
        spark.createDataFrame(rows), min_pattern_urls=50, max_share=0.5
    ).collect()
    by = {(r["host"], r["pattern"]): r for r in out}
    trap = by[("h0", "/cal/N/N/view")]
    assert trap["is_trap"] and trap["n_urls"] == 60 and trap["host_urls"] == 80
    assert not by[("h0", "/about/teamN")]["is_trap"]
    # h1's template dominates its host but is absolutely small -> not a trap
    assert not by[("h1", "/p/N")]["is_trap"]


def test_heavy_hitters_null_keys_excluded(spark):
    """Null keys are excluded from BOTH the candidate stream and n: a
    null-heavy stream must not skew the threshold for real keys, and the
    result equals the null-filtered full-shuffle SQL (operator contract)."""
    from pyspark.sql import Row

    rows = [Row(key="hot") for _ in range(40)]
    rows += [Row(key=None) for _ in range(55)]          # majority null
    rows += [Row(key=f"c{i}") for i in range(5)]
    df = spark.createDataFrame(rows, "key string")
    got = {(r["key"], r["cnt"]) for r in heavy_hitters(df, "key", k=2).collect()}
    # non-null n = 45; threshold n/k = 22.5 -> only 'hot' (40) qualifies.
    # counting nulls in n (100 -> threshold 50) would wrongly drop 'hot'.
    assert got == {("hot", 40)}
