"""Deterministic corpus sharding: portability, determinism, balance."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from delphi_crawler_spark.operators.sharding import shard_id, shard_plan


def test_shard_id_matches_reference_md5(spark):
    """Spark's md5+conv assignment equals an independent hashlib path."""
    ids = ["0", "17", "abc", "9999999"]
    df = spark.createDataFrame([Row(k=i) for i in ids])
    got = {
        r["k"]: r["shard_id"]
        for r in df.select("k", shard_id(F.col("k"), 16)).collect()
    }
    for i in ids:
        expect = int(hashlib.md5(i.encode()).hexdigest()[:8], 16) % 16
        assert got[i] == expect, i


def test_shard_plan_balance_and_totals(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, w=10) for i in range(4096)]
    )
    out = shard_plan(docs, "doc_id", "w", n_shards=8).collect()
    assert sum(r["n_docs"] for r in out) == 4096
    assert sum(r["total_weight"] for r in out) == 40960
    assert abs(sum(r["weight_share"] for r in out) - 1.0) < 1e-4
    # uniform hash: every shard within 3x sqrt deviation of ideal 512
    for r in out:
        assert abs(r["n_docs"] - 512) < 3 * (512 ** 0.5) + 1, r


def test_shard_plan_deterministic_across_partitioning(spark):
    docs = spark.createDataFrame([Row(doc_id=i, w=i % 7) for i in range(500)])
    a = sorted(map(tuple, shard_plan(docs, "doc_id", "w", 4).collect()))
    b = sorted(
        map(tuple, shard_plan(docs.repartition(13), "doc_id", "w", 4).collect())
    )
    assert a == b


def test_shard_plan_rejects_bad_n(spark):
    docs = spark.createDataFrame([Row(doc_id=1, w=1)])
    with pytest.raises(ValueError):
        shard_plan(docs, "doc_id", "w", 0)


def test_group_weighted_sample_proportionality(spark):
    """Efraimidis-Spirakis order sampling: across many 2-item groups with
    weights (1, 3) and k=1, the heavy item wins ~3/4 of groups (md5-
    deterministic, so the frequency is a fixed number — pinned within a
    binomial tolerance); zero/null weights never win; ranks are identical
    at different parallelism."""
    from delphi_crawler_spark.operators.sampling import group_weighted_sample

    rows = []
    n_groups = 2000
    for g in range(n_groups):
        rows.append(("g%d" % g, 0, 1.0))
        rows.append(("g%d" % g, 1, 3.0))
        rows.append(("g%d" % g, 2, 0.0))   # excluded
        rows.append(("g%d" % g, 3, None))  # excluded
    df = spark.createDataFrame(rows, "grp string, id int, w double")
    won = group_weighted_sample(df, "grp", "id", "w", k=1)
    picks = {r["grp"]: r["id"] for r in won.collect()}
    assert len(picks) == n_groups
    assert all(i in (0, 1) for i in picks.values())
    heavy = sum(1 for i in picks.values() if i == 1)
    # E = 0.75, sd = sqrt(0.75*0.25/2000) ~ 0.0097 -> +-5 sd band
    assert 0.70 <= heavy / n_groups <= 0.80, heavy

    again = {
        r["grp"]: r["id"]
        for r in group_weighted_sample(df.repartition(17), "grp", "id", "w", k=1).collect()
    }
    assert again == picks
