"""Mergeable HyperLogLog segments: accuracy vs exact, exact max-merge,
partitioning invariance — the bloom-segment architecture applied to
distinct-count telemetry."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from delphi_crawler_spark.operators.hll import HLL, build_hll_segment


def _keys(spark, start, n, dup_factor=1):
    """n distinct keys (each repeated dup_factor times), xxhash64-hashed."""
    df = spark.range(start, start + n * dup_factor).select(
        (F.col("id") % n + start).alias("k")
    )
    return df.select(F.xxhash64(F.col("k").cast("string")).alias("url_hash64"))


def test_hll_estimate_within_error_bound(spark):
    n = 50_000
    seg = build_hll_segment(_keys(spark, 0, n, dup_factor=3), p=14)
    est = seg.estimate()
    # standard error 1.04/sqrt(2^14) ~ 0.8%; assert 4 sigma
    assert abs(est - n) / n < 0.033, est


def test_hll_merge_equals_single_build(spark):
    a = _keys(spark, 0, 20_000)
    b = _keys(spark, 10_000, 20_000)  # overlapping rounds
    sa = build_hll_segment(a, p=12)
    sb = build_hll_segment(b, p=12)
    su = build_hll_segment(a.unionByName(b), p=12)
    assert np.array_equal(sa.merge(sb).regs, su.regs)  # merge is EXACT


def test_hll_partitioning_invariance(spark):
    df = _keys(spark, 7, 30_000)
    s1 = build_hll_segment(df.repartition(2), p=12)
    s2 = build_hll_segment(df.repartition(23), p=12)
    assert np.array_equal(s1.regs, s2.regs)


def test_hll_empty_and_bounds(spark):
    assert build_hll_segment(_keys(spark, 0, 1).limit(0), p=10).estimate() == 0.0
    with pytest.raises(ValueError):
        HLL.empty(3)
