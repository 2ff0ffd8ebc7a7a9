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


def test_cms_merge_equals_rebuild_and_guarantees(spark):
    """Count-Min sketch: (a) vectorized row hash == scalar spec impl;
    (b) sum-merging per-round segments is bit-identical to one build over
    the union; (c) estimates are one-sided (>= exact) even under forced
    collisions, and exact when width is generous."""
    import numpy as np
    import pandas as pd

    from delphi_crawler_spark.operators.cms import CMS, build_cms_segment, xxh64_u64
    from tools.gen_expected import xxh64_long

    vals = np.array(
        [0, 1, -1, 2**63 - 1, -(2**63), 424242, 7], dtype=np.int64
    ).view(np.uint64)
    for seed in (0, 1, 2, 3):
        got = xxh64_u64(vals, seed)
        want = [xxh64_long(int(v), seed) % 2**64 for v in vals.view(np.int64)]
        assert [int(g) for g in got] == want

    rng = np.random.default_rng(5)
    keys = rng.integers(0, 300, 20000, dtype=np.int64)  # zipf-ish reuse
    df = spark.createDataFrame(pd.DataFrame({"k": keys}))
    hashed = df.select(F.xxhash64("k").alias("h"))

    full = build_cms_segment(hashed, col="h", depth=4, width=64)  # collisions
    # segments over a disjoint split: rows 0..8999 / 9000.. via ordered ids
    df2 = df.select("k", F.monotonically_increasing_id().alias("i"))
    lo = df2.where(F.col("i") < 9000).select(F.xxhash64("k").alias("h"))
    hi = df2.where(F.col("i") >= 9000).select(F.xxhash64("k").alias("h"))
    m = build_cms_segment(lo, col="h", depth=4, width=64).merge(
        build_cms_segment(hi, col="h", depth=4, width=64)
    )
    assert np.array_equal(m.counts, full.counts)  # merge == rebuild

    import collections

    exact = collections.Counter(keys.tolist())
    probe_keys = np.array(sorted(exact), dtype=np.int64)
    probe_h = (
        spark.createDataFrame(pd.DataFrame({"k": probe_keys}))
        .select(F.xxhash64("k").alias("h"))
        .toPandas()["h"]
        .to_numpy(dtype="int64")
        .view(np.uint64)
    )
    est = full.estimate_many(probe_h)
    assert all(int(e) >= exact[int(k)] for e, k in zip(est, probe_keys))

    wide = build_cms_segment(hashed, col="h", depth=4, width=1 << 14)
    est_w = wide.estimate_many(probe_h)
    assert all(int(e) == exact[int(k)] for e, k in zip(est_w, probe_keys))
