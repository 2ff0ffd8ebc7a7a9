"""Mergeable significant-digit quantile-histogram sketch (histsketch.py).

Pins the three properties the module's contract rests on:
merge-of-round-segments == rebuild-from-all-rows, sketch quantile ==
sig_trunc(exact percentile_disc) (monotone-map commutation), and exact
bucketing beyond 2^53 (where double arithmetic would mis-bucket).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from delphi_crawler_spark.operators.histsketch import (
    hist_quantiles,
    hist_segments,
    merge_segments,
    sig_trunc,
)
from delphi_crawler_spark.operators.quantiles import exact_quantiles


def _py_trunc(v: int, digits: int = 3) -> int:
    s = str(v)
    if len(s) <= digits:
        return v
    return int(s[:digits] + "0" * (len(s) - digits))


def _mk_values(spark, seed_rows):
    return spark.createDataFrame(seed_rows, "grp string, v bigint")


@pytest.fixture(scope="module")
def telemetry(spark):
    # deterministic skewed latencies: two groups, heavy tail, dupes, zeros
    rows = []
    for i in range(2000):
        base = (i * 2654435761) % 99991  # pseudo-random but reproducible
        rows.append(("a", base % 1500))
        rows.append(("b", (base * 7) % 120000))
    rows += [("a", 0), ("a", 0), ("b", 2**55 + 123456789)]  # edge values
    return _mk_values(spark, rows)


def test_sig_trunc_matches_python_including_past_2_53(spark):
    vals = [
        0, 1, 9, 10, 99, 100, 999, 1000, 1001, 123456, 999999,
        2**53 - 1, 2**53, 2**53 + 1, 2**60 + 987654321, 10**18 + 1,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v bigint")
    got = {
        r["v"]: r["t"]
        for r in df.select("v", sig_trunc(F.col("v")).alias("t")).collect()
    }
    for v in vals:
        assert got[v] == _py_trunc(v), v


def test_merge_of_round_segments_equals_rebuild(telemetry):
    # three "rounds" (disjoint row slices), like per-round bloom segments
    r1 = telemetry.where(F.crc32(F.concat_ws("|", "grp", "v")) % 3 == 0)
    r2 = telemetry.where(F.crc32(F.concat_ws("|", "grp", "v")) % 3 == 1)
    r3 = telemetry.where(F.crc32(F.concat_ws("|", "grp", "v")) % 3 == 2)
    merged = merge_segments(
        hist_segments(r1, "v", by="grp"),
        hist_segments(r2, "v", by="grp"),
        hist_segments(r3, "v", by="grp"),
    )
    rebuilt = hist_segments(telemetry, "v", by="grp")
    a = {tuple(r) for r in merged.collect()}
    b = {tuple(r) for r in rebuilt.collect()}
    assert a == b and len(a) > 10


def test_sketch_quantile_equals_truncated_exact_quantile(telemetry):
    qs = [0.5, 0.95, 0.99]
    seg = hist_segments(telemetry, "v", by="grp")
    got = {
        (r["grp"], r["q"]): (r["value"], r["n"])
        for r in hist_quantiles(seg, qs, by="grp").collect()
    }
    exact = {
        (r["grp"], r["q"]): (int(r["value"]), r["n"])
        for r in exact_quantiles(telemetry, "v", qs, by="grp").collect()
    }
    assert set(got) == set(exact)
    for key, (ev, en) in exact.items():
        sv, sn = got[key]
        assert sn == en, key
        # monotone-map commutation: sketch == trunc(exact), exactly
        assert sv == _py_trunc(ev), (key, sv, ev)
        # and the grid's relative-error bound holds
        if ev > 0:
            assert (ev - sv) / ev < 10 ** (1 - 3)


def test_quantiles_without_group(spark):
    df = spark.createDataFrame([(i,) for i in range(1, 1001)], "v bigint")
    seg = hist_segments(df, "v")
    out = {r["q"]: r["value"] for r in hist_quantiles(seg, [0.5, 0.99]).collect()}
    # percentile_disc rank = ceil(q*n): 500 -> 500, 990 -> 990
    assert out[0.5] == _py_trunc(500) == 500
    assert out[0.99] == _py_trunc(990)


def test_segment_size_bounded_by_grid_not_rows(spark):
    # 6-digit values: the grid collapses each decade to ≤900 buckets no
    # matter how many distinct raw values feed it
    df = spark.createDataFrame(
        [(100000 + i * 7,) for i in range(100000)], "v bigint"
    )
    seg = hist_segments(df, "v")
    n_buckets = seg.count()
    assert n_buckets <= 900  # one decade of the 3-digit grid
    assert seg.agg(F.sum("cnt")).first()[0] == 100000


def test_nulls_and_negatives_dropped(spark):
    df = spark.createDataFrame(
        [("a", None), ("a", -5), ("a", 7)], "grp string, v bigint"
    )
    seg = hist_segments(df, "v", by="grp")
    assert [tuple(r) for r in seg.collect()] == [("a", 7, 1)]
