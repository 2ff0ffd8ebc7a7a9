"""Exact distributed quantiles: correctness vs a plain-Python oracle,
parallelism invariance, and the percentile_disc rank convention."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from delphi_crawler_spark.operators.quantiles import exact_quantiles


def _disc(sorted_vals, q):
    n = len(sorted_vals)
    return sorted_vals[max(1, math.ceil(q * n)) - 1]


QS = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99, 1.0]


def test_exact_quantiles_vs_python_oracle(spark):
    import random

    rng = random.Random(7)
    vals = [round(rng.uniform(0, 1000), 3) for _ in range(997)]
    df = spark.createDataFrame([Row(v=v) for v in vals])
    out = {r["q"]: (r["value"], r["n"]) for r in exact_quantiles(df, "v", QS).collect()}
    s = sorted(vals)
    assert len(out) == len(QS)
    for q in QS:
        assert out[q] == (_disc(s, q), 997), q


def test_exact_quantiles_grouped_and_null_drop(spark):
    rows = [Row(g="a", v=float(i)) for i in range(1, 11)]
    rows += [Row(g="b", v=float(i * 10)) for i in range(1, 5)]
    rows += [Row(g="a", v=None)]  # dropped
    df = spark.createDataFrame(rows)
    out = {
        (r["g"], r["q"]): (r["value"], r["n"])
        for r in exact_quantiles(df, "v", [0.5, 1.0], by="g").collect()
    }
    assert out[("a", 0.5)] == (5.0, 10)
    assert out[("a", 1.0)] == (10.0, 10)
    assert out[("b", 0.5)] == (20.0, 4)
    assert out[("b", 1.0)] == (40.0, 4)


def test_exact_quantiles_ties_and_duplicates(spark):
    # heavy ties: value grain collapses to 3 rows; intervals must tile
    vals = [1.0] * 50 + [2.0] * 30 + [3.0] * 20
    df = spark.createDataFrame([Row(v=v) for v in vals])
    out = {r["q"]: r["value"] for r in exact_quantiles(df, "v", [0.5, 0.51, 0.8, 0.81]).collect()}
    assert out[0.5] == 1.0    # rank 50 -> last of the 1.0 run
    assert out[0.51] == 2.0   # rank 51 -> first of the 2.0 run
    assert out[0.8] == 2.0    # rank 80
    assert out[0.81] == 3.0   # rank 81


def test_exact_quantiles_parallelism_invariance(spark):
    import random

    rng = random.Random(11)
    rows = [
        Row(g=f"g{i % 3}", v=round(rng.uniform(0, 100), 2)) for i in range(600)
    ]
    df = spark.createDataFrame(rows)
    a = exact_quantiles(df, "v", QS, by="g", num_partitions=2)
    b = exact_quantiles(df.repartition(13), "v", QS, by="g", num_partitions=29)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb


def test_exact_quantiles_rejects_bad_q(spark):
    df = spark.createDataFrame([Row(v=1.0)])
    with pytest.raises(ValueError):
        exact_quantiles(df, "v", [])
    with pytest.raises(ValueError):
        exact_quantiles(df, "v", [1.5])


def test_keyed_variant_matches_two_phase(spark):
    """exact_quantiles_keyed (window path, many-small-groups trade-off)
    returns the identical result to the two-phase variant."""
    import random

    from delphi_crawler_spark.operators.quantiles import exact_quantiles_keyed

    rng = random.Random(23)
    rows = [
        Row(g=f"g{i % 11}", v=round(rng.uniform(0, 50), 2)) for i in range(800)
    ]
    df = spark.createDataFrame(rows)
    a = sorted(map(tuple, exact_quantiles(df, "v", QS, by="g").collect()))
    b = sorted(map(tuple, exact_quantiles_keyed(df, "v", QS, by="g").collect()))
    assert a == b


def test_exact_quantiles_empty_input(spark):
    """All-null (or zero-row) input returns an empty frame with the public
    schema instead of erroring (regression: F.create_map() with zero args)."""
    df = spark.createDataFrame([Row(g="a", v=None)], "g string, v double")
    out = exact_quantiles(df, "v", [0.5], by="g")
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == ["g", "q", "value", "n"]
    ungrouped = exact_quantiles(df.limit(0), "v", [0.5])
    assert ungrouped.collect() == []
    assert [f.name for f in ungrouped.schema.fields] == ["q", "value", "n"]


def test_exact_quantiles_releases_cache(spark):
    df = spark.createDataFrame([Row(v=float(i)) for i in range(100)])
    out = exact_quantiles(df, "v", [0.5])
    assert out.collect()[0]["value"] == 49.0  # rank ceil(0.5*100)=50 -> 49.0
    out._release_quantiles()  # must exist and not raise after materialization
