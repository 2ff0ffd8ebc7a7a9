"""Redirect-chain resolution: exact hops, terminals, cycles, invariance."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from delphi_crawler_spark.operators.redirects import resolve_redirects


def test_chain_terminal_and_hops(spark):
    edges = spark.createDataFrame(
        [Row(src="a", dst="b"), Row(src="b", dst="c"), Row(src="c", dst="T")]
    )
    out = {r["src"]: r for r in resolve_redirects(edges).collect()}
    assert (out["a"]["final"], out["a"]["hops"], out["a"]["is_cycle"]) == ("T", 3, 0)
    assert (out["b"]["final"], out["b"]["hops"]) == ("T", 2)
    assert (out["c"]["final"], out["c"]["hops"]) == ("T", 1)


def test_cycles_flagged_not_followed(spark):
    edges = spark.createDataFrame(
        [
            Row(src="x", dst="x"),          # self-loop
            Row(src="p", dst="q"),
            Row(src="q", dst="p"),          # 2-cycle
            Row(src="in", dst="p"),         # feeds the cycle: unresolvable
            Row(src="ok", dst="done"),      # clean 1-hop
        ]
    )
    out = {r["src"]: r for r in resolve_redirects(edges).collect()}
    for s in ("x", "p", "q", "in"):
        assert out[s]["is_cycle"] == 1 and out[s]["final"] == "-" and out[s]["hops"] == -1
    assert (out["ok"]["final"], out["ok"]["hops"], out["ok"]["is_cycle"]) == ("done", 1, 0)


def test_long_chain_within_cap_resolves_exactly(spark):
    n = 20  # < default max_hops=32, > one doubling round
    edges = spark.createDataFrame(
        [Row(src=f"u{i}", dst=f"u{i+1}") for i in range(n)]
    )
    out = {r["src"]: r for r in resolve_redirects(edges).collect()}
    assert out["u0"]["final"] == f"u{n}" and out["u0"]["hops"] == n
    assert out[f"u{n-1}"]["hops"] == 1


def test_chain_beyond_cap_is_unresolved(spark):
    edges = spark.createDataFrame(
        [Row(src=f"u{i}", dst=f"u{i+1}") for i in range(40)]
    )
    out = {r["src"]: r for r in resolve_redirects(edges, max_hops=32).collect()}
    assert out["u0"]["is_cycle"] == 1  # does not terminate within the cap
    assert out["u20"]["final"] == "u40"  # tail still resolves


def test_parallelism_invariance(spark):
    edges = spark.createDataFrame(
        [Row(src=f"u{i}", dst=(f"u{i+1}" if i % 7 else f"T{i}")) for i in range(300)]
    )
    a = sorted(map(tuple, resolve_redirects(edges).collect()))
    b = sorted(map(tuple, resolve_redirects(edges.repartition(17)).collect()))
    assert a == b


def test_rejects_bad_cap(spark):
    edges = spark.createDataFrame([Row(src="a", dst="b")])
    with pytest.raises(ValueError):
        resolve_redirects(edges, max_hops=0)
