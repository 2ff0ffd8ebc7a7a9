"""Property-based tests (hypothesis) over the engine's pure kernels — the
invariants the distributed operators lean on, checked across generated
input spaces instead of hand-picked examples. No SparkSession: these run
the same numpy/pandas/Python code the executors run, hundreds of cases in
seconds.

Properties pinned:
- URL canonicalization is IDEMPOTENT (canon(canon(u)) == canon(u)) — the
  F1/J1 key discipline breaks without it (a re-canonicalized frontier
  would change keys between rounds).
- Version sort keys give Maven-normalization equalities and a total order
  consistent with numeric/qualifier semantics (J5 depends on it).
- Misra–Gries fold NEVER loses a key whose true frequency exceeds n/k
  (the pigeonhole guarantee hh_heavy_hitters' exactness is built on), in
  any batch split of the stream.
- Cuckoo filter has NO false negatives after any add/delete interleaving
  of disjoint key sets (J1b correctness), and deleting inserted keys
  never unsees the keys that remain.
- HLL register merge is commutative, associative, and idempotent (the
  treeReduce max-merge can combine segments in any shape).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from delphi_crawler_spark.functions.canonicalize import canonicalize_url_py
from delphi_crawler_spark.functions.versions import version_sort_key_py
from delphi_crawler_spark.operators.cuckoo import CuckooFilter
from delphi_crawler_spark.operators.heavy import _mg_fold
from delphi_crawler_spark.operators.hll import HLL

# --------------------------------------------------------------- canonical

_url_path = st.text(
    alphabet=st.characters(
        codec="ascii", exclude_characters="#?\x00\r\n", min_codepoint=33
    ),
    max_size=40,
)
_host = st.from_regex(r"[A-Za-z0-9]([A-Za-z0-9.-]{0,20}[A-Za-z0-9])?", fullmatch=True)
_scheme = st.sampled_from(["http", "https", "HTTP", "HtTpS"])
_port = st.sampled_from(["", ":80", ":443", ":8080"])


@settings(max_examples=300, deadline=None)
@given(_scheme, _host, _port, _url_path)
def test_canonicalize_idempotent(scheme, host, port, path):
    u = f"{scheme}://{host}{port}/{path}"
    once = canonicalize_url_py(u)
    if once is not None:
        assert canonicalize_url_py(once) == once


@settings(max_examples=200, deadline=None)
@given(_host, _url_path)
def test_canonicalize_case_of_scheme_host_irrelevant(host, path):
    a = canonicalize_url_py(f"https://{host}/{path}")
    b = canonicalize_url_py(f"HTTPS://{host.upper()}/{path}")
    assert a == b


# ----------------------------------------------------------------- versions

_num = st.integers(min_value=0, max_value=99)


@settings(max_examples=200, deadline=None)
@given(_num, _num, _num)
def test_version_zero_trim_equalities(a, b, c):
    # Maven normalization: trailing .0 runs are insignificant
    assert version_sort_key_py(f"{a}.{b}") == version_sort_key_py(f"{a}.{b}.0")
    assert version_sort_key_py(f"{a}") == version_sort_key_py(f"{a}.0.0")
    # pre-release sorts before the release it qualifies
    assert version_sort_key_py(f"{a}.{b}.{c}-alpha") < version_sort_key_py(
        f"{a}.{b}.{c}"
    )


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(_num, _num, _num), min_size=2, max_size=8))
def test_version_order_matches_numeric_order(vs):
    strs = [f"{a}.{b}.{c}" for a, b, c in vs]
    by_key = sorted(strs, key=version_sort_key_py)
    by_num = sorted(strs, key=lambda s: tuple(int(x) for x in s.split(".")))
    assert [tuple(int(x) for x in s.split(".")) for s in by_key] == [
        tuple(int(x) for x in s.split(".")) for s in by_num
    ]


# -------------------------------------------------------------- Misra–Gries


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=400),
    st.integers(min_value=2, max_value=10),
    st.data(),
)
def test_mg_fold_keeps_heavy_keys_under_any_split(stream, k, data):
    # fold the stream in arbitrary batch splits; every key with
    # freq > n/k must survive in the final summary
    n = len(stream)
    cuts = sorted(
        data.draw(
            st.lists(st.integers(min_value=0, max_value=n), max_size=5)
        )
    )
    bounds = [0] + cuts + [n]
    summary: dict = {}
    for lo, hi in zip(bounds, bounds[1:]):
        if hi > lo:
            summary = _mg_fold(
                summary, pd.Series(stream[lo:hi]).value_counts(), k
            )
    true = pd.Series(stream).value_counts()
    for key, cnt in true.items():
        if cnt > n / k:
            assert key in summary


# -------------------------------------------------------------------- cuckoo


@settings(max_examples=80, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=2**63 - 1), min_size=1,
             max_size=300, unique=True),
    st.data(),
)
def test_cuckoo_no_false_negatives_and_delete_safety(keys, data):
    arr = np.array(keys, dtype=np.uint64)
    cf = CuckooFilter.sized(max(len(arr), 16))
    cf.add_many(arr)
    assert bool(cf.might_contain_many(arr).all())

    n_del = data.draw(st.integers(min_value=0, max_value=len(arr)))
    gone, kept = arr[:n_del], arr[n_del:]
    cf.delete_many(gone)
    if len(kept):
        # deleting other keys must never unsee the survivors
        assert bool(cf.might_contain_many(kept).all())


# ----------------------------------------------------------------------- HLL


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
             min_size=0, max_size=200),
    st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
             min_size=0, max_size=200),
    st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
             min_size=0, max_size=200),
)
def test_hll_merge_commutative_associative_idempotent(xs, ys, zs):
    def seg(vals):
        h = HLL.empty(p=12)
        if vals:
            h.add_many(np.array(vals, dtype=np.int64).view(np.uint64))
        return h

    a, b, c = seg(xs), seg(ys), seg(zs)
    ab_c = a.merge(b).merge(c).regs
    c_ba = c.merge(b.merge(a)).regs
    assert (ab_c == c_ba).all()
    # idempotent: merging a segment into itself changes nothing
    assert (a.merge(a).regs == a.regs).all()
    # merge of everything == one segment over the concatenation
    allv = seg(xs + ys + zs)
    assert (a.merge(b).merge(c).regs == allv.regs).all()


# ---------------------------------------------------------------------- bloom


@settings(max_examples=80, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=2**63 - 1), min_size=1,
             max_size=400, unique=True),
)
def test_bloom_no_false_negatives_and_or_merge(keys):
    from delphi_crawler_spark.operators.seen import BloomBits

    arr = np.array(keys, dtype=np.uint64)
    half = len(arr) // 2
    a = BloomBits.sized(max(len(arr), 16))
    b = BloomBits.sized(max(len(arr), 16))
    a.add_many(arr[:half])
    b.add_many(arr[half:])
    # OR-merge of segments sees everything either segment saw
    merged = BloomBits(a.m_bits, a.k, a.words | b.words)
    assert bool(merged.might_contain_many(arr).all())


# -------------------------------------------------------------------- packing


@settings(max_examples=120, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=60),
    st.integers(min_value=8, max_value=64),
)
def test_pack_group_invariants(tokens, budget):
    from delphi_crawler_spark.operators.packing import _pack_group

    pdf = pd.DataFrame(
        {
            "shard": [0] * len(tokens),
            "doc_id": range(len(tokens)),
            "n_tokens": tokens,
        }
    )
    out = _pack_group(pdf, budget)
    # every doc packed exactly once, order preserved within sequences
    assert sorted(out["doc_id"]) == list(range(len(tokens)))
    for seq_id, g in out.groupby("seq_id"):
        g = g.sort_values("pos_in_seq")
        # a sequence only exceeds the budget when a single doc does
        assert g["n_tokens"].sum() <= budget or len(g) == 1
        # offsets are the exclusive prefix sums of the sequence
        assert list(g["tok_offset"]) == list(
            np.concatenate([[0], np.cumsum(g["n_tokens"].to_numpy())[:-1]])
        )
        assert (g["seq_tokens"] == g["n_tokens"].sum()).all()
    # sequences are numbered 0..S-1 without gaps
    assert sorted(out["seq_id"].unique()) == list(range(out["seq_id"].max() + 1))


# ------------------------------------------------------------ content digest
# (needs Spark — placed here because the properties are the point: order/
# partitioning invariance and difference sensitivity across generated rows)


def test_content_digest_invariances(spark):
    from delphi_crawler_spark.functions.digest import content_digest, frames_equal

    rows = [(i, f"u{i % 7}", float(i % 13)) for i in range(500)]
    a = spark.createDataFrame(rows, "id long, k string, v double")
    # permuted row order + different partitioning + different column order
    b = (
        spark.createDataFrame(
            [(r[1], r[2], r[0]) for r in reversed(rows)], "k string, v double, id long"
        ).repartition(13)
    )
    assert frames_equal(a, b)

    # sensitivity: one changed row flips the digest
    c = spark.createDataFrame(
        [((r[0], r[1], r[2] + 1.0) if r[0] == 250 else r) for r in rows],
        "id long, k string, v double",
    )
    assert not frames_equal(a, c)
    # a dropped row flips it too (count catches what XOR pairs might cancel)
    d = spark.createDataFrame(rows[:-1], "id long, k string, v double")
    assert not frames_equal(a, d)
    # duplicate-pair cancellation is caught by the count component
    e = spark.createDataFrame(rows + rows[:2] + rows[:2], "id long, k string, v double")
    assert not frames_equal(a, e)

    assert content_digest(a.where("id < 0")) == (0, 0, 0)

    # XOR-cancelling duplicate pairs with equal counts must still differ
    # (the SUM component catches what XOR is blind to)
    pa = spark.createDataFrame([(1, "x", 0.0)] * 2, "id long, k string, v double")
    pb = spark.createDataFrame([(2, "y", 1.0)] * 2, "id long, k string, v double")
    assert not frames_equal(pa, pb)
    # null-position swaps between same-typed columns must differ
    na = spark.createDataFrame([(5, None)], "a long, b long")
    nb = spark.createDataFrame([(None, 5)], "a long, b long")
    assert not frames_equal(na, nb)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        content_digest(a, cols=[])
