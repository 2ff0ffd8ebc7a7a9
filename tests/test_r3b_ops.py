"""Round-3 batch-2 operator tests: duplicated-substring windows (ExactSubstr
shape), snapshot diff (recrawl change detection), inverted index, and
per-group deterministic uniform sampling."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from delphi_crawler_spark.operators.invindex import inverted_index
from delphi_crawler_spark.operators.sampling import group_uniform_sample
from delphi_crawler_spark.operators.snapshot import diff_summary, snapshot_diff
from delphi_crawler_spark.operators.substrings import duplicate_window_stats


# ----------------------------------------------------- duplicate substrings


def test_duplicate_windows_cross_doc(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c d e f g h"),   # exactly one 8-window
            Row(doc_id=2, text="a b c d e f g h"),   # verbatim dup of doc 1
            Row(doc_id=3, text="p q r s t u v w"),   # unique window
            Row(doc_id=4, text="x y"),               # too short: no windows
        ]
    )
    out = {r["doc_id"]: r for r in duplicate_window_stats(docs, k=8).collect()}
    assert len(out) == 4
    assert out[1]["n_windows"] == 1 and out[1]["n_dup_windows"] == 1
    assert out[2]["n_dup_windows"] == 1 and out[2]["dup_frac"] == 1.0
    assert out[3]["n_windows"] == 1 and out[3]["n_dup_windows"] == 0
    assert out[4]["n_windows"] == 0 and out[4]["dup_frac"] == 0.0


def test_duplicate_windows_within_doc_repeat_counts(spark):
    # the same trigram twice INSIDE one doc is a duplicate per ExactSubstr
    docs = spark.createDataFrame([Row(doc_id=1, text="a b c z a b c")])
    out = duplicate_window_stats(docs, k=3).collect()[0]
    # windows: abc bcz cza zab abc -> 'a b c' occurs twice
    assert out["n_windows"] == 5
    assert out["n_dup_windows"] == 2


def test_duplicate_windows_plan_no_cartesian(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="a b c d e f g h")])
    plan = duplicate_window_stats(docs, k=8)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


# ------------------------------------------------------------ snapshot diff


def test_snapshot_diff_all_statuses(spark):
    prev = spark.createDataFrame(
        [Row(url="a", digest="1"), Row(url="b", digest="2"), Row(url="c", digest="3")]
    )
    curr = spark.createDataFrame(
        [Row(url="a", digest="1"), Row(url="b", digest="9"), Row(url="d", digest="4")]
    )
    out = {r["key"]: r["status"] for r in snapshot_diff(prev, curr).collect()}
    assert out == {"a": "unchanged", "b": "changed", "c": "removed", "d": "added"}


def test_snapshot_diff_summary_counts(spark):
    prev = spark.createDataFrame([Row(url=f"u{i}", digest=str(i)) for i in range(10)])
    curr = spark.createDataFrame(
        [Row(url=f"u{i}", digest=str(i if i % 2 else -i)) for i in range(2, 12)]
    )
    s = {r["status"]: r["n"] for r in diff_summary(snapshot_diff(prev, curr)).collect()}
    # u0,u1 removed; u10,u11 added; even of 2..9 changed (2,4,6,8); odd unchanged
    assert s == {"removed": 2, "added": 2, "changed": 4, "unchanged": 4}


# ----------------------------------------------------------- inverted index


def test_inverted_index_postings(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=10, text="spark spark table"),
            Row(doc_id=2, text="table row"),
            Row(doc_id=30, text="row table spark"),
        ]
    )
    out = {r["term"]: r for r in inverted_index(docs).collect()}
    assert out["spark"]["df"] == 2 and out["spark"]["tf"] == 3
    # string-sorted ids: '10' < '30'
    assert out["spark"]["postings_csv"] == "10,30"
    assert out["table"]["df"] == 3 and out["table"]["postings_csv"] == "10,2,30"
    assert out["row"]["tf"] == 2


def test_inverted_index_min_df_and_cap(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="common unique%d" % i) for i in range(5)]
    )
    out = inverted_index(docs, min_df=2, max_postings=3).collect()
    assert len(out) == 1  # only 'common' survives min_df=2
    r = out[0]
    assert r["df"] == 5 and r["tf"] == 5
    assert r["postings_csv"] == "0,1,2"  # capped at 3, df/tf still full


# ------------------------------------------------------------ group sample


def test_group_sample_cap_and_determinism(spark):
    rows = [Row(host=f"h{i % 3}", doc_id=i) for i in range(100)]
    df = spark.createDataFrame(rows)
    a = group_uniform_sample(df, "host", "doc_id", k=5)
    got = a.groupBy("host").agg(F.count(F.lit(1)).alias("n")).collect()
    assert all(r["n"] == 5 for r in got)
    ranks = {(r["host"], r["sample_rank"]) for r in a.collect()}
    assert all(1 <= rk <= 5 for _h, rk in ranks)
    # deterministic: a different input ordering picks the identical rows
    b = group_uniform_sample(
        df.orderBy(F.col("doc_id").desc()), "host", "doc_id", k=5
    )
    assert {(r["host"], r["doc_id"]) for r in a.collect()} == {
        (r["host"], r["doc_id"]) for r in b.collect()
    }


def test_group_sample_small_group_keeps_all(spark):
    df = spark.createDataFrame([Row(host="h", doc_id=1), Row(host="h", doc_id=2)])
    out = group_uniform_sample(df, "host", "doc_id", k=10).collect()
    assert len(out) == 2


# ------------------------------------------------- randomized cross-checks


def test_duplicate_windows_random_vs_python(spark):
    """Spark result equals a pure-Python per-corpus recomputation on random
    corpora (3 seeds x 40 docs, vocab small enough to force collisions)."""
    import random
    from collections import Counter

    for seed in (3, 17, 91):
        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(6)]
        docs = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 14))))
            for i in range(40)
        ]
        k = 4
        # python oracle
        wins_per_doc = {}
        tot = Counter()
        for i, t in docs:
            toks = t.split()
            ws = [" ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)]
            wins_per_doc[i] = ws
            tot.update(ws)
        expect = {
            i: (
                len(ws),
                sum(1 for w in ws if tot[w] >= 2),
            )
            for i, ws in wins_per_doc.items()
        }
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        got = {
            r["doc_id"]: (r["n_windows"], r["n_dup_windows"])
            for r in duplicate_window_stats(df, k=k).collect()
        }
        assert got == expect, f"seed {seed}"


def test_snapshot_diff_partition_invariance(spark):
    """The diff is a pure join — identical at any parallelism."""
    prev = spark.createDataFrame(
        [(f"u{i}", str(i % 7)) for i in range(200)], ["url", "digest"]
    )
    curr = spark.createDataFrame(
        [(f"u{i}", str((i + i % 3) % 7)) for i in range(50, 250)], ["url", "digest"]
    )
    a = sorted(map(tuple, snapshot_diff(prev, curr).collect()))
    b = sorted(
        map(
            tuple,
            snapshot_diff(prev.repartition(17), curr.repartition(3)).collect(),
        )
    )
    assert a == b and len(a) == 250


def test_duplicate_windows_hash_keys_equivalent(spark):
    """The xxhash64 shuffle path gives identical stats at test scale
    (collisions need ~2^32 windows)."""
    import random

    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(8)]
    docs = spark.createDataFrame(
        [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 20))))
            for i in range(60)
        ],
        ["doc_id", "text"],
    )
    a = sorted(map(tuple, duplicate_window_stats(docs, k=5).collect()))
    b = sorted(
        map(tuple, duplicate_window_stats(docs, k=5, hash_keys=True).collect())
    )
    assert a == b


def test_render_spans_order_and_placeholders(spark):
    """Rendering preserves the span-sequence invariant: pieces appear in
    offset order (even when the input array is shuffled), media spans
    become placeholders carrying the ref."""
    from delphi_crawler_spark.operators.links import render_spans

    spans = [  # deliberately OUT of offset order in the array
        {"kind": "media", "text": "", "media_ref": "m://7", "offset": 2},
        {"kind": "text", "text": "hello", "media_ref": None, "offset": 0},
        {"kind": "link", "text": "http://x", "media_ref": None, "offset": 1},
        {"kind": "text", "text": "bye", "media_ref": None, "offset": 3},
    ]
    df = spark.createDataFrame(
        [(1, spans)],
        "doc_id long, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    out = render_spans(df).collect()[0]
    assert out["rendered"] == "hello http://x [MEDIA:m://7] bye"


def test_inverted_index_delta_merge_equals_rebuild(spark):
    """Mergeable-summary property: index(A ∪ B) == merge(index(A), index(B))
    for disjoint doc sets, in any merge order."""
    from delphi_crawler_spark.operators.invindex import (
        inverted_index_delta,
        merge_index_deltas,
    )

    import random

    rng = random.Random(41)
    vocab = [f"w{i}" for i in range(9)]
    mk = lambda ids: [  # noqa: E731
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12))))
        for i in ids
    ]
    a = spark.createDataFrame(mk(range(0, 25)), ["doc_id", "text"])
    b = spark.createDataFrame(mk(range(25, 60)), ["doc_id", "text"])

    full = inverted_index_delta(a.unionByName(b))
    merged = merge_index_deltas(inverted_index_delta(a), inverted_index_delta(b))
    merged_rev = merge_index_deltas(
        inverted_index_delta(b), inverted_index_delta(a)
    )
    key = lambda df: sorted(  # noqa: E731
        (r["term"], r["df"], r["tf"], tuple(r["postings"])) for r in df.collect()
    )
    assert key(full) == key(merged) == key(merged_rev)


def test_registrable_domain_cases(spark):
    from delphi_crawler_spark.operators.domains import registrable_domain

    cases = {
        "www.example.com": "example.com",
        "a.b.example.co.uk": "example.co.uk",
        "user.github.io": "user.github.io",      # private registry: one more label
        "x.blog.blogspot.com": "blog.blogspot.com",
        "UPPER.Example.COM": "example.com",      # case folded
        "node.weirdtld": "node.weirdtld",        # unknown TLD fallback
        "deep.a.b.weirdtld": "b.weirdtld",
        "localhost": "localhost",                # single label pass-through
        "example.com": "example.com",            # exactly suffix+1
    }
    df = spark.createDataFrame([(k,) for k in cases], ["host"])
    got = {
        r["host"]: r["d"]
        for r in df.select("host", registrable_domain(F.col("host")).alias("d")).collect()
    }
    assert got == cases


def test_anchor_context_fold_semantics(spark):
    """Anchor context = nearest PRECEDING text span; '' before any text;
    carries across consecutive links; media spans never update it; docs
    without links emit nothing. Aggregation is per-target with a
    deterministic lexicographic-min sample context."""
    from delphi_crawler_spark.operators.links import anchor_context, anchor_context_agg

    schema = (
        "doc_id bigint, spans array<struct<"
        "kind:string,text:string,media_ref:string,offset:int>>"
    )
    rows = [
        (1, [("link", "u1", None, 0), ("text", "hello", None, 1),
             ("link", "u2", None, 2), ("link", "u3", None, 3),
             ("text", "world", None, 4), ("media", None, "m://1", 5),
             ("link", "u2", None, 6)]),
        (2, [("text", "alpha", None, 0), ("link", "u2", None, 1)]),
        (3, [("media", None, "m://2", 0)]),
    ]
    df = spark.createDataFrame(rows, schema)
    got = {
        (r["doc_id"], r["target"], r["ctx"])
        for r in anchor_context(df).collect()
    }
    assert got == {
        (1, "u1", ""), (1, "u2", "hello"), (1, "u3", "hello"),
        (1, "u2", "world"), (2, "u2", "alpha"),
    }
    agg = {r["target"]: r for r in anchor_context_agg(df).collect()}
    assert agg["u2"]["n_inlinks"] == 3 and agg["u2"]["n_src_docs"] == 2
    assert agg["u2"]["ctx_total_len"] == 15 and agg["u2"]["sample_ctx"] == "alpha"
    assert agg["u1"]["ctx_total_len"] == 0 and agg["u1"]["sample_ctx"] == ""


def test_term_drift_identical_corpora_is_zero(spark):
    from delphi_crawler_spark.operators.snapshot import term_distribution_drift

    d = spark.createDataFrame(
        [(0, "a b c"), (1, "a b")], "doc_id long, text string"
    )
    out = term_distribution_drift(d, d).collect()
    assert all(r["jsd_term"] == 0.0 for r in out)
    assert {r["term"] for r in out} == {"a", "b", "c"}


def test_term_drift_hand_values(spark):
    import math

    from delphi_crawler_spark.operators.snapshot import term_distribution_drift

    # A: {a:2, b:2} tot 4; B: {a:1, c:3} tot 4
    da = spark.createDataFrame([(0, "a a b b")], "doc_id long, text string")
    db = spark.createDataFrame([(1, "a c c c")], "doc_id long, text string")
    got = {r["term"]: r for r in term_distribution_drift(da, db).collect()}

    def jsd(p, q):
        m = (p + q) / 2
        s = 0.0
        if p > 0:
            s += 0.5 * p * math.log(p / m)
        if q > 0:
            s += 0.5 * q * math.log(q / m)
        return round(s, 9)

    assert got["a"]["jsd_term"] == jsd(0.5, 0.25)
    assert got["b"]["jsd_term"] == jsd(0.5, 0.0)   # disappeared term
    assert got["c"]["jsd_term"] == jsd(0.0, 0.75)  # new term
    assert got["b"]["cnt_b"] == 0 and got["c"]["cnt_a"] == 0
    # corpus JSD bounded by ln 2
    total = sum(r["jsd_term"] for r in got.values())
    assert 0.0 < total <= math.log(2)


def test_focused_priority_hand_values(spark):
    from delphi_crawler_spark.operators.focused import (
        focused_priority,
        topic_relevance,
    )

    docs = spark.createDataFrame(
        [
            (0, "join stream query other"),   # rel = 3+2+1 = 6, 4 toks
            (1, "join join plain"),           # rel = 6, 3 toks
            (2, "nothing topical here four"), # rel = 0, 4 toks
        ],
        "doc_id long, text string",
    )
    rel = topic_relevance(docs, {"join": 3, "stream": 2, "query": 1})
    got = {r["doc_id"]: r for r in rel.collect()}
    assert (got[0]["rel_num"], got[0]["n_tokens"]) == (6, 4)
    assert (got[1]["rel_num"], got[1]["n_tokens"]) == (6, 3)
    assert (got[2]["rel_num"], got[2]["n_tokens"]) == (0, 4)

    links = spark.createDataFrame(
        [(0, "a"), (1, "a"), (2, "a"), (0, "b")], "src long, dst string"
    )
    out = {r["dst"]: r for r in focused_priority(rel, links, src_col="src").collect()}
    # target a: num 12, toks 11 -> boost min(9, 240 div 11 = 21) = 9
    assert out["a"]["n_inlinks"] == 3
    assert out["a"]["sum_rel_num"] == 12 and out["a"]["sum_tokens"] == 11
    assert out["a"]["priority_boost"] == 9
    assert out["a"]["relevance"] == round(12 / 11, 9)
    # target b: num 6, toks 4 -> 120 div 4 = 30 -> capped 9
    assert out["b"]["priority_boost"] == 9

    # a low-relevance-only target stays un-boosted
    links2 = spark.createDataFrame([(2, "c")], "src long, dst string")
    out2 = focused_priority(rel, links2).collect()[0]
    assert out2["priority_boost"] == 0 and out2["relevance"] == 0.0


def test_term_drift_one_empty_round_is_nan_free(spark):
    from delphi_crawler_spark.operators.snapshot import term_distribution_drift

    d = spark.createDataFrame([(0, "a a b")], "doc_id long, text string")
    empty = d.where("doc_id < 0")
    out = term_distribution_drift(d, empty).collect()
    assert {r["term"] for r in out} == {"a", "b"}
    for r in out:
        # the empty round contributes nothing; no NaN anywhere
        assert r["p_b"] == 0.0 and r["cnt_b"] == 0
        assert r["jsd_term"] is not None and r["jsd_term"] == r["jsd_term"]
        # one-sided term at p, q=0: contribution is 0.5*p*ln(2)
        import math
        assert r["jsd_term"] == round(0.5 * r["p_a"] * math.log(2), 9)


def test_bm25_hand_values(spark):
    import math

    from delphi_crawler_spark.operators.invindex import bm25_topk

    docs = spark.createDataFrame(
        [
            (0, "join join stream x"),  # tf(join)=2, tf(stream)=1, dl=4
            (1, "join y z"),            # tf(join)=1, dl=3
            (2, "plain text only"),     # no hits, dl=3
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bm25_topk(docs, ["join", "stream"]).collect()}
    assert set(out) == {0, 1}  # doc 2 never scores

    n, avgdl = 3, 10 / 3
    k1, b = 1.2, 0.75

    def bm25(tf, df, dl):
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    exp0 = round(bm25(2, 2, 4) + bm25(1, 1, 4), 6)
    exp1 = round(bm25(1, 2, 3), 6)
    assert abs(out[0]["score"] - exp0) < 1e-9
    assert abs(out[1]["score"] - exp1) < 1e-9
    assert out[0]["n_terms"] == 2 and out[1]["n_terms"] == 1


def test_bm25_requires_terms(spark):
    import pytest as _pytest

    from delphi_crawler_spark.operators.invindex import bm25_topk

    docs = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        bm25_topk(docs, [])


def test_caption_pairs_nearest_tie_and_null_semantics(spark):
    """Caption pairing: nearest text span wins, preceding preferred on
    exact distance ties, docs without text spans keep null captions, and
    array order does not matter (offset order is re-established)."""
    from delphi_crawler_spark.operators.links import caption_pairs

    def sp(kind, text, ref, off):
        return {"kind": kind, "text": text, "media_ref": ref, "offset": off}

    spans1 = [  # media at 2: text at 0 (d=2) vs text at 4 (d=2) -> tie -> prev
        sp("media", "", "m://2", 2),
        sp("text", "left", None, 0),
        sp("text", "right", None, 4),
        # media at 5: nearest is right (d=1)
        sp("media", "", "m://5", 5),
        # media at 1: nearest is left (d=1)
        sp("media", "", "m://1", 1),
    ]
    spans2 = [sp("media", "", "m://0", 0), sp("link", "http://x", None, 1)]
    df = spark.createDataFrame(
        [(1, spans1), (2, spans2)],
        "doc_id long, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    rows = {
        (r["doc_id"], r["media_ref"]): (r["caption"], r["caption_off"], r["dist"])
        for r in caption_pairs(df).collect()
    }
    assert rows[(1, "m://2")] == ("left", 0, 2)  # tie -> preceding
    assert rows[(1, "m://5")] == ("right", 4, 1)
    assert rows[(1, "m://1")] == ("left", 0, 1)
    assert rows[(2, "m://0")] == (None, None, None)  # no text spans
    assert len(rows) == 4
