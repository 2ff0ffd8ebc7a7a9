"""Expected-parquet oracle gates: the queries whose values DuckDB cannot
express (Spark murmur3/xxhash64, seeded sketches, k-means state) are pinned
against tools/gen_expected.py's INDEPENDENT plain-Python implementation.

Two layers:
- regenerate at sf0.001 in-process and compare the live Spark output —
  catches algorithm drift that would silently stale the committed files;
- verify the committed sf0.01 parquet (what the driver's oracle reads) is
  in sync with the generator.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

import __spark_entry__ as E
from tools import gen_expected as G

SF_SMALL = "/root/testdata/sf0.001"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CASES = {
    "c3_hash_keys": (E.q_c3_hash_keys, "documents", G.gen_c3_hash_keys),
    "text_fingerprint_rolling": (
        E.q_text_fingerprint_rolling, "documents", G.gen_fingerprint_rolling,
    ),
    "dedup_simhash": (E.q_dedup_simhash, "documents", G.gen_dedup_simhash),
    "dedup_minhash_lsh": (E.q_dedup_minhash_lsh, "documents", G.gen_dedup_minhash_lsh),
    "dedup_embedding_lsh": (
        E.q_dedup_embedding_lsh, "embeddings", G.gen_dedup_embedding_lsh,
    ),
    "sim_ivf_topk": (E.q_sim_ivf_topk, "embeddings", G.gen_sim_ivf_topk),
    "dedup_semantic": (E.q_dedup_semantic, "embeddings", G.gen_dedup_semantic),
    "corpus_bpe_merges": (E.q_corpus_bpe_merges, "documents", G.gen_corpus_bpe_merges),
    "corpus_bpe_encode": (E.q_corpus_bpe_encode, "documents", G.gen_corpus_bpe_encode),
    "sim_random_projection": (
        E.q_sim_random_projection, "embeddings", G.gen_sim_random_projection,
    ),
    "agg_cms_freq": (E.q_agg_cms_freq, "events", G.gen_agg_cms_freq),
    "agg_kmv_overlap": (E.q_agg_kmv_overlap, "documents", G.gen_agg_kmv_overlap),
    "dedup_minhash_incr": (E.q_dedup_minhash_incr, "documents", G.gen_dedup_minhash_incr),
    "mm_phash_neardup": (E.q_mm_phash_neardup, "documents", G.gen_mm_phash_neardup),
    "graph_hyperanf": (E.q_graph_hyperanf, "lineitem", G.gen_graph_hyperanf),
}


def _rows(pdf: pd.DataFrame) -> list[tuple]:
    def cell(v):
        # NULL-safe: Spark nulls arrive as NaN; NaN != NaN would fail the
        # equality assert even when both sides are null
        if isinstance(v, float) and pd.isna(v):
            return None
        return v

    rows = [
        tuple(cell(v) for v in t)
        for t in pdf[sorted(pdf.columns)].itertuples(index=False)
    ]
    return sorted(rows, key=lambda t: tuple((x is None, str(x)) for x in t))


@pytest.mark.parametrize("name", sorted(CASES))
def test_spark_matches_independent_impl(spark, name):
    qfn, table, gfn = CASES[name]
    got = qfn(spark, SF_SMALL).toPandas()
    exp = gfn(pd.read_parquet(f"{SF_SMALL}/{table}.parquet"))
    assert list(sorted(got.columns)) == list(sorted(exp.columns))
    assert _rows(got) == _rows(exp), f"{name}: values diverge from independent impl"


@pytest.mark.parametrize("name", sorted(CASES))
def test_committed_expected_parquet_in_sync(name):
    _, table, gfn = CASES[name]
    committed = pd.read_parquet(os.path.join(REPO, "expected", "sf0.01", f"{name}.parquet"))
    regen = gfn(pd.read_parquet(f"/root/testdata/sf0.01/{table}.parquet"))
    assert _rows(committed) == _rows(regen), (
        f"{name}: committed expected parquet is stale — rerun tools/gen_expected.py"
    )


def test_hash_primitives_match_spark(spark):
    """Spec-level Murmur3/XXH64 reimplementations == Spark's builtins."""
    from pyspark.sql import functions as F

    vals = ["", "a", "abc", "abcd", "hello world", "é漢字", "x" * 37]
    df = spark.createDataFrame(
        pd.DataFrame({"s": vals, "l": list(range(-3, 4))})
    )
    rows = df.select(
        "s", "l",
        F.hash("s").alias("m"), F.xxhash64("s").alias("xs"), F.xxhash64("l").alias("xl"),
    ).collect()
    for r in rows:
        assert G.murmur3_32_spark(r.s.encode()) == r.m
        assert G.xxh64_str(r.s) == r.xs
        assert G.xxh64_long(r.l) == r.xl
