"""Focused-crawl priority: topic relevance propagated to outlink targets.

Focused crawling (Chakrabarti, van den Berg & Dom, 1999) steers the
frontier toward a topic: pages relevant to a keyword profile lend priority
to the URLs they link to. The reference's scheduler has a static priority
queue (MavenDiscoveryProcess throttle + ordering); this adds the
relevance-driven boost a topical web crawl runs on top of the same
P6 window-rank emission (SURVEY §2.10 family).

Two stages, both shuffle-minimal:

- ``topic_relevance``: per-document weighted topic-term mass. One token
  explode, an equi-join against the (tiny, broadcast) topic table, one
  per-doc hash-agg. Weights are INTEGERS by contract — the relevance
  numerator stays exact under any summation order, so downstream
  thresholds can't flip on float noise.
- ``focused_priority``: join doc relevance onto the outlink edge list and
  aggregate per target: in-link count, pooled relevance
  (Σ numerators / Σ token counts — the token-weighted mean of the linking
  docs), and an integer priority boost computed with integer division
  (``min(cap, (scale·Σnum) div Σtok)``) — bit-exact in any engine.

At 100 TB: the topic table is broadcast; the edge join shuffles on doc id
(or is bucket-local under the host-bucketed layout); the target agg is one
keyed hash-agg. Nothing is corpus-quadratic and no Python runs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def topic_relevance(
    docs: DataFrame,
    topic_weights: dict[str, int],
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document topic mass: ``(doc, n_tokens, rel_num)`` where
    ``rel_num = Σ weight(term) · occurrences(term)`` (exact integer) and
    ``n_tokens`` is the document token count. Docs with no topic hits get
    ``rel_num = 0`` (kept — the zero matters to the pooled mean)."""
    spark = docs.sparkSession
    topics = spark.createDataFrame(
        [(t, int(w)) for t, w in sorted(topic_weights.items())],
        "term string, weight long",
    )
    base = docs.select(
        F.col(doc_col),
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("ws"),
    )
    # single-pass shape: n_tokens rides the explode and the topic join is
    # LEFT against the broadcast table, so zero-hit docs survive without a
    # corpus-sized join-back — the explode is narrow and the per-doc agg
    # partial-aggregates map-side to ONE exchange on the doc key (the
    # two-join alternative plans a SortMergeJoin of two corpus-sized
    # frames; this is strictly cheaper at any scale).
    toks = base.select(
        doc_col, F.size("ws").alias("n_tokens"), F.explode("ws").alias("term")
    )
    return (
        toks.join(F.broadcast(topics), "term", "left")
        .groupBy(doc_col)
        .agg(
            F.max("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce(F.sum("weight"), F.lit(0)).cast("long").alias("rel_num"),
        )
    )


def focused_priority(
    relevance: DataFrame,
    links: DataFrame,
    doc_col: str = "doc_id",
    src_col: str = "src",
    dst_col: str = "dst",
    scale: int = 20,
    cap: int = 9,
) -> DataFrame:
    """Per-target frontier boost from the relevance of its linking docs.

    Returns ``(dst, n_inlinks, sum_rel_num, sum_tokens, relevance,
    priority_boost)`` where ``relevance`` is the token-pooled mean
    (Σ rel_num / Σ n_tokens, rounded to 9) and ``priority_boost =
    min(cap, (scale · Σ rel_num) div Σ n_tokens)`` — integer division,
    bit-exact across engines and summation orders."""
    edges = links.join(
        relevance, links[src_col] == relevance[doc_col], "inner"
    ).select(F.col(dst_col).alias("dst"), "rel_num", "n_tokens")
    agg = edges.groupBy("dst").agg(
        F.count("*").alias("n_inlinks"),
        F.sum("rel_num").alias("sum_rel_num"),
        F.sum("n_tokens").alias("sum_tokens"),
    )
    boost = F.least(
        F.lit(cap),
        F.expr(f"({scale} * sum_rel_num) div sum_tokens"),
    )
    return agg.select(
        "dst",
        F.col("n_inlinks").cast("long").alias("n_inlinks"),
        F.col("sum_rel_num").cast("long").alias("sum_rel_num"),
        F.col("sum_tokens").cast("long").alias("sum_tokens"),
        F.round(F.col("sum_rel_num") / F.col("sum_tokens"), 9).alias("relevance"),
        boost.cast("long").alias("priority_boost"),
    )
