"""Collocation extraction: adjacent-bigram PMI over the corpus (Church &
Hanks 1990, public literature) — the "which token pairs belong together"
signal a tokenizer-vocab or quality pipeline reads (multi-word expressions,
boilerplate phrases, template detection).

``PMI(x, y) = ln( p(x,y) / (p(x)·p(y)) )`` with ``p(x,y) = c_xy / M``
(bigram count over total bigrams) and ``p(x) = c_x / N`` (unigram count
over total tokens).

Scale shape at corpus volume:

- bigrams come from ONE in-row JVM transform over the token array (no
  self-join of token positions, no Python): ``transform(sequence(...))``
  pairs each token with its successor inside whole-stage codegen;
- unigram and bigram counts are partial-aggregating hash-aggs keyed by
  term — vocabulary-sized results, corpus-sized input;
- the PMI join attaches the two unigram counts to each surviving bigram:
  two vocabulary-sized equi-joins AFTER the ``min_count`` filter has cut
  the bigram table to its frequent tail (the filter is pushed below the
  joins, so the join input is small even when the corpus is not);
- scalar totals (N, M) ride a broadcast 1-row cross join.

All counts are exact integers; the single ``ln`` of their ratio is rounded
to 6 dp so the table is engine-portable.

Reference parity: the reference has no corpus-text pass; this extends the
§2.10 training-data tier (SURVEY.md) alongside ``corpus.tfidf_topk``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def collocation_pmi(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    decimals: int = 6,
) -> DataFrame:
    """All adjacent bigrams with corpus frequency >= ``min_count``, with
    exact counts and PMI: ``(x, y, c_xy, c_x, c_y, pmi)``."""
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    base = docs.select(toks.alias("t")).filter(F.size("t") > 0).persist()

    uni = (
        base.select(F.explode("t").alias("x"))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # size >= 2 guard: Spark's sequence(1, 0) yields a DESCENDING [1, 0]
    # (not an empty list), so an unguarded single-token doc would emit
    # bogus null-member bigrams.
    bi = (
        base.filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1),"
                    " i -> struct(t[i - 1] AS x, t[i] AS y))"
                )
            ).alias("b")
        )
        .select("b.x", "b.y")
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .filter(F.col("c_xy") >= F.lit(int(min_count)))
    )
    totals = base.agg(
        F.sum(F.size("t")).alias("N"),
        F.sum(F.size("t") - 1).alias("M"),
    )
    cx = uni.select(F.col("x"), F.col("c").alias("c_x"))
    cy = uni.select(F.col("x").alias("y"), F.col("c").alias("c_y"))
    out = (
        bi.join(cx, "x")
        .join(cy, "y")
        .crossJoin(F.broadcast(totals))
        .select(
            "x",
            "y",
            F.col("c_xy").cast("bigint").alias("c_xy"),
            F.col("c_x").cast("bigint").alias("c_x"),
            F.col("c_y").cast("bigint").alias("c_y"),
            F.round(
                F.log(
                    (F.col("c_xy") / F.col("M"))
                    / ((F.col("c_x") / F.col("N")) * (F.col("c_y") / F.col("N")))
                ),
                decimals,
            ).alias("pmi"),
        )
    )
    # the tokenized base feeds three passes (uni, bi, totals) — persisted so
    # the corpus is scanned/tokenized once; callers release after the result
    # is materialized (entry query does via _materialize_release)
    out._release_pmi = lambda: base.unpersist()  # type: ignore[attr-defined]
    return out
