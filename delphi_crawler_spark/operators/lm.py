"""CCNet-style n-gram language-model quality scoring.

CCNet (Wenzek et al., 2020) ranks crawled documents by the perplexity of a
small LM trained on a trusted slice; Gopher / RefinedWeb keep the idea as a
core quality gate. The reference engine has no text-quality stage (its
analyzer is bytecode feature extraction, HermesAnalyzer.scala:30-40), but a
training-data pipeline over the same crawl frontier needs one, so this is
part of the §2.10 superset.

Operator: train an add-one-smoothed **bigram LM** on a deterministic
reference slice of the corpus, then score EVERY document by the average
negative log-likelihood of its bigrams (and the derived perplexity).

Spark shape, sized for 100 TB:

- tokenization + bigram emission are one narrow pass — ``split`` then a
  ``zip_with`` of the array against its own tail, exploded; no shuffle and
  no Python until the count aggregations;
- the LM itself is two hash-aggregations (bigram counts, context counts)
  over the reference slice only — vocabulary-bounded outputs (≪ corpus
  size), so the score-side equi-joins are AQE-broadcastable for any
  realistic vocabulary, and plain shuffled hash joins beyond that;
- the vocabulary size ``V`` (add-one denominator) is the only driver
  scalar — one ``countDistinct`` over the reference tokens;
- per-document scoring is one keyed avg; every expression is JVM
  (``ln`` / arithmetic inside whole-stage codegen), zero per-row Python.

Determinism: the per-bigram NLL is computed with a fixed IEEE op order
(``-ln((c2+1)/(c1+V))``) so Spark and the DuckDB oracle agree bit-for-bit
per bigram; the per-document mean is rounded to 6 decimals, absorbing the
summation-order difference (~1e-13 relative) between engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _token_arrays(docs: DataFrame, doc_col: str, text_col: str) -> DataFrame:
    """(doc, ws): whitespace tokens of lower(trim(text)) — the same
    tokenization contract the decontamination and TF-IDF operators use."""
    return docs.select(
        F.col(doc_col),
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("ws"),
    )


def _bigrams(toks: DataFrame, doc_col: str) -> DataFrame:
    """Explode (w1, w2) adjacent pairs from the token arrays — pure JVM,
    no shuffle: the array is zipped against its own tail."""
    n = F.size("ws")
    pairs = F.zip_with(
        F.slice("ws", 1, F.greatest(n - 1, F.lit(0))),
        F.slice("ws", 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return toks.select(F.col(doc_col), F.explode(pairs).alias("bg")).select(
        doc_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )


def bigram_perplexity(
    docs: DataFrame,
    train_pred: Column,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document by an add-one-smoothed bigram LM trained on the
    ``train_pred`` slice (a deterministic Column predicate over ``docs``).

    Returns one row per document that has at least one bigram (≥2 tokens):
    ``(doc, n_bigrams, avg_nll, ppl)`` with ``avg_nll`` the mean of
    ``-ln((c2+1)/(c1+V))`` over its bigrams (c2 = train bigram count,
    c1 = train context count, V = train vocabulary size) and
    ``ppl = exp(avg_nll)``; both rounded (6 / 3 decimals).
    """
    toks = _token_arrays(docs, doc_col, text_col)
    big = _bigrams(toks, doc_col)
    train_toks = _token_arrays(docs.where(train_pred), doc_col, text_col)
    train_big = _bigrams(train_toks, doc_col)

    # the LM: vocabulary-bounded count tables + one driver scalar (V)
    c2 = train_big.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = train_big.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab_size = (
        train_toks.select(F.explode("ws").alias("w")).agg(
            F.countDistinct("w").alias("v")
        ).collect()[0][0]
    )
    v = int(vocab_size or 0)
    if v == 0:
        # empty reference slice: no LM — return an empty, correctly-typed frame
        return (
            big.groupBy(doc_col)
            .agg(F.count("*").alias("n_bigrams"))
            .withColumn("avg_nll", F.lit(None).cast("double"))
            .withColumn("ppl", F.lit(None).cast("double"))
            .where(F.lit(False))
        )

    # fixed IEEE op order: (c2+1) / (c1+V) as a single double division
    nll = -F.log(
        (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1))
        / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(v))
    )
    scored = (
        big.join(c2, ["w1", "w2"], "left")
        .join(c1, ["w1"], "left")
        .select(F.col(doc_col), nll.alias("nll"))
    )
    avg = F.avg("nll")
    return (
        scored.groupBy(doc_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(avg, 6).alias("avg_nll"),
            F.round(F.exp(avg), 3).alias("ppl"),
        )
    )


def kneser_ney_perplexity(
    docs: DataFrame,
    train_pred: Column,
    doc_col: str = "doc_id",
    text_col: str = "text",
    discount: float | None = None,
) -> DataFrame:
    """Interpolated Kneser–Ney bigram scoring (Kneser & Ney 1995; Chen &
    Goodman 1998) — the LM the add-one baseline (``bigram_perplexity``)
    graduates to: probability mass moves to CONTINUATION counts (how many
    distinct contexts a word follows) instead of raw frequency, which is
    what actually separates fluent text from keyword-stuffed spam whose
    unigrams are common but whose continuations are novel.

    Per scored bigram, with train-side stats c2=c(w1,w2), c1=c(w1),
    t1=N1+(w1,·), tc=N1+(·,w2), T=N1+(·,·), V=|vocab|:

        p_cont = (tc + 1) / (T + V + 1)            # +1: OOV-safe, exact
        p      = (max(c2-D,0))/c1 + D*t1/c1*p_cont   if c1 > 0
                 p_cont                              otherwise (OOV context)

    D defaults to the Ries/Chen–Goodman estimate n1/(n1 + 2·n2) from the
    bigram count-of-counts (n_k = #bigram types seen k times); pass
    ``discount`` to pin it. The add-one floor on the continuation
    distribution keeps every probability > 0 with NO reserved-mass
    hyperparameter — deterministic and exactly replicable in SQL.

    Shape: identical to the add-one path — two vocabulary-bounded
    hash-aggs (bigram counts fold into context/continuation tables on
    their own grains), three AQE-broadcastable equi-joins onto the
    scored bigrams, one keyed avg; T/V/n1/n2 are the only driver
    scalars. Zero Python on the hot path; per-bigram double math in a
    fixed IEEE order, per-doc mean rounded to 6 (house convention).
    Returns (doc, n_bigrams, avg_nll, ppl) over docs with ≥1 bigram.
    """
    toks = _token_arrays(docs, doc_col, text_col)
    big = _bigrams(toks, doc_col)
    train_toks = _token_arrays(docs.where(train_pred), doc_col, text_col)
    train_big = _bigrams(train_toks, doc_col)

    c2 = train_big.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    ctx = c2.groupBy("w1").agg(
        F.sum("c2").alias("c1"), F.count("*").alias("t1")
    )
    cont = c2.groupBy("w2").agg(F.count("*").alias("tc"))
    scal = c2.agg(
        F.count("*").alias("T"),
        F.sum((F.col("c2") == 1).cast("int")).alias("n1"),
        F.sum((F.col("c2") == 2).cast("int")).alias("n2"),
    ).collect()[0]
    t_types = int(scal["T"] or 0)
    vocab_size = (
        train_toks.select(F.explode("ws").alias("w"))
        .agg(F.countDistinct("w").alias("v"))
        .collect()[0][0]
    )
    v = int(vocab_size or 0)
    if t_types == 0 or v == 0:
        return (
            big.groupBy(doc_col)
            .agg(F.count("*").alias("n_bigrams"))
            .withColumn("avg_nll", F.lit(None).cast("double"))
            .withColumn("ppl", F.lit(None).cast("double"))
            .where(F.lit(False))
        )
    if discount is None:
        n1, n2 = int(scal["n1"] or 0), int(scal["n2"] or 0)
        d = n1 / (n1 + 2 * n2) if (n1 + 2 * n2) > 0 else 0.75
    else:
        d = float(discount)

    tc0 = F.coalesce(F.col("tc"), F.lit(0)).cast("double")
    c2_ = F.coalesce(F.col("c2"), F.lit(0)).cast("double")
    c1_ = F.coalesce(F.col("c1"), F.lit(0)).cast("double")
    t1_ = F.coalesce(F.col("t1"), F.lit(0)).cast("double")
    pcont = (tc0 + F.lit(1.0)) / F.lit(float(t_types + v + 1))
    p = F.when(
        c1_ > 0,
        F.greatest(c2_ - F.lit(d), F.lit(0.0)) / c1_
        + F.lit(d) * t1_ / c1_ * pcont,
    ).otherwise(pcont)
    scored = (
        big.join(c2, ["w1", "w2"], "left")
        .join(ctx, ["w1"], "left")
        .join(cont, ["w2"], "left")
        .select(F.col(doc_col), (-F.log(p)).alias("nll"))
    )
    avg = F.avg("nll")
    return scored.groupBy(doc_col).agg(
        F.count("*").alias("n_bigrams"),
        F.round(avg, 6).alias("avg_nll"),
        F.round(F.exp(avg), 3).alias("ppl"),
    )
