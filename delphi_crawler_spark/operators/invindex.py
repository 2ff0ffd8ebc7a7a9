"""Inverted-index construction: term -> posting list over the corpus.

The classic batch-indexing job (the original MapReduce paper's motivating
example): tokenize every document, and for each term produce its document
frequency, total term frequency, and the sorted list of documents that
contain it. Downstream consumers: BM25/TF-IDF retrieval, decontamination
lookup tables, and the corpus-level vocabulary statistics the importance
weighting (``corpus.py:importance_weights``) starts from.

Scale shape: one explode feeds a (term, doc) partial-aggregating hash-agg
(within-doc repeats collapse map-side, so the shuffle carries distinct
(term, doc) pairs with their counts), then a term-grained agg computes df
(plain count over the already-distinct grain — never a count-distinct
shuffle), tf, and the posting list via ``sort_array(collect_list(...))``.
Posting lists for web-scale stopword terms would be bounded in practice
(an ``is_stopword``-style df cutoff, or postings sharded by doc-id range);
the ``min_df``/``max_postings`` knobs expose both bounds. Postings are
emitted as a CSV string (deterministic ordering, engine-portable hashing)
exactly as ``aggs.py:group_edges`` does for the A1 operator.

Reference parity: the reference builds its retrieval index by delegating
to ElasticSearch (ElasticActor.scala / ElasticFeatureListMapping.scala —
the engine *ships* documents, ES inverts them); building the inversion
inside the engine is the self-contained equivalent for the training-data
tier (SURVEY §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def inverted_index(
    docs: DataFrame,
    doc_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    max_postings: int | None = None,
) -> DataFrame:
    """Build ``(term, df, tf, postings_csv)``.

    - ``df`` — number of distinct documents containing the term;
    - ``tf`` — total occurrences across the corpus;
    - ``postings_csv`` — comma-joined doc ids sorted ascending as strings
      (string order is the deterministic cross-engine order); when
      ``max_postings`` is set, only the first that many ids are kept
      (df/tf still count the full corpus).

    Terms with ``df < min_df`` are dropped after the term-grain agg — the
    filter cannot push below the agg (df is its output), but the agg
    itself is the reducer, so nothing upstream widens.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    term_doc = (
        docs.select(F.col(doc_col).alias("doc_id"), F.explode(toks).alias("term"))
        .where(F.col("term") != "")
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    postings = F.sort_array(F.collect_list(F.col("doc_id").cast("string")))
    if max_postings is not None:
        postings = F.slice(postings, 1, max_postings)
    out = term_doc.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("tf"),
        F.concat_ws(",", postings).alias("postings_csv"),
    )
    if min_df > 1:
        out = out.where(F.col("df") >= min_df)
    return out


def inverted_index_delta(
    docs: DataFrame,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Index one round's NEW documents as a mergeable delta:
    ``(term, df, tf, postings)`` with postings as a sorted string array
    (array form so merging never re-parses CSV). No min_df/caps here —
    bounds apply to the merged view, not the increments."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    term_doc = (
        docs.select(F.col(doc_col).alias("doc_id"), F.explode(toks).alias("term"))
        .where(F.col("term") != "")
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return term_doc.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("tf"),
        F.sort_array(F.collect_list(F.col("doc_id").cast("string"))).alias(
            "postings"
        ),
    )


def merge_index_deltas(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two index deltas whose DOCUMENT SETS ARE DISJOINT (true by
    construction for per-round deltas: a document is indexed in exactly
    the round that fetched it — the same disjointness the bloom segments
    rely on). Under disjointness the merge is a plain mergeable-summary
    fold: df/tf add, postings concatenate-and-sort. One term-keyed
    hash-agg; associative and commutative, so rounds can fold in any
    order and a store can binpack-compact delta segments exactly like
    parts (storage/tablestore.py compaction).

    The crucial scale property: merging NEVER touches document text —
    cost is proportional to the vocabularies involved, not the corpus.
    """
    u = a.select("term", "df", "tf", "postings").unionByName(
        b.select("term", "df", "tf", "postings")
    )
    return u.groupBy("term").agg(
        F.sum("df").alias("df"),
        F.sum("tf").alias("tf"),
        F.sort_array(F.flatten(F.collect_list("postings"))).alias("postings"),
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    doc_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
) -> DataFrame:
    """BM25 ranked retrieval (Robertson & Zaragoza 2009; Lucene's
    non-negative idf variant) for a literal query-term set — the
    retrieval half the inverted index exists for.

    Per doc d and query term t:
    ``idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))``,
    ``score += idf · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))``;
    top-k docs by (score desc, doc asc).

    Scale shape: tokens are FILTERED to the query terms before the first
    shuffle (the scan-side isin prune — the posting-list read of a real
    index), so the (doc, term) agg carries only matching rows; df comes
    from the same grain with a plain count; N and avgdl are one broadcast
    scalar row computed from integer masses (exact at any parallelism);
    the final top-k is a TakeOrdered, never a global sort. Every
    expression is JVM; the per-doc term-sum is ≤|query| doubles, rounded
    to 6 to absorb summation-order ulps across engines.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted(set(query_terms))
    # null text would make size(ws) = -1 and silently corrupt avgdl for
    # the whole corpus — a null document simply isn't in the collection
    base = docs.where(F.col(text_col).isNotNull()).select(
        F.col(doc_col),
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("ws"),
    )
    # integer masses: exact N and total doc length at any summation order
    # (one agg-only tokenization pass over the corpus)
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("ws")).alias("total_len"),
    )
    # the second and last tokenization pass: dl rides the explode so only
    # query-matching docs ever need their length — no third corpus scan,
    # no per-doc lens join
    tf = (
        base.select(doc_col, F.size("ws").cast("long").alias("dl"),
                    F.explode("ws").alias("term"))
        .where(F.col("term").isin(terms))
        .groupBy(doc_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(df_, "term").crossJoin(F.broadcast(stats))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    avgdl = F.col("total_len") / F.col("n_docs")
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / avgdl
    )
    contrib = idf * F.col("tf") * F.lit(k1 + 1.0) / denom
    out = (
        scored.select(F.col(doc_col), contrib.alias("c"))
        .groupBy(doc_col)
        .agg(F.round(F.sum("c"), 6).alias("score"), F.count(F.lit(1)).alias("n_terms"))
        .orderBy(F.col("score").desc(), F.col(doc_col).asc())
        .limit(k)
    )
    return out
