"""Cross-corpus duplicated-substring statistics (ExactSubstr shape).

Lee et al., "Deduplicating Training Data Makes Language Models Better"
(ACL 2022) showed that training corpora carry long *verbatim* substrings
repeated across documents that pairwise near-dup methods (MinHash over
whole docs) miss, and removed any 50-token span occurring more than once
in the corpus. The suffix-array construction in that paper is a
single-machine algorithm; the distributable equivalent implemented here is
the k-token *rolling window* formulation: every document emits all of its
k-token windows, a window is "duplicated" if its total occurrence count
across the corpus (including repeats inside one document) is >= 2, and
each document is scored by how much of it is covered by duplicated
windows.

Scale shape: the window table is built per-row with JVM higher-order
functions (``transform`` over a ``sequence`` of start offsets + ``slice``
— zero Python); the (doc, window) occurrence counts and the corpus-wide
window totals are two partial-aggregating hash-aggs that share one
shuffle grain (the window string), and the totals table — already
window-grained, far smaller than the exploded stream — joins back with a
plain hash equi-join on that same key, so one exchange serves all three
steps. Nothing is quadratic in documents and no window ever meets another
window except by exact key equality. At 100 TB the window string would be
xxhash64-compressed before the shuffle (same plan, 8-byte keys); the
string key is kept here so the DuckDB oracle can replicate values exactly.

Reference parity: the reference dedups documents whole-identifier-wise
(ElasticActor upserts, SURVEY §2.2); substring-grain dedup is part of the
training-data extension family (SURVEY §2.10) alongside
``dedup_fuzzy.py`` (whole-doc near-dup) and ``corpus.py``
(within-doc repetition): this operator is the *cross-doc, sub-doc* cell
of that matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def duplicate_window_stats(
    docs: DataFrame,
    doc_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    hash_keys: bool = False,
) -> DataFrame:
    """Per-document duplicated-window report.

    Returns one row per input document:

    - ``n_windows`` — number of k-token windows the document emits
      (``max(0, n_tokens - k + 1)``; short docs emit none and score 0);
    - ``n_dup_windows`` — how many of those occurrences belong to a window
      whose corpus-wide occurrence total is >= 2 (counting repeats within
      the same document, per the ExactSubstr definition);
    - ``dup_frac`` — ``n_dup_windows / n_windows`` (0.0 for short docs),
      rounded to 6 decimals.

    Tokenization is lowercase whitespace splitting, matching the rest of
    the corpus operators so thresholds compose across them.

    ``hash_keys=True`` is the 100 TB shuffle path: each window string is
    collapsed to its ``xxhash64`` before the exchange, so the shuffle
    carries 8-byte keys instead of k-token strings (~10x less shuffle
    volume at k=8). Counts are then exact up to 64-bit hash collisions
    (~n²/2⁶⁵ expected extra dup-pairs — negligible below ~10¹² distinct
    windows); the default keeps string keys so external oracles can
    replicate values bit-for-bit.
    """
    # Split once into a column, then build windows over it — referencing a
    # materialized column inside the lambda keeps the split from being
    # re-evaluated per window.
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    windows = F.when(
        F.size("toks") >= k,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - F.lit(k - 1)),
            lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))

    # Single pass: explode_outer keeps zero-window (short) docs as a null
    # window row, and n_windows rides along as a grouping column, so no
    # second scan / distinct / left-join-back is ever needed.
    exploded = (
        docs.select(F.col(doc_col).alias("doc_id"), toks.alias("toks"))
        .select("doc_id", windows.alias("wins"))
        .select(
            "doc_id",
            F.size("wins").alias("n_windows"),
            F.explode_outer("wins").alias("win"),
        )
    )
    if hash_keys:
        # collapse the key BEFORE the shuffle; keep null (short-doc marker)
        exploded = exploded.select(
            "doc_id",
            "n_windows",
            F.when(F.col("win").isNotNull(), F.xxhash64("win")).alias("win"),
        )
    # (doc, window) occurrence grain — duplicates inside one doc collapse
    # map-side here, so the shuffle carries distinct (doc, window) pairs.
    per_doc_win = exploded.groupBy("doc_id", "n_windows", "win").agg(
        F.count(F.lit(1)).alias("occ")
    )
    totals = (
        per_doc_win.where(F.col("win").isNotNull())
        .groupBy("win")
        .agg(F.sum("occ").alias("tot"))
    )

    return (
        per_doc_win.join(totals, "win", "left")
        .groupBy("doc_id", "n_windows")
        .agg(
            F.sum(
                F.when(
                    F.col("win").isNotNull() & (F.col("tot") >= 2), F.col("occ")
                ).otherwise(F.lit(0))
            ).alias("n_dup_windows")
        )
        .select(
            "doc_id",
            "n_windows",
            "n_dup_windows",
            F.round(
                F.when(
                    F.col("n_windows") > 0,
                    F.col("n_dup_windows") / F.col("n_windows"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_frac"),
        )
    )
