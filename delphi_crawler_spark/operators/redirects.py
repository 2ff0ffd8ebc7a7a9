"""Redirect-chain resolution by pointer doubling.

A crawl frontier accumulates a redirect map (src URL -> Location target)
from 3xx responses; scheduling and dedup must operate on the *final*
destination (the canonical page), or every hop of a chain is crawled and
stored as a distinct document. Resolving chains naively — one join per
hop — costs one shuffle per hop and never terminates on cycles
(redirect loops are common crawler traps). Pointer doubling composes the
map with itself (``f := f∘f``), so chains up to ``max_hops`` resolve in
``ceil(log2(max_hops))`` keyed equi-joins (5 joins for 32 hops), and any
URL still pointing *into* the map after that is provably on or upstream
of a cycle — flagged, never followed.

Scale shape: every iteration is one hash equi-join of the map with
itself on the pointer key (same alternating-composition discipline as
``graph.py``'s large-star/small-star CC, with ``localCheckpoint`` lineage
truncation per iteration); hop counts compose additively so the resolved
depth is exact. No driver materialization, nothing quadratic: the map
never grows — each composition keeps exactly one row per source.

Reference parity: the reference fetches from a fixed repository and
never sees redirects (HttpDownloader follows them inside the client,
`tools/HttpDownloader.scala`); chain resolution at the frontier grain is
web-crawl-tier hygiene (SURVEY §2.10), sibling to trap detection
(``operators/traps.py``).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(
    redirects: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 32,
) -> DataFrame:
    """Resolve every source to its final destination.

    ``redirects`` must be a *function*: at most one outgoing edge per
    ``src_col`` (a URL redirects to one place; dedupe upstream if a
    recrawl produced several). Returns one row per source:

    - ``final`` — the terminal URL (one that is not itself a redirect
      source), or ``'-'`` for chains that do not terminate within
      ``max_hops`` (i.e. on or feeding a redirect cycle);
    - ``hops`` — exact chain length for resolved rows, ``-1`` otherwise;
    - ``is_cycle`` — 1 for unresolved rows.
    """
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    m = redirects.select(
        F.col(src_col).alias("x"),
        F.col(dst_col).alias("nxt"),
        F.lit(1).cast("bigint").alias("hops"),
    )
    # used exactly once (the terminal-detection join below), so caching it
    # would only pin storage a multi-query run never releases
    srcs = redirects.select(F.col(src_col).alias("skey")).distinct()
    for _ in range(max(1, math.ceil(math.log2(max_hops)))):
        b = m.select(
            F.col("x").alias("bx"),
            F.col("nxt").alias("bnxt"),
            F.col("hops").alias("bhops"),
        )
        m = (
            m.join(b, m["nxt"] == b["bx"], "left")
            .select(
                "x",
                F.coalesce("bnxt", "nxt").alias("nxt"),
                F.when(
                    F.col("bnxt").isNotNull(), F.col("hops") + F.col("bhops")
                )
                .otherwise(F.col("hops"))
                .alias("hops"),
            )
            .localCheckpoint(eager=False)
        )
    out = (
        m.join(srcs, m["nxt"] == srcs["skey"], "left")
        .select(
            F.col("x").alias(src_col),
            F.when(F.col("skey").isNotNull(), F.lit("-"))
            .otherwise(F.col("nxt"))
            .alias("final"),
            F.when(F.col("skey").isNotNull(), F.lit(-1))
            .otherwise(F.col("hops"))
            .cast("bigint")
            .alias("hops"),
            F.col("skey").isNotNull().cast("bigint").alias("is_cycle"),
        )
    )
    return out
