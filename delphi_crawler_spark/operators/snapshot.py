"""Crawl snapshot diff: change detection between two fetch rounds.

A recrawl pipeline needs to know, per URL, whether the newly fetched
content is *new*, *gone*, *changed*, or *unchanged* relative to the
previous round — that classification is what feeds freshness-aware
revisit scheduling (``operators/recrawl.py:revisit_intervals`` consumes
exactly the change/unchanged history this operator produces) and
incremental downstream processing (only ``added``/``changed`` rows need
re-extraction, re-dedup, re-indexing).

Scale shape: a single full-outer hash equi-join on the URL key — both
sides are already digest-grained (one row per URL), so the join carries
no amplification; the status column is a pure JVM CASE over null-ness and
digest equality (codegen'd, no Python). At 100 TB both snapshots live in
the same host-bucketed table layout (``storage/tablestore.py``), so the
join is bucket-local with no shuffle at all; the summary is one tiny
hash-agg over the status column.

Reference parity: the reference's ElasticSearch upsert path
(ElasticActor.scala, SURVEY §2.2 S5/S6) overwrites in place and keeps no
diff; change classification between rounds is the web-crawl-tier
extension of that sink (SURVEY §2.10 family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    prev: DataFrame,
    curr: DataFrame,
    key_col: str = "url",
    digest_col: str = "digest",
) -> DataFrame:
    """Classify every key present in either snapshot.

    Returns ``(key, status, prev_digest, curr_digest)`` with status one of
    ``added`` (only in curr), ``removed`` (only in prev), ``changed``
    (both, digests differ), ``unchanged`` (both, digests equal).
    """
    p = prev.select(
        F.col(key_col).alias("key"), F.col(digest_col).alias("prev_digest")
    )
    c = curr.select(
        F.col(key_col).alias("key"), F.col(digest_col).alias("curr_digest")
    )
    j = p.join(c, "key", "full_outer")
    status = (
        F.when(F.col("prev_digest").isNull(), F.lit("added"))
        .when(F.col("curr_digest").isNull(), F.lit("removed"))
        .when(F.col("prev_digest") == F.col("curr_digest"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select("key", status.alias("status"), "prev_digest", "curr_digest")


def diff_summary(diff: DataFrame) -> DataFrame:
    """One row per status with its count — the round-level churn metric a
    scheduler consumes (change rate drives the recrawl interval)."""
    return diff.groupBy("status").agg(F.count(F.lit(1)).alias("n"))
