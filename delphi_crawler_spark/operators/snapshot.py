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


def term_distribution_drift(
    docs_a: DataFrame,
    docs_b: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Per-term Jensen–Shannon drift between two crawl rounds' unigram
    distributions — the corpus-level companion to ``snapshot_diff``: the
    row-grain diff says WHICH pages changed, this says whether the
    *language of the corpus* moved (topic shift, spam influx, template
    takeover) and which terms drive it.

    Per term t with relative frequencies p (round A) and q (round B),
    m = (p+q)/2, the JSD contribution is
    ``0.5*p*ln(p/m) + 0.5*q*ln(q/m)`` (zero-count sides contribute 0 by
    the x·ln(x) → 0 limit); summing the column gives the corpus JSD in
    nats (bounded by ln 2).

    Scale shape: one token explode + one term hash-agg per side (shared
    tokenization contract with TF-IDF/decontamination), a full-outer
    equi-join at the vocabulary grain, scalar totals as a broadcast
    1-row cross join — never corpus-sized after the first agg. All
    expressions JVM; the CASE guards keep ln off zero counts so the
    column is NaN-free by construction.

    Returns ``(term, cnt_a, cnt_b, p_a, p_b, jsd_term)`` with the ratios
    rounded to 9 (values are vocabulary-small; 9 decimals absorbs the
    ~1e-16-relative ln ulp differences across engines while keeping the
    drift signal).
    """
    def counts(d: DataFrame, name: str) -> DataFrame:
        return (
            d.select(
                F.explode(
                    F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
                ).alias("term")
            )
            .groupBy("term")
            .agg(F.count("*").alias(name))
        )

    ca = counts(docs_a, "cnt_a")
    cb = counts(docs_b, "cnt_b")
    joined = ca.join(cb, "term", "full_outer").select(
        "term",
        F.coalesce("cnt_a", F.lit(0)).alias("cnt_a"),
        F.coalesce("cnt_b", F.lit(0)).alias("cnt_b"),
    )
    totals = joined.agg(
        F.sum("cnt_a").alias("tot_a"), F.sum("cnt_b").alias("tot_b")
    )
    j = joined.crossJoin(F.broadcast(totals))
    # an empty round has tot=0 AND every cnt=0: its distribution is the
    # empty one, every contribution 0 — guard the ratio so 0/0 can never
    # poison the other side's branch through m
    p = F.when(F.col("tot_a") > 0, F.col("cnt_a") / F.col("tot_a")).otherwise(
        F.lit(0.0)
    )
    q = F.when(F.col("tot_b") > 0, F.col("cnt_b") / F.col("tot_b")).otherwise(
        F.lit(0.0)
    )
    m = (p + q) / 2
    jsd = (
        F.when(F.col("cnt_a") > 0, 0.5 * p * F.log(p / m)).otherwise(F.lit(0.0))
        + F.when(F.col("cnt_b") > 0, 0.5 * q * F.log(q / m)).otherwise(F.lit(0.0))
    )
    return j.select(
        "term",
        "cnt_a",
        "cnt_b",
        F.round(p, 9).alias("p_a"),
        F.round(q, 9).alias("p_b"),
        F.round(jsd, 9).alias("jsd_term"),
    )


def detect_mirrors(
    docs: DataFrame,
    host_col: str = "host",
    digest_col: str = "digest",
) -> DataFrame:
    """Cross-host mirror detection: group fetched documents by exact
    content digest and surface every digest served by >= 2 distinct hosts,
    with the sorted host list. Mirrors are the crawl-economics dual of
    dedup — a frontier that knows host B mirrors host A can (a) skip
    re-fetching the mirrored share of B entirely and (b) collapse both
    hosts' politeness budgets onto one copy; search-engine crawlers run
    exactly this digest-grouping pass (Bharat & Broder, WWW 1999, "mirror
    detection on the web").

    Returns (digest, n_docs, n_hosts, hosts) for digests with n_hosts >= 2;
    ``hosts`` is the lexicographically sorted distinct host list, so output
    is deterministic.

    Scale shape: ONE hash aggregation on the digest (count + collect_set
    over hosts — set cardinality is bounded by the mirror fan-out, which is
    small by nature; a digest mirrored across millions of hosts is a
    degenerate spam signature better handled by the traps operator). No
    joins, no windows; partial aggregation runs map-side. At 100 TB the
    digest is already materialized per fetch (resume audits use it), so
    this reads two narrow columns.

    Reference parity: the reference keys its Elasticsearch store by
    identifier and never compares content across sources
    (ElasticStoreQueries.scala); content-addressed mirror grouping is the
    web-tier extension (SURVEY §2.10 family).
    """
    per_digest = docs.groupBy(F.col(digest_col).alias("digest")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.size(F.collect_set(host_col)).alias("n_hosts"),
        F.array_join(F.array_sort(F.collect_set(host_col)), ",").alias("hosts"),
    )
    return per_digest.where(F.col("n_hosts") >= 2)
