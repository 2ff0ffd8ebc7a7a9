"""Crawler-trap detection by URL pattern mining.

Infinite URL spaces (calendar pages, session-id paths, faceted search) are
the classic crawler trap: a single template generates unbounded distinct
URLs with no new content. The standard public countermeasure (described in
e.g. Heritrix's docs and crawl literature) is to collapse each URL path to a
*pattern* — digit runs → ``N``, long hex runs → ``H`` — and flag patterns
that account for an outsized share of a host's frontier.

Scale shape: the pattern is a pure JVM ``regexp_replace`` chain (codegen'd,
no Python); the per-(host, pattern) count and the per-host totals are two
partial-aggregating hash-aggs that share one shuffle grain (host, pattern) —
the second agg re-groups the already-tiny pattern table by host. Output is
pattern-grained, so downstream the frontier can left-anti join flagged
(host, pattern) pairs to quarantine trap URLs without touching clean ones.

Reference parity: the reference crawls a finite Maven index and needs no
trap logic; this is frontier-hygiene for the web-crawl tier (SURVEY §2.10
family), sibling to the robots gate (``operators/robots.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def url_pattern(path: Column) -> Column:
    """Collapse a URL path to its template: hex runs (≥8 chars, likely ids/
    hashes) → ``H`` first, then any digit run → ``N``. Pinned order — hex
    first, else its digits would already be mangled."""
    p = F.regexp_replace(path, "[0-9a-f]{8,}", "H")
    return F.regexp_replace(p, "[0-9]+", "N")


def trap_patterns(
    frontier: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
    min_pattern_urls: int = 50,
    max_share: float = 0.3,
) -> DataFrame:
    """Per-(host, pattern) trap report: ``n_urls`` under the pattern,
    ``host_urls`` total for the host, ``share`` = n_urls/host_urls, and
    ``is_trap`` — the pattern is both absolutely large (≥ min_pattern_urls)
    and relatively dominant (share ≥ max_share). Deterministic, no
    thresholds hidden in the operator."""
    pat = frontier.select(
        F.col(host_col).alias("host"),
        url_pattern(F.col(path_col)).alias("pattern"),
    )
    per_pattern = pat.groupBy("host", "pattern").agg(
        F.count(F.lit(1)).alias("n_urls")
    )
    per_host = per_pattern.groupBy("host").agg(F.sum("n_urls").alias("host_urls"))
    return (
        per_pattern.join(per_host, "host")
        .withColumn(
            "share", F.round(F.col("n_urls") / F.col("host_urls"), 6)
        )
        .withColumn(
            "is_trap",
            (F.col("n_urls") >= F.lit(min_pattern_urls))
            & (F.col("share") >= F.lit(max_share)),
        )
        .select("host", "pattern", "n_urls", "host_urls", "share", "is_trap")
    )


# Public soft-404 heuristic phrases (the crawl-literature standard set —
# e.g. Bar-Yossef WWW'04 "Sic transit gloria telae" detects soft 404s by
# error-page content signatures). Fixed substrings, matched on lowercased
# text, so a SQL twin replicates with plain position() — no regex dialect.
SOFT404_PHRASES = (
    "page not found",
    "404 not found",
    "does not exist",
    "no longer available",
    "cannot be found",
)


def soft404_flags(
    pages: DataFrame,
    id_col: str = "doc_id",
    status_col: str = "status",
    body_col: str = "body",
    min_chars: int = 400,
) -> DataFrame:
    """Classify fetched pages as ``ok`` / ``hard-404`` / ``soft-404`` — the
    error pages served with HTTP 200 that poison both the frontier (their
    links are navigation chrome) and the corpus (boilerplate error text
    duplicated across thousands of URLs).

    A page is a soft-404 when the status says success but the content says
    error: any known error phrase in the body, OR a stub body (< min_chars)
    that mentions "404". Real 404/410 responses are ``hard-404`` (their
    correct handling is frontier removal, not content scoring). Output per
    page: phrase_hit, stub_404 booleans and the ``verdict``.

    Scale shape: pure JVM projection (lower + instr + length — codegen'd,
    no Python, no shuffle); composes with ``trap_patterns`` (URL-space
    hygiene) and ``template_segments`` (host boilerplate) as the
    content-side frontier gate.

    Reference parity: the reference's upstream never serves soft errors
    (Maven index is authoritative); this is web-tier fetch classification
    (SURVEY §2.10), sibling of ``recrawl.classify_fetch``.
    """
    low = F.lower(F.col(body_col))
    phrase_hit = F.lit(False)
    for p in SOFT404_PHRASES:
        phrase_hit = phrase_hit | (F.instr(low, p) > 0)
    stub_404 = (F.length(low) < F.lit(int(min_chars))) & (F.instr(low, "404") > 0)
    status = F.col(status_col)
    verdict = (
        F.when(status.isin(404, 410), F.lit("hard-404"))
        .when((status == 200) & (phrase_hit | stub_404), F.lit("soft-404"))
        .otherwise(F.lit("ok"))
    )
    return pages.select(
        F.col(id_col),
        status.cast("int").alias("status"),
        phrase_hit.alias("phrase_hit"),
        stub_404.alias("stub_404"),
        verdict.alias("verdict"),
    )
