"""Registrable-domain extraction (public-suffix matching).

Politeness, trap quotas, and per-source caps are often wrong at HOST
grain: ``a.blogspot.com`` and ``b.blogspot.com`` are different sites
(host grain correct), while ``www.example.co.uk`` and ``api.example.co.uk``
are one operator (domain grain correct). The public standard is the
Public Suffix List: the registrable domain is the public suffix plus one
label. This module implements longest-suffix matching as pure JVM column
math over an embedded subset of the PSL (the full list is a data file a
deployment ships; the MATCHING logic — longest wins, multi-label
suffixes, unknown TLD fallback — is what's implemented and tested here).

Scale shape: the suffix set is a literal array (codegen constant — no
join, no broadcast, no Python); matching tries the 3-, 2-, then 1-label
tail of the split host with ``slice``/``concat_ws``/``array_contains``.
A host whose tail matches no suffix falls back to its last two labels
(ICANN default), and a single-label host (``localhost``) passes through.

Reference parity: the reference's identifier has no host hierarchy
(Maven coordinates); domain grouping is web-crawl-tier hygiene
(SURVEY §2.10), feeding the same per-key budgets P1 consumes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: embedded PSL subset: common ICANN TLDs, multi-label country suffixes,
#: and private-registry suffixes where the SUBDOMAIN is the site.
PUBLIC_SUFFIXES: tuple[str, ...] = (
    "com", "org", "net", "io", "dev", "edu", "gov", "info", "biz",
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp",
    "com.br", "net.br",
    "github.io", "blogspot.com", "herokuapp.com",
)


def registrable_domain(host: Column) -> Column:
    """Longest-matching public suffix + one label; fallback = last two
    labels; single-label hosts pass through unchanged. Lowercases first
    (hosts are case-insensitive)."""
    h = F.lower(host)
    labels = F.split(h, r"\.")
    n = F.size(labels)
    sfx = F.array(*[F.lit(s) for s in PUBLIC_SUFFIXES])

    def tail(k: int) -> Column:
        return F.concat_ws(".", F.slice(labels, -k, k))

    def match(k: int) -> Column:
        return (n > k) & F.array_contains(sfx, tail(k))

    return (
        F.when(match(3), tail(4))
        .when(match(2), tail(3))
        .when(match(1), tail(2))
        .when(n >= 2, tail(2))  # unknown TLD: ICANN default suffix = 1 label
        .otherwise(h)
    )


def blocklist_gate(frontier, blocked, host_col: str = "host"):
    """Suffix-semantics blocklist: a blocked entry ``example.com`` bans the
    exact host AND every subdomain (``a.b.example.com``) — the matching
    rule every public crawler blocklist (ad-block style, crawler opt-out
    lists) uses. Substring/LIKE matching is both wrong (``notexample.com``
    must NOT match) and unscalable (no equi-join); the correct shape is
    the bounded SUFFIX CHAIN: a host of n labels has exactly n candidate
    suffixes, so explode them and equi-join the (small, broadcast)
    blocklist.

    Output: one row per frontier row — ``is_blocked`` and
    ``matched_suffix`` (the LONGEST matching entry, deterministic; null
    when clean). Downstream gates filter ``~is_blocked``; keeping blocked
    rows visible (not silently dropping) is the audit requirement.

    Scale shape: suffix explode is narrow (≤ label-count rows per host,
    web hosts ~3-6); the join is a broadcast equi-join on the suffix
    string; the longest-match fold is one max(struct) hash-agg on the
    frontier key, re-joined broadcast-left. No frontier-sized shuffle
    when the hit set is small (the usual case).

    Reference parity: none needed by the reference (single trusted
    upstream); web-tier legal/ethical gating, sibling of the robots gate.

    ``blocked``: DataFrame with column ``domain`` (lowercase registrable
    or deeper suffixes).
    """
    from pyspark.sql import DataFrame  # noqa: F401 (signature clarity)

    labels = F.split(F.lower(F.col(host_col)), r"\.")
    n = F.size(labels)
    suffixes = F.transform(
        F.sequence(F.lit(1), n),
        lambda k: F.concat_ws(".", F.slice(labels, -k, k)),
    )
    keyed = frontier.withColumn("__sfx", suffixes)
    hits = (
        keyed.select(F.col(host_col).alias("__h"), F.explode("__sfx").alias("sfx"))
        .join(F.broadcast(blocked.select(F.col("domain").alias("sfx"))), "sfx")
        .groupBy("__h")
        .agg(F.max(F.struct(F.length("sfx").alias("l"), F.col("sfx"))).alias("m"))
        .select("__h", F.col("m.sfx").alias("matched_suffix"))
    )
    return (
        keyed.drop("__sfx")
        .join(F.broadcast(hits), F.col(host_col) == F.col("__h"), "left")
        .drop("__h")
        .withColumn("is_blocked", F.col("matched_suffix").isNotNull())
    )
