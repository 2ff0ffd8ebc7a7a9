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
