"""URL admission chain: one declarative verdict over every static URL
gate the engine carries — the integration surface a frontier feeds new
discoveries through before they cost a fetch.

Order is the cheap-reject discipline (each stage only evaluated when all
earlier stages passed, via one CASE chain — Catalyst short-circuits, no
per-stage materialization):

  1. malformed   — non-http(s) scheme / empty host (the F5 skip rule);
  2. blocklisted — registrable-suffix blocklist hit (f9's gate);
  3. robots      — longest-prefix disallow on the alias-folded host
                   (F6's broadcast-rule shape, inlined);
  4. trap        — repeated-path-segment crawler trap (traps.py's
                   strongest single signal);
  5. admit.

Reason codes make the reject stream auditable: every dropped URL carries
WHICH gate dropped it — the difference between a tunable pipeline and a
silent funnel (the same principle as ``robots_drift``'s flip classes).

Alias folding (``fold_host_aliases``) runs before host-keyed gates so a
``www.``/``m.`` variant cannot dodge a blocklist or robots rule keyed on
the canonical host. All JVM expressions; the rule tables are literal
arrays (broadcast-equivalent at this size; swap for broadcast joins when
rule sets outgrow codegen literals, as ``operators/robots.py`` does).

Reference parity: the reference's admission path is the fixed allowlist +
identifier validation in MavenDiscoveryProcess.scala:80-89; this is that
gate generalized to the web-crawl rule families.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from delphi_crawler_spark.functions.canonicalize import fold_host_aliases


def url_admission(
    df: DataFrame,
    url_col: str = "url",
    blocklist_suffixes: tuple[str, ...] = (),
    robots_disallow: dict[str, tuple[str, ...]] | None = None,
    trap_min_repeats: int = 3,
) -> DataFrame:
    """Add (canonical_host, path, verdict, reason): verdict 'admit' or
    'reject'; reason one of malformed / blocklisted / robots / trap /
    ok — first failing gate wins."""
    url = F.col(url_col)
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(url, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    host = F.lower(F.regexp_extract(rest, r"^([^/]+)", 1))
    path = F.coalesce(F.regexp_extract(rest, r"^[^/]*(/.*)?$", 1), F.lit(""))
    chost = fold_host_aliases(host)

    malformed = (~scheme.isin("http", "https")) | (host == "")

    blocked: Column = F.lit(False)
    for suf in blocklist_suffixes:
        blocked = blocked | chost.endswith(suf)

    robots_hit: Column = F.lit(False)
    for h, prefixes in (robots_disallow or {}).items():
        h_match = chost == h
        p_hit = F.lit(False)
        for p in prefixes:
            p_hit = p_hit | path.startswith(p)
        robots_hit = robots_hit | (h_match & p_hit)

    # repeated-path-segment trap WITHOUT regex backreferences (RE2 — and
    # therefore every SQL oracle engine — has none): segment the path and
    # test for any run of `trap_min_repeats` equal consecutive segments
    # via in-cell array logic.
    segs = F.filter(F.split(path, "/"), lambda x: x != "")
    n = F.size(segs)
    k = trap_min_repeats

    def run_at(i: Column) -> Column:
        cond = F.lit(True)
        for j in range(1, k):
            cond = cond & (
                F.element_at(segs, i) == F.element_at(segs, (i + F.lit(j)))
            )
        return cond

    trap = (n >= k) & F.exists(
        F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1))), run_at
    )

    reason = (
        F.when(malformed, F.lit("malformed"))
        .when(blocked, F.lit("blocklisted"))
        .when(robots_hit, F.lit("robots"))
        .when(trap, F.lit("trap"))
        .otherwise(F.lit("ok"))
    )
    return df.select(
        "*",
        F.when(malformed, F.lit(None)).otherwise(chost).alias("canonical_host"),
        F.when(malformed, F.lit(None)).otherwise(path).alias("path"),
        F.when(reason == "ok", F.lit("admit")).otherwise(F.lit("reject")).alias(
            "verdict"
        ),
        reason.alias("reason"),
    )
