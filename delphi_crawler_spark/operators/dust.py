"""DUST detection — learning content-irrelevant URL parameters.

Different URLs with Similar Text (Bar-Yossef et al., WWW 2007, "Do Not
Crawl in the DUST") is the dominant duplicate source static rules miss:
session ids, tracking params, sort orders that don't change content.
``functions/canonicalize.strip_tracking_params`` removes a KNOWN public
list; this module LEARNS per-host which parameters are irrelevant from
the crawl's own digest evidence, so host-specific ids (``?sess=``,
``?phpsessid=``, a site's home-grown ``ref=``) get caught too.

The rule learned is the classic DUST parameter-substitution rule: for a
parameter p on host h, group fetched URLs by their RESIDUAL — the URL
with p removed (same path, same other params). If multi-member residual
groups (URLs that differ ONLY in p) consistently share one content
digest, p does not affect content on h and the canonicalizer may strip
it; one counter-example group (same residual, different digests) is
evidence p matters.

Scale shape: the parameter explode is a narrow JVM higher-order pass
(map_keys / map_filter / array_sort(map_entries) — zero Python); the
evidence is two partial-aggregating hash-aggs sharing the
(host, param, residual) shuffle grain prefix, then a host×param-sized
result. No pair joins — evidence grows linearly in fetched URLs, which
is what lets it run over a 10^10-URL crawl log.

Reference parity: the reference's identifiers are canonical by
construction (Maven coordinates); this is web-tier URL-space learning
(SURVEY §2.10), upstream of ``canonicalize_url`` the way
``template_segments`` is upstream of the quality gates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dust_param_relevance(
    pages: DataFrame,
    host_col: str = "host",
    base_col: str = "base",
    params_col: str = "params",
    digest_col: str = "digest",
    min_groups: int = 2,
    min_clean_ratio: float = 0.95,
) -> DataFrame:
    """Per (host, param) DUST evidence table.

    ``pages``: one row per fetched URL with ``base`` (scheme+host+path),
    ``params`` (map<string,string> of query parameters) and ``digest``
    (content hash). Output per (host, param):

    - ``n_groups_multi`` — residual groups with ≥2 members (the only
      groups that carry evidence);
    - ``n_groups_clean`` — of those, groups where every member shares
      one digest;
    - ``clean_ratio``   — clean/multi (rounded to 6);
    - ``irrelevant``    — enough evidence (≥ min_groups multi groups)
      and consistently clean (ratio ≥ min_clean_ratio): safe to strip.

    The residual key sorts the surviving params by name so ``?a=1&b=2``
    and ``?b=2&a=1`` collapse — parameter ORDER is itself DUST.
    """
    param = F.col("param")
    others = F.map_filter(
        F.col(params_col), lambda kk, vv: kk != param
    )
    residual = F.concat(
        F.col(base_col),
        F.lit("?"),
        F.concat_ws(
            "&",
            F.transform(
                F.array_sort(F.map_entries(others)),
                lambda e: F.concat(e["key"], F.lit("="), e["value"]),
            ),
        ),
    )
    exploded = pages.select(
        F.col(host_col).alias("host"),
        F.col(base_col),
        F.col(params_col),
        F.col(digest_col).alias("digest"),
        F.explode(F.map_keys(F.col(params_col))).alias("param"),
    ).select("host", "param", residual.alias("residual"), "digest")

    groups = exploded.groupBy("host", "param", "residual").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.count_distinct(F.col("digest")).alias("n_digests"),
    )
    evidence = groups.groupBy("host", "param").agg(
        F.sum(F.when(F.col("n_urls") > 1, 1).otherwise(0)).alias("n_groups_multi"),
        F.sum(
            F.when((F.col("n_urls") > 1) & (F.col("n_digests") == 1), 1).otherwise(0)
        ).alias("n_groups_clean"),
    )
    ratio = F.when(
        F.col("n_groups_multi") > 0,
        F.round(F.col("n_groups_clean") / F.col("n_groups_multi"), 6),
    ).otherwise(F.lit(0.0))
    return evidence.select(
        "host",
        "param",
        F.col("n_groups_multi").cast("bigint").alias("n_groups_multi"),
        F.col("n_groups_clean").cast("bigint").alias("n_groups_clean"),
        ratio.alias("clean_ratio"),
        (
            (F.col("n_groups_multi") >= F.lit(int(min_groups)))
            & (ratio >= F.lit(float(min_clean_ratio)))
        ).alias("irrelevant"),
    )


def apply_dust_rules(
    pages: DataFrame,
    rules: DataFrame,
    host_col: str = "host",
    base_col: str = "base",
    params_col: str = "params",
) -> DataFrame:
    """Apply learned DUST verdicts: strip every parameter the evidence
    table marked ``irrelevant`` for that host, and emit the canonical
    ``folded_url`` (base + surviving params sorted by name — parameter
    order itself is DUST). Hosts with no learned rules pass through
    unchanged.

    Scale shape: the rule table is host×param-sized (tiny next to the
    crawl log) — grouped to one array per host and broadcast; the fold
    itself is in-cell JVM map/array ops, zero extra shuffle, so it
    composes into the canonicalize projection for free.
    """
    irr = (
        rules.filter(F.col("irrelevant"))
        .groupBy(host_col)
        .agg(F.collect_set("param").alias("_irr"))
    )
    j = pages.join(F.broadcast(irr), host_col, "left")
    keep = F.map_filter(
        F.col(params_col),
        lambda k, v: ~F.coalesce(F.array_contains(F.col("_irr"), k), F.lit(False)),
    )
    folded = F.concat(
        F.col(base_col),
        F.lit("?"),
        F.concat_ws(
            "&",
            F.transform(
                F.array_sort(F.map_entries(keep)),
                lambda e: F.concat(e["key"], F.lit("="), e["value"]),
            ),
        ),
    )
    return j.select(
        *[F.col(c) for c in pages.columns], folded.alias("folded_url")
    )
