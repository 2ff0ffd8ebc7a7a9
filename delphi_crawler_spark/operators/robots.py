"""Robots/authorization gate (F6) as a broadcast trie + vectorized filter.

The reference has no robots.txt (Maven Central); its analogue is the fixed
repository allowlist ``mavenRepoBase`` (Configuration.scala:51) every fetch
must pass through. The north rule requires a real robots gate: parse
per-host allow/disallow path-prefix rules into a broadcast structure and
filter candidates with a vectorized ``allowed(host, path)``.

Semantics (RFC 9309): the **most specific matching rule** wins — most
pattern octets (§2.2.2); on equal length, ``allow`` wins; a host with no
rules is allowed. Path patterns support the §2.2.3 special characters:
``*`` matches any character run and a trailing ``$`` anchors end-of-path
(compiled to \\Q-quoted Java regexes executor-side; plain prefixes keep a
startswith fast path). Literal ``\\E`` inside a path pattern is the one
unsupported corner (it would close the quote) — not expressible in a
sane URL path.

Scale: the rules stay a DataFrame end-to-end — aggregated executor-side
into one pre-sorted rule array per host and broadcast-JOINED to the
candidates (Spark's broadcast exchange is the north rule's "broadcast
trie"); matching is a JVM higher-order filter over the pre-sorted array,
so the gate is pure whole-stage codegen with no driver materialization
and no Python. ``compile_rules``/``allowed_py`` remain as the independent
reference implementation the tests check the gate against.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _pattern_re(pattern: str):
    """RFC 9309 §2.2.3 path pattern → compiled regex: ``*`` matches any
    char sequence, a trailing ``$`` anchors end-of-path, everything else is
    literal. Returns None for plain prefixes (fast startswith path)."""
    import re

    if "*" not in pattern and not pattern.endswith("$"):
        return None
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "^" + ".*".join(re.escape(piece) for piece in body.split("*"))
    return re.compile(rx + ("$" if anchored else ""))


def compile_rules(rules_pdf: pd.DataFrame) -> dict[str, list[tuple[str, bool]]]:
    """host -> [(path_pattern, is_allow, compiled_or_None)] sorted by
    (pattern_len desc, allow-first) so the first match is the winning rule
    (RFC 9309 §2.2.2 most-octets specificity; wildcards per §2.2.3)."""
    compiled: dict[str, list[tuple[str, bool, object]]] = {}
    for host, grp in rules_pdf.groupby("host"):
        entries = [
            (str(r.path_prefix), str(r.rule) == "allow", _pattern_re(str(r.path_prefix)))
            for r in grp.sort_values("order").itertuples()
        ]
        entries.sort(key=lambda e: (-len(e[0]), not e[1]))
        compiled[host] = entries
    return compiled


def allowed_py(compiled: dict, host: str, path: str) -> bool:
    rules = compiled.get(host)
    if not rules:
        return True
    for pattern, is_allow, rx in rules:
        if rx.match(path) if rx is not None else path.startswith(pattern):
            return is_allow
    return True


def robots_filter(
    candidates: DataFrame,
    rules: DataFrame | None,
    url_col: str = "url",
    host_col: str = "host",
    broadcast_rules: bool = True,
) -> DataFrame:
    """Drop disallowed candidate URLs. ``rules`` is the
    (host, rule, path_prefix, order) dim table.

    Scale shape: the rules NEVER materialize on the driver. They aggregate
    executor-side into one pre-sorted rule array per host
    (``array_sort(collect_list(...))`` keyed so the first matching entry is
    the winning rule: longest prefix, allow-on-ties, line order), join to
    candidates on host — a BroadcastHashJoin by default (the north rule's
    "broadcast trie", realized as Spark's broadcast exchange of the
    per-host arrays); at 10^7–10^8 rule hosts flip ``broadcast_rules=False``
    for a shuffled hash join — and the longest-prefix pick is a JVM
    higher-order ``filter`` + ``element_at`` over the pre-sorted array.
    Zero Python, zero ``collect``/``toPandas``, whole-stage codegen
    (plan-audited in tests/test_plans.py)."""
    if rules is None:
        return candidates
    # RFC 9309 §2.2.3 wildcard compile, executor-side column math: a rule
    # containing '*' (any char run) or a trailing '$' (end anchor) gets a
    # precompiled Java regex — literal chars escaped with \Q..\E quoting so
    # no metachar survives — while plain prefixes keep the startswith fast
    # path (has_wild=false ⇒ pattern never evaluated).
    anchored = F.endswith(F.col("path_prefix"), F.lit("$"))
    body = F.when(
        anchored, F.expr("substring(path_prefix, 1, length(path_prefix) - 1)")
    ).otherwise(F.col("path_prefix"))
    quoted = F.concat(
        F.lit("^"),
        # \Q..\E-quote each literal piece between '*'s; join with '.*'
        F.array_join(
            F.transform(
                F.split(body, r"\*", -1),
                lambda p: F.concat(F.lit("\\Q"), p, F.lit("\\E")),
            ),
            ".*",
        ),
        F.when(anchored, F.lit("$")).otherwise(F.lit("")),
    )
    has_wild = F.col("path_prefix").contains("*") | anchored
    rule_arr = rules.groupBy(F.col("host").alias("__rhost")).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    (-F.length("path_prefix")).alias("neg_len"),
                    F.when(F.col("rule") == "allow", 0).otherwise(1).alias("deny_rank"),
                    F.col("order").alias("order"),
                    F.col("path_prefix").alias("path_prefix"),
                    (F.col("rule") == "allow").alias("is_allow"),
                    has_wild.alias("has_wild"),
                    F.when(has_wild, quoted).otherwise(F.lit("^")).alias("pattern"),
                )
            )
        ).alias("__rules")
    )
    if broadcast_rules:
        rule_arr = F.broadcast(rule_arr)
    path = F.regexp_replace(
        F.col(url_col), r"^[a-z][a-z0-9+.\-]*://[^/]*", ""
    )
    joined = candidates.join(
        rule_arr, F.col(host_col) == F.col("__rhost"), "left"
    ).withColumn("__path", path)
    matched = F.filter(
        F.col("__rules"),
        lambda r: F.when(
            r["has_wild"], F.regexp_like(F.col("__path"), r["pattern"])
        ).otherwise(F.startswith(F.col("__path"), r["path_prefix"])),
    )
    verdict = (
        F.col("__rules").isNull()
        | (F.size(matched) == 0)
        | F.element_at(matched, 1)["is_allow"]
    )
    return joined.filter(verdict).drop("__rhost", "__rules", "__path")


def _grouped_directive_lines(
    bodies: DataFrame, host_col: str, body_col: str
) -> DataFrame:
    """Shared REP front end: bodies → recognized directive lines
    (user-agent / allow / disallow / crawl-delay) with RFC 9309 group ids
    (a group starts at a UA line whose predecessor recognized line is not a
    UA line). Used by both the rule parse and the crawl-delay extraction so
    group boundaries agree."""
    lines = bodies.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), "\n")).alias("line_no", "raw"),
    ).withColumn(
        "line", F.trim(F.regexp_replace("raw", "#.*$", ""))
    ).filter(F.col("line") != "")
    parsed = lines.select(
        "host",
        "line_no",
        F.lower(F.regexp_extract("line", r"^([A-Za-z-]+)\s*:", 1)).alias("directive"),
        F.trim(F.regexp_extract("line", r"^[A-Za-z-]+\s*:\s*(.*)$", 1)).alias("value"),
    ).filter(
        F.col("directive").isin("user-agent", "allow", "disallow", "crawl-delay")
    )
    w = Window.partitionBy("host").orderBy("line_no")
    is_ua = (F.col("directive") == "user-agent").cast("int")
    prev_ua = F.lag(is_ua, 1, 0).over(w)
    starts = ((is_ua == 1) & (prev_ua == 0)).cast("int")
    return parsed.withColumn(
        "group_id",
        F.sum(starts).over(
            Window.partitionBy("host").orderBy("line_no")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).filter(F.col("group_id") > 0)  # rules before any UA line have no group


def _winning_groups(grouped: DataFrame, agent: str) -> DataFrame:
    """(host, group_id) of every group matching the agent at the winning
    specificity: exact token (3) > product-token prefix (2) > ``*`` (1);
    per RFC 9309 §2.2.1 ALL groups at the winning score combine."""
    lv = F.lower(F.col("value"))
    ua = grouped.filter(F.col("directive") == "user-agent").withColumn(
        "score",
        F.when(lv == agent.lower(), 3)
        .when(
            (F.col("value") != "*")
            & (F.col("value") != "")
            & F.lit(agent.lower()).startswith(lv),
            2,
        )
        .when(F.col("value") == "*", 1)
        .otherwise(0),
    )
    group_scores = ua.groupBy("host", "group_id").agg(F.max("score").alias("gscore"))
    best = group_scores.groupBy("host").agg(F.max("gscore").alias("best_score"))
    return (
        group_scores.join(F.broadcast(best), "host")
        .filter((F.col("gscore") == F.col("best_score")) & (F.col("best_score") > 0))
        .select("host", "group_id")
    )


def parse_robots_txt(
    bodies: DataFrame,
    agent: str = "spark-crawler",
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """Parse raw robots.txt bodies into the (host, rule, path_prefix, order)
    rows ``compile_rules`` consumes — the missing front half of F6 (fetching
    gives you TEXT, not rule rows).

    Group semantics (REP, RFC 9309 §2.2.1): lines split into groups led by
    one or more consecutive ``User-agent`` lines; the crawler obeys the
    most-specific matching groups — an exact agent-token match beats a
    product-token prefix match (UA line ``spark`` matches agent
    ``spark-crawler``), which beats ``*``; per RFC 9309, when MULTIPLE
    groups match at the winning specificity their rules are COMBINED into
    one effective group. No match means no rules. Comments (#) are
    stripped, directives are case-insensitive, an empty ``Disallow:``
    imposes nothing (dropped), rule order is line order across the
    combined groups.

    All column math: one posexplode to line grain, regexp directive parse,
    then two carries over the same (host, line) window — a running count of
    group starts (a UA line whose predecessor is not a UA line) assigns
    ``group_id``; the winning score is a per-host hash-agg max and every
    group at that score contributes rules. One shuffle on host; robots
    bodies are tiny, so the line grain stays narrow."""
    grouped = _grouped_directive_lines(bodies, host_col, body_col)
    winners = _winning_groups(grouped, agent)
    rules = (
        grouped.filter(F.col("directive").isin("allow", "disallow"))
        .join(F.broadcast(winners), ["host", "group_id"])
        .filter(~((F.col("directive") == "disallow") & (F.col("value") == "")))
        .withColumn("path_prefix", F.when(F.col("value") == "", "/").otherwise(F.col("value")))
    )
    w_order = Window.partitionBy("host").orderBy("line_no")
    return rules.select(
        "host",
        F.col("directive").alias("rule"),
        "path_prefix",
        (F.row_number().over(w_order) - 1).alias("order"),
    )


def crawl_delays(
    bodies: DataFrame,
    agent: str = "spark-crawler",
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """Per-host ``Crawl-delay`` extraction (the de-facto extension Bing/
    Yandex honor; not in RFC 9309, so kept apart from the rule parse):
    within the winning groups for ``agent`` (same combined-group semantics
    as ``parse_robots_txt`` — the two share the group machinery so
    boundaries agree), take the FIRST syntactically valid numeric delay in
    line order. Returns ``(host, crawl_delay_s: double)``; hosts with no
    valid directive in a winning group have no row. Feeds the politeness
    model: token rate = 1/delay, bounded by the crawler's own budget."""
    grouped = _grouped_directive_lines(bodies, host_col, body_col)
    winners = _winning_groups(grouped, agent)
    delays = (
        grouped.filter(
            (F.col("directive") == "crawl-delay")
            & F.col("value").rlike(r"^[0-9]+(\.[0-9]+)?$")
        )
        .join(F.broadcast(winners), ["host", "group_id"])
    )
    return delays.groupBy("host").agg(
        F.min_by(F.col("value"), F.col("line_no")).cast("double").alias(
            "crawl_delay_s"
        )
    )


def politeness_from_delays(
    delays: DataFrame,
    default_rate: float = 5.0,
    default_burst: int = 5,
    min_rate: float = 0.01,
) -> DataFrame:
    """Turn ``crawl_delays`` output into the (host, rate_per_sec, max_burst)
    dim table ``operators/politeness.assign_emission_slots`` consumes:
    rate = min(1/delay, crawler's own budget ``default_rate``) — a site may
    slow the crawler below its budget but never raise it above — floored at
    ``min_rate`` so a pathological ``Crawl-delay: 86400`` cannot zero out a
    host; burst stays the crawler's own. Hosts without a delay row keep the
    defaults via the politeness join's coalesce."""
    rate = F.least(
        F.lit(default_rate),
        F.greatest(F.lit(min_rate), F.lit(1.0) / F.col("crawl_delay_s")),
    )
    return delays.select(
        "host",
        F.round(rate, 6).alias("rate_per_sec"),
        F.lit(default_burst).cast("int").alias("max_burst"),
    )


# ------------------------------------------------------------------ sitemaps


def _xml_unescape(c: Column) -> Column:
    """Decode the five predefined XML entities (sitemap locs legally
    escape '&' as '&amp;'); '&amp;' last so it cannot re-introduce
    entities. JVM-only, RE2-compatible (plain literals)."""
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&apos;", "'"),
        ("&amp;", "&"),
    ):
        c = F.regexp_replace(c, ent, ch)
    return c


def parse_sitemap_xml(
    bodies: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """Parse sitemap XML bodies (sitemaps.org protocol) into one row per
    ``<url>`` entry: (host, loc, lastmod, changefreq, priority). The other
    half of crawl discovery next to robots/links: sitemaps enumerate URLs
    the link graph alone never reaches, with freshness hints the recrawl
    policy (operators/recrawl.py) consumes directly.

    Regexp block-extraction, not an XML library: sitemap XML is flat and
    machine-generated, the hot path stays a JVM codegen projection
    (explode of ``<url>...</url>`` blocks → per-tag regexp_extract), and
    real-world sitemaps with broken namespaces/doctype noise parse fine.
    Missing optional tags → NULL; entity-escaped locs are decoded."""
    blocks = bodies.select(
        F.col(host_col).alias("host"),
        F.explode(
            F.regexp_extract_all(F.col(body_col), F.lit(r"(?s)<url>.*?</url>"), 0)
        ).alias("blk"),
    )

    def tag(name: str) -> Column:
        return F.regexp_extract("blk", rf"(?s)<{name}>\s*(.*?)\s*</{name}>", 1)

    return blocks.select(
        "host",
        _xml_unescape(tag("loc")).alias("loc"),
        F.nullif(tag("lastmod"), F.lit("")).alias("lastmod"),
        F.nullif(tag("changefreq"), F.lit("")).alias("changefreq"),
        F.nullif(tag("priority"), F.lit("")).cast("double").alias("priority"),
    ).filter(F.col("loc") != "")


def sitemap_index_locs(
    bodies: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """One row per ``<sitemap><loc>`` entry of a sitemap *index* — the
    recursion frontier for nested sitemaps (fetch these, parse again)."""
    blocks = bodies.select(
        F.col(host_col).alias("host"),
        F.explode(
            F.regexp_extract_all(F.col(body_col), F.lit(r"(?s)<sitemap>.*?</sitemap>"), 0)
        ).alias("blk"),
    )
    loc = F.regexp_extract("blk", r"(?s)<loc>\s*(.*?)\s*</loc>", 1)
    return blocks.select("host", _xml_unescape(loc).alias("loc")).filter(
        F.col("loc") != ""
    )


def sitemap_urls_from_robots(
    bodies: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """Extract ``Sitemap:`` directive URLs from raw robots.txt bodies.
    Per RFC 9309 §2.4 the directive is group-independent, so this is a
    plain line scan (no group resolution): one row per (host, sitemap_url),
    line order preserved."""
    lines = bodies.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), "\n")).alias("line_no", "raw"),
    ).withColumn("line", F.trim(F.regexp_replace("raw", "#.*$", "")))
    url = F.trim(F.regexp_extract("line", r"(?i)^sitemap\s*:\s*(.*)$", 1))
    return (
        lines.select("host", "line_no", url.alias("sitemap_url"))
        .filter(F.col("sitemap_url") != "")
    )


def meta_robots_gate(
    docs: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document robots META directives + link-level rel=nofollow
    accounting — the in-page half of robots compliance (robots.txt is the
    per-host half, ``robots_filter``). Honors the public REP meta
    conventions (<meta name="robots" content="noindex, nofollow">, and
    rel="nofollow" on individual anchors, Google/Bing published semantics):

    - ``noindex``  → the page's text must not enter the corpus/index;
    - ``nofollow`` (meta) → none of its outlinks may enter the frontier;
    - rel="nofollow" on an anchor → only that link is excluded.

    Output per doc: robots_content (raw attr, '' when absent), noindex,
    nofollow booleans, n_links / n_follow_links (anchors the frontier may
    accept), and ``action`` ('index'/'noindex' + 'follow'/'nofollow') for
    the downstream gate.

    Pure JVM projection: one regexp_extract for the meta tag, token-exact
    membership test on the comma-split content (substring matching would
    wrongly fire 'noindex' inside 'noindexfoo'), regexp_extract_all sizes
    for anchor counts. No shuffle, RE2-compatible patterns so a SQL twin
    replicates byte-for-byte.
    """
    html = F.col(html_col)
    content = F.lower(
        F.regexp_extract(html, '<meta name="robots" content="([^"]*)"', 1)
    )
    toks = F.transform(F.split(content, ","), lambda t: F.trim(t))
    noindex = F.array_contains(toks, "noindex")
    nofollow_meta = F.array_contains(toks, "nofollow")
    n_links = F.size(F.regexp_extract_all(html, F.lit("<a href=\"[^\"]*\""), 0))
    n_nofollow = F.size(
        F.regexp_extract_all(html, F.lit("<a href=\"[^\"]*\" rel=\"nofollow\""), 0)
    )
    n_follow = F.when(nofollow_meta, F.lit(0)).otherwise(n_links - n_nofollow)
    return docs.select(
        F.col(id_col),
        content.alias("robots_content"),
        noindex.alias("noindex"),
        nofollow_meta.alias("nofollow"),
        n_links.cast("bigint").alias("n_links"),
        n_follow.cast("bigint").alias("n_follow_links"),
        F.concat(
            F.when(noindex, F.lit("noindex")).otherwise(F.lit("index")),
            F.lit("+"),
            F.when(nofollow_meta, F.lit("nofollow")).otherwise(F.lit("follow")),
        ).alias("action"),
    )


def robots_cache_plan(
    frontier: DataFrame,
    cache: DataFrame,
    now_ms: int,
    ttl_ms: int = 86_400_000,
    host_col: str = "host",
) -> DataFrame:
    """Per-host robots.txt refresh plan for the upcoming round — which
    hosts can schedule against the cached rule set and which must spend a
    fetch slot on ``/robots.txt`` first.

    RFC 9309 §2.4 (public REP spec): crawlers MAY cache robots.txt up to
    24 hours (the default ``ttl_ms``) and MUST NOT use a stale copy
    indefinitely; a server error on the last fetch means the rules are
    unknown, so a 5xx-cached host is re-fetched regardless of age (until
    then §2.3.1.4 says assume complete disallow — the gate downstream, not
    this planner, enforces that).

    Output one row per DISTINCT frontier host: ``n_pending`` (URLs waiting
    behind the decision), ``age_ms`` (now - fetched, -1 when never
    fetched) and ``action``::

        fetch      no cached copy exists
        refresh    cached copy is stale (age >= ttl) or last fetch was 5xx
        use-cache  fresh successful copy — schedule immediately

    Scale shape: the frontier collapses to host grain with one
    partial-aggregating hash-agg (map-side combine makes this cheap even
    at 10^10 pending URLs); the cache dim is hosts-sized and
    broadcast-joined. No frontier-sized shuffle beyond the host agg.

    Reference parity: the reference polls one index with no robots
    protocol at all; this closes the fetch-planning half of F6
    (``robots_filter`` is the rule-evaluation half) for the web tier.
    """
    hosts = (
        frontier.select(F.col(host_col).alias("host"))
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("n_pending"))
    )
    dim = cache.select(
        "host",
        F.col("fetched_ms").cast("long").alias("fetched_ms"),
        F.col("status").cast("int").alias("status"),
    )
    joined = hosts.join(F.broadcast(dim), "host", "left")
    age = F.lit(int(now_ms)) - F.col("fetched_ms")
    action = (
        F.when(F.col("fetched_ms").isNull(), F.lit("fetch"))
        .when(
            (age >= F.lit(int(ttl_ms))) | (F.col("status") >= 500), F.lit("refresh")
        )
        .otherwise(F.lit("use-cache"))
    )
    return joined.select(
        "host",
        "n_pending",
        F.coalesce(age, F.lit(-1)).cast("long").alias("age_ms"),
        action.alias("action"),
    )


def xrobots_header_gate(
    responses: DataFrame,
    agent: str = "delphibot",
    header_col: str = "x_robots_tag",
    id_col: str = "doc_id",
) -> DataFrame:
    """X-Robots-Tag HTTP header gating — the response-header third of REP
    compliance (robots.txt = per-host, meta robots = in-page HTML; the
    header covers non-HTML payloads: PDFs, images, feeds). Published
    Google/Bing semantics: the header value is a comma-separated
    directive list, optionally scoped to one user agent by a
    ``agent:`` prefix (``X-Robots-Tag: googlebot: noindex``); an
    agent-scoped group applies only to that agent, an unscoped group to
    everyone; the union of applicable groups wins (restrictive-OR —
    ``none`` expands to noindex+nofollow).

    Pure JVM: split on comma, trim+lower each token, resolve the
    optional scope prefix per token run. Scoping rule on a multi-token
    header: a scope prefix applies to ALL following tokens until the
    next scope prefix (the header grammar published by Google). Zero
    shuffle — composes into the fetch-result projection.
    """
    toks = F.transform(
        F.split(F.coalesce(F.col(header_col), F.lit("")), ","),
        lambda t: F.lower(F.trim(t)),
    )
    # resolve scoping with an in-cell fold: acc = (current_scope, directives)
    folded = F.aggregate(
        toks,
        F.struct(
            F.lit("*").alias("scope"), F.array().cast("array<string>").alias("ds")
        ),
        lambda acc, t: F.when(
            t.contains(":")
            & ~t.startswith("unavailable_after"),  # unavailable_after: <date> is a directive, not a scope
            F.struct(
                F.trim(F.split(t, ":")[0]).alias("scope"),
                F.when(
                    (F.trim(F.split(t, ":")[0]) == F.lit(agent))
                    | (F.trim(F.split(t, ":")[0]) == F.lit("*")),
                    F.array_append(
                        acc["ds"], F.trim(F.substring_index(t, ":", -1))
                    ),
                ).otherwise(acc["ds"]).alias("ds"),
            ),
        ).otherwise(
            F.struct(
                acc["scope"].alias("scope"),
                F.when(
                    (acc["scope"] == F.lit("*")) | (acc["scope"] == F.lit(agent)),
                    F.array_append(acc["ds"], t),
                ).otherwise(acc["ds"]).alias("ds"),
            )
        ),
    )
    ds = folded["ds"]
    has = lambda d: F.array_contains(ds, d)
    noindex = has("noindex") | has("none")
    nofollow = has("nofollow") | has("none")
    noarchive = has("noarchive")
    return responses.select(
        id_col,
        F.col(header_col),
        noindex.alias("noindex"),
        nofollow.alias("nofollow"),
        noarchive.alias("noarchive"),
        F.when(noindex & nofollow, F.lit("noindex+nofollow"))
        .when(noindex, F.lit("noindex"))
        .when(nofollow, F.lit("nofollow"))
        .otherwise(F.lit("index+follow"))
        .alias("action"),
    )


def robots_drift(
    candidates: DataFrame,
    rules_old: DataFrame | None,
    rules_new: DataFrame | None,
    key_col: str = "url",
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """Robots-rule drift impact: evaluate the SAME candidate set under
    last round's compiled rules and this round's, and classify every URL
    by the flip — the audit a crawl runs when a refreshed robots.txt
    lands, BEFORE the scheduler acts on it (a site suddenly disallowing
    a section should show up as a reviewable 'newly_blocked' cohort and
    a frontier-prune plan, not as silent fetch deaths; the reverse flip
    is recrawl inventory).

    Returns (key, allowed_old, allowed_new, status) with status in
    stable_allowed / stable_blocked / newly_blocked / newly_allowed.
    Shape: two ``robots_filter`` passes (each a broadcast prefix gate —
    the F6 plan, unchanged) + two key-keyed left-semi marks. Candidates
    scan once per verdict; nothing collects."""
    base = candidates.select(key_col).distinct()
    old_ok = (
        robots_filter(candidates, rules_old, url_col, host_col)
        .select(key_col)
        .distinct()
        .withColumn("_o", F.lit(True))
    )
    new_ok = (
        robots_filter(candidates, rules_new, url_col, host_col)
        .select(key_col)
        .distinct()
        .withColumn("_n", F.lit(True))
    )
    j = base.join(old_ok, key_col, "left").join(new_ok, key_col, "left")
    o = F.coalesce(F.col("_o"), F.lit(False))
    n = F.coalesce(F.col("_n"), F.lit(False))
    return j.select(
        key_col,
        o.alias("allowed_old"),
        n.alias("allowed_new"),
        F.when(o & n, F.lit("stable_allowed"))
        .when(~o & ~n, F.lit("stable_blocked"))
        .when(o & ~n, F.lit("newly_blocked"))
        .otherwise(F.lit("newly_allowed"))
        .alias("status"),
    )
