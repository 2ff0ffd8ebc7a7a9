"""Recrawl policy operators: fetch-change classification, adaptive revisit
intervals, and inlink-degree priority refresh.

A perpetual crawl is mostly RE-crawl: deciding what changed, how often each
host is worth revisiting, and which frontier entries deserve priority. The
reference's store layer already distinguishes exists-vs-new per identifier
(ElasticStoreQueries.scala:63-75 upsert-or-create, S6); these operators
extend that to content granularity and close the loop back into the
scheduler (P6 priorities, P1 budgets):

- ``classify_fetch``: full-outer join of the previous snapshot's (url,
  digest) against the current fetch — ``new`` / ``changed`` / ``unchanged``
  / ``gone``. One equi-join on url; digests compare as opaque strings, so
  the operator is agnostic to the hash in use (md5 content digest in the
  exact-dedup family).

- ``revisit_intervals``: per host, the observed change ratio among
  re-fetched URLs sets the next revisit interval by linear interpolation —
  ``min_s + (max_s - min_s) · (1 - change_ratio)`` — volatile hosts
  approach ``min_s``, static hosts ``max_s``. Hosts with no re-fetch
  evidence get ``max_s`` (nothing observed changing). One hash-agg.

- ``inlink_priority_refresh``: discovered-link in-degree (distinct
  sources per target) lifts frontier priority by ``log2(1 + indegree)``,
  capped at ``max_priority`` — the backlink-count prioritization of
  classic crawl ordering studies (Cho/Garcia-Molina/Page '98, public
  knowledge). In-degree is a partial-aggregating count-distinct keyed by
  target; the join back to the frontier is an equi-join on url.

All pure column math; every aggregation partial-aggregates map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def classify_fetch(
    prev: DataFrame,
    curr: DataFrame,
    url_col: str = "url",
    digest_col: str = "digest",
) -> DataFrame:
    """Classify every URL across two crawl snapshots:
    ``new`` (current only), ``gone`` (previous only), ``changed`` /
    ``unchanged`` (both, by digest equality). Returns (url, status,
    digest) with the current digest where one exists."""
    p = prev.select(
        F.col(url_col).alias("url"), F.col(digest_col).alias("__prev_digest")
    )
    c = curr.select(
        F.col(url_col).alias("url"), F.col(digest_col).alias("__curr_digest")
    )
    joined = p.join(c, "url", "full_outer")
    status = (
        F.when(F.col("__prev_digest").isNull(), "new")
        .when(F.col("__curr_digest").isNull(), "gone")
        .when(F.col("__prev_digest") == F.col("__curr_digest"), "unchanged")
        .otherwise("changed")
    )
    return joined.select(
        "url",
        status.alias("status"),
        F.coalesce("__curr_digest", "__prev_digest").alias("digest"),
    )


def revisit_intervals(
    classified: DataFrame,
    host_col: str = "host",
    status_col: str = "status",
    min_s: int = 3600,
    max_s: int = 7 * 24 * 3600,
) -> DataFrame:
    """Per-host adaptive revisit interval from observed change ratios:
    ``ratio = changed / (changed + unchanged)`` over re-fetched URLs;
    ``interval_s = round(min_s + (max_s - min_s) * (1 - ratio))``; hosts
    with no re-fetch evidence (ratio undefined) get ``max_s``."""
    agg = classified.groupBy(host_col).agg(
        F.sum(F.when(F.col(status_col) == "changed", 1).otherwise(0)).alias("__ch"),
        F.sum(F.when(F.col(status_col) == "unchanged", 1).otherwise(0)).alias("__un"),
    )
    refetched = F.col("__ch") + F.col("__un")
    ratio = F.when(refetched > 0, F.col("__ch") / refetched)
    interval = F.when(
        ratio.isNull(), F.lit(float(max_s))
    ).otherwise(F.round(min_s + (max_s - min_s) * (1.0 - ratio), 0))
    return agg.select(
        host_col,
        F.col("__ch").cast("long").alias("n_changed"),
        F.col("__un").cast("long").alias("n_unchanged"),
        interval.cast("long").alias("revisit_interval_s"),
    )


def inlink_priority_refresh(
    frontier: DataFrame,
    links: DataFrame,
    url_col: str = "url",
    src_col: str = "src",
    dst_col: str = "dst",
    priority_col: str = "priority",
    max_priority: int = 9,
) -> DataFrame:
    """Backlink-count priority: in-degree (distinct sources) per target
    lifts the frontier entry's priority by ``floor(log2(1 + indegree))``,
    capped. Frontier rows nobody links to keep their base priority."""
    indeg = links.groupBy(F.col(dst_col).alias(url_col)).agg(
        F.count_distinct(src_col).alias("__indeg")
    )
    boosted = F.least(
        F.lit(max_priority),
        F.col(priority_col)
        + F.floor(F.log2(1 + F.coalesce(F.col("__indeg"), F.lit(0)))),
    )
    return (
        frontier.join(indeg, url_col, "left")
        .withColumn(priority_col, boosted.cast("int"))
        .withColumn("indegree", F.coalesce("__indeg", F.lit(0)).cast("long"))
        .drop("__indeg")
    )


def change_rate_estimate(
    visits: DataFrame,
    url_col: str = "url",
    ts_us_col: str = "ts_us",
    changed_col: str = "changed",
) -> DataFrame:
    """Per-URL Poisson change-rate estimation from revisit history — the
    bias-reduced frequency estimator of Cho & Garcia-Molina, "Estimating
    Frequency of Change" (TOIT 2003), eq. (6): with n revisits of which X
    detected a change, lambda_hat = -log((n - X + 0.5) / (n + 0.5)) per
    mean revisit interval. This is the principled upgrade of
    ``revisit_intervals``' change-ratio heuristic: it corrects for changes
    MISSED between visits (a page that changed twice between two probes
    counts once), which the raw ratio cannot.

    Input: one row per completed revisit — ``(url, ts_us, changed)`` with
    ``ts_us`` the visit time in epoch microseconds and ``changed`` whether
    the content digest moved since the previous visit.

    Output per URL (n >= 2 visits spanning > 0 time; others carry no
    interval evidence and are dropped): visit count, change count, mean
    interval, ``lambda_per_day``, and ``horizon_days`` = 1/lambda (NULL
    when no change was ever observed — lambda_hat = 0 means "no evidence",
    not "never changes").

    One partial-aggregating hash-agg keyed by URL; all math is JVM
    expressions. Doubles are combined in a fixed operation order and
    rounded to 6 dp so the DuckDB oracle twin is bit-comparable.
    """
    n = F.count(F.lit(1))
    x = F.sum(F.when(F.col(changed_col), 1).otherwise(0))
    agg = (
        visits.groupBy(url_col)
        .agg(
            n.alias("n_visits"),
            x.alias("n_changed"),
            (F.max(ts_us_col) - F.min(ts_us_col)).alias("_span_us"),
        )
        .where((F.col("n_visits") >= 2) & (F.col("_span_us") > 0))
    )
    nn = F.col("n_visits")
    xx = F.col("n_changed")
    ibar_s = (F.col("_span_us").cast("double") / (nn - 1)) / 1_000_000.0
    ratio = ((nn - xx) + 0.5) / (nn + 0.5)
    lam_day = -F.log(ratio) / (ibar_s / 86400.0)
    return agg.select(
        url_col,
        nn.cast("long").alias("n_visits"),
        xx.cast("long").alias("n_changed"),
        F.round(ibar_s, 6).alias("mean_interval_s"),
        F.round(lam_day, 6).alias("lambda_per_day"),
        F.when(xx > 0, F.round(1.0 / lam_day, 6)).alias("horizon_days"),
    )


def host_quality_prior(
    docs: DataFrame,
    host_col: str = "host",
    letters_col: str = "n_letters",
    chars_col: str = "n_chars",
    k: float = 200.0,
) -> DataFrame:
    """Per-host content-quality prior for crawl prioritization: hosts whose
    fetched pages score well get their pending URLs boosted (the host-level
    quality feedback loop of focused-crawling practice — Chakrabarti et al.
    1999's page-score propagation, public knowledge). Quality is a ratio of
    INTEGER masses (``letters_col`` / ``chars_col`` per fetched doc) so the
    per-host sums are exact at any parallelism and engine — no
    summation-order drift. The prior shrinks each host's observed rate
    toward the global rate with ``k`` pseudo-characters of evidence
    (Bayesian smoothing): ``(letters_h + k·rate_g) / (chars_h + k)`` —
    unobserved-ish hosts sit near the global rate, heavily-fetched hosts
    near their own.

    One partial-aggregating hash-agg per host + a broadcast of the 1-row
    global totals. Returns (host, n_docs, chars, rate, prior)."""
    per = (
        docs.select(
            F.col(host_col).cast("string").alias("host"),
            F.col(letters_col).cast("bigint").alias("l"),
            F.col(chars_col).cast("bigint").alias("c"),
        )
        .filter(F.col("host").isNotNull() & (F.col("c") > 0))
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("l").alias("letters"),
            F.sum("c").alias("chars"),
        )
    )
    glob = per.agg(
        F.sum("letters").alias("gl"), F.sum("chars").alias("gc")
    )
    kk = F.lit(float(k))
    return per.crossJoin(F.broadcast(glob)).select(
        "host",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("chars").cast("bigint").alias("chars"),
        F.round(F.col("letters") / F.col("chars"), 6).alias("rate"),
        F.round(
            (F.col("letters") + kk * (F.col("gl") / F.col("gc")))
            / (F.col("chars") + kk),
            6,
        ).alias("prior"),
    )


def conditional_fetch_plan(
    frontier: DataFrame,
    stored: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Plan HTTP revalidation for a recrawl round: decide per candidate
    whether the fetch can be conditional (If-None-Match on a stored ETag,
    else If-Modified-Since on a stored Last-Modified) or must be full —
    the standard validator precedence from RFC 9110 §13.1 (ETag is the
    strong validator; IMS is the fallback). A 304 costs headers only, so
    the per-(host, mode) plan also carries the byte volume a fully-valid
    cache would save — the number a recrawl budgeter trades off against
    politeness capacity.

    Inputs: ``frontier`` (url, host) — this round's recrawl candidates;
    ``stored`` (url, etag nullable, last_modified nullable, content_len).
    One LEFT broadcast-able equi-join on url (stored validators are the
    dimension side in a focused recrawl; at full-corpus recrawl both sides
    shuffle on the url key they already share) + one (host, mode)
    hash-agg. Modes: 'etag' / 'ims' / 'full' (no validators or never
    stored). Output: (host, mode, n_urls, revalidatable_bytes) where bytes
    count only conditional rows.
    """
    s = stored.select(
        F.col(url_col).alias("_u"),
        "etag",
        "last_modified",
        F.col("content_len").cast("bigint").alias("_len"),
    )
    joined = frontier.join(s, frontier[url_col] == s["_u"], "left")
    mode = (
        F.when(F.col("etag").isNotNull(), F.lit("etag"))
        .when(F.col("last_modified").isNotNull(), F.lit("ims"))
        .otherwise(F.lit("full"))
    )
    return (
        joined.select(
            "host",
            mode.alias("mode"),
            F.when(mode != "full", F.coalesce(F.col("_len"), F.lit(0)))
            .otherwise(F.lit(0))
            .alias("_save"),
        )
        .groupBy("host", "mode")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.sum("_save").cast("bigint").alias("revalidatable_bytes"),
        )
    )


def sitemap_delta_plan(
    sitemap: DataFrame,
    store: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Incremental recrawl plan from sitemap <lastmod> vs the stored fetch
    time — the sitemaps-protocol contract (sitemaps.org; RFC-adjacent
    public spec) that lets a crawler skip the unchanged majority of a
    site without touching it:

    - ``fetch-new``  — URL in the sitemap, never stored;
    - ``refetch``    — stored copy older than lastmod, OR lastmod absent
      (freshness unprovable: the spec makes lastmod optional, and a
      planner that "skips" unverifiable URLs silently goes stale);
    - ``skip``       — stored copy at or after lastmod — no fetch needed.

    Output per sitemap URL: action, ``lastmod_ms`` (-1 when absent),
    ``fetched_ms`` (-1 when new) — store-only URLs are deletion
    candidates for ``snapshot_diff``, not this planner's rows.

    Scale shape: one equi-join on url (sort-merge at corpus scale; the
    store side is the big one and arrives bucketed by url_hash from the
    table layout) + a pure JVM action projection. The skip majority
    never reaches the fetcher — the whole point.

    Reference parity: the reference re-reads its full index each round;
    lastmod-delta planning is the web-tier incremental path (SURVEY
    §2.10), composing with ``conditional_fetch_plan`` (ETag/IMS) for the
    URLs this planner does send to fetch.
    """
    sm = sitemap.select(
        F.col(url_col).alias("url"),
        F.col("lastmod_ms").cast("long").alias("lastmod_ms"),
    )
    st = store.select(
        F.col(url_col).alias("url"),
        F.col("fetched_ms").cast("long").alias("fetched_ms"),
    )
    j = sm.join(st, "url", "left")
    action = (
        F.when(F.col("fetched_ms").isNull(), F.lit("fetch-new"))
        .when(
            F.col("lastmod_ms").isNull() | (F.col("lastmod_ms") > F.col("fetched_ms")),
            F.lit("refetch"),
        )
        .otherwise(F.lit("skip"))
    )
    return j.select(
        "url",
        F.coalesce("lastmod_ms", F.lit(-1)).cast("long").alias("lastmod_ms"),
        F.coalesce("fetched_ms", F.lit(-1)).cast("long").alias("fetched_ms"),
        action.alias("action"),
    )


def refresh_allocation(
    pages: DataFrame,
    budget: int,
    max_per_page: int = 16,
    url_col: str = "url",
    rate_col: str = "change_rate",
) -> DataFrame:
    """Freshness-optimal revisit allocation (Cho & Garcia-Molina, TOIT
    2003 "Effective page refresh policies for web crawlers"): given
    per-page Poisson change rates λ (``change_rate_estimate``) and a
    total revisit budget B per period, choose integer visit counts f_i
    maximizing average freshness  F(λ, f) = (f/λ)·(1 − e^{−λ/f}).

    F is concave in f, so the exact discrete optimum is greedy: take the
    B largest marginal gains g(λ,k) = F(λ,k) − F(λ,k−1) over all
    (page, k ≤ max_per_page) candidates. This reproduces the paper's
    famously non-proportional answer — pages that change much faster
    than the affordable revisit rate get FEWER visits (their first-visit
    gain is already small), the opposite of naive λ-proportional
    scheduling.

    Determinism: gains are rounded to 9 decimals and tie-broken by
    (url asc, k asc), so the selected set is a pure function of the
    input. Per page the selected ks are a prefix {1..f_i} (gains
    strictly decrease in k), hence ``visits`` = count of selected rows.

    Scale shape: candidates = |pages| × max_per_page rows of pure JVM
    math (one in-cell sequence explode); selection is sort+limit —
    Spark's TakeOrdered (per-partition top-B + driver merge), so keep
    B ≤ ~10^6; beyond that switch to the documented threshold-search
    variant (two passes: histogram the gains, pick the cutoff, filter).
    Pages with λ ≤ 0 or null are excluded from the pool and come back
    with visits 0 (a never-changing page needs archival, not refresh).
    """
    if budget < 0:
        raise ValueError("budget must be >= 0")
    lam = F.col(rate_col).cast("double")
    url = F.col(url_col)
    pool = pages.select(url.alias("url"), lam.alias("lam")).filter(
        lam.isNotNull() & (lam > 0)
    )
    rest = pages.select(url.alias("url"), lam.alias("lam")).filter(
        lam.isNull() | (lam <= 0)
    )
    k = F.col("k").cast("double")
    lamc = F.col("lam")

    def fresh(f):  # F(lam, f) for f >= 1; F(lam, 0) = 0
        return (f / lamc) * (F.lit(1.0) - F.exp(-lamc / f))

    cand = pool.select(
        "url", "lam", F.explode(F.sequence(F.lit(1), F.lit(int(max_per_page)))).alias("k")
    ).select(
        "url",
        "lam",
        "k",
        F.round(
            fresh(k) - F.when(F.col("k") == 1, F.lit(0.0)).otherwise(fresh(k - 1)),
            9,
        ).alias("gain"),
    )
    taken = cand.orderBy(
        F.col("gain").desc(), F.col("url").asc(), F.col("k").asc()
    ).limit(int(budget))
    alloc = taken.groupBy("url").agg(
        F.first("lam").alias("lam"), F.count(F.lit(1)).cast("bigint").alias("visits")
    )
    out = (
        pool.select("url", "lam")
        .join(alloc.select("url", "visits"), "url", "left")
        .select(
            "url",
            F.col("lam").alias(rate_col),
            F.coalesce(F.col("visits"), F.lit(0)).cast("bigint").alias("visits"),
        )
        .unionByName(
            rest.select(
                "url",
                F.col("lam").alias(rate_col),
                F.lit(0).cast("bigint").alias("visits"),
            )
        )
    )
    vis = F.col("visits").cast("double")
    lam2 = F.col(rate_col).cast("double")
    return out.select(
        "url",
        rate_col,
        "visits",
        F.when(
            (F.col("visits") > 0) & (lam2 > 0),
            F.round((vis / lam2) * (F.lit(1.0) - F.exp(-lam2 / vis)), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("freshness"),
    )


def http_cache_plan(
    cached: DataFrame,
    now_ms: int,
    heuristic_cap_s: int = 86400,
    heuristic_frac_denom: int = 10,
) -> DataFrame:
    """Per-URL cache freshness decision (RFC 9111 §4.2): decides whether a
    recrawl candidate needs ANY request at all — upstream of
    ``conditional_fetch_plan`` (which picks the validator once a request
    is needed). Freshness lifetime precedence:

    1. ``no_store``/``no_cache`` ⇒ lifetime 0 (always revalidate/refetch);
    2. ``Cache-Control: max-age`` (``max_age_s``) if present;
    3. ``Expires − Date`` if an Expires timestamp is present (clamped ≥0);
    4. the §4.2.2 heuristic: 10% of (Date − Last-Modified), capped
       (``heuristic_cap_s``, default 24 h — the common implementation cap);
    5. no signal at all ⇒ 0 (stale on arrival).

    ``current_age_s = max(0, (now − Date)/1000) + Age`` (the simplified
    §4.2.3 age calculation for a single-hop cache). ``fresh`` iff
    ``current_age < lifetime``. Action: ``no_store`` ⇒ refetch; fresh ⇒
    ``use_cache``; stale with a validator ⇒ ``revalidate``; else
    ``refetch``.

    All integer millisecond/second math in JVM expressions (floor
    divisions exact below 2^53) — zero Python, zero shuffle: the plan is
    a pure projection, so it composes into any frontier scan for free.

    Input columns: ``url``, ``host``, ``date_ms``, ``max_age_s?``,
    ``expires_ms?``, ``last_modified_ms?``, ``age_s?``, ``no_store``
    (bool), ``no_cache`` (bool), ``has_validator`` (bool).
    """
    date = F.col("date_ms").cast("bigint")
    lm = F.col("last_modified_ms").cast("bigint")
    exp = F.col("expires_ms").cast("bigint")
    heuristic = F.least(
        F.floor((date - lm) / F.lit(1000 * int(heuristic_frac_denom))).cast("bigint"),
        F.lit(int(heuristic_cap_s)),
    )
    lifetime = (
        F.when(F.col("no_store") | F.col("no_cache"), F.lit(0))
        .when(F.col("max_age_s").isNotNull(), F.col("max_age_s").cast("bigint"))
        .when(exp.isNotNull(), F.greatest(F.floor((exp - date) / 1000).cast("bigint"), F.lit(0)))
        .when(lm.isNotNull(), F.greatest(heuristic, F.lit(0)))
        .otherwise(F.lit(0))
        .cast("bigint")
    )
    age = (
        F.greatest(F.floor((F.lit(int(now_ms)) - date) / 1000).cast("bigint"), F.lit(0))
        + F.coalesce(F.col("age_s").cast("bigint"), F.lit(0))
    ).cast("bigint")
    fresh = age < lifetime
    action = (
        F.when(F.col("no_store"), F.lit("refetch"))
        .when(fresh, F.lit("use_cache"))
        .when(F.col("has_validator"), F.lit("revalidate"))
        .otherwise(F.lit("refetch"))
    )
    return cached.select(
        "url",
        "host",
        lifetime.alias("freshness_lifetime_s"),
        age.alias("current_age_s"),
        fresh.alias("fresh"),
        action.alias("action"),
    )


def host_trend_slope(
    activity: DataFrame,
    host_col: str = "host",
    day_col: str = "day",
    count_col: str = "n",
) -> DataFrame:
    """Per-host activity trend via exact least squares over (day, count)
    points: slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) — the scheduling
    signal for rising vs decaying hosts (a rising host earns frontier
    budget before its backlog arrives; a decaying one yields it). Single-
    day hosts get slope 0 (no trend evidence).

    One hash-agg per host over integer sums (exact in doubles far beyond
    any realistic day range) — no window, no sort, partially aggregating.
    """
    x = F.col(day_col).cast("double")
    y = F.col(count_col).cast("double")
    agg = activity.groupBy(host_col).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * y).alias("_sxy"),
        F.sum(x * x).alias("_sxx"),
    )
    denom = F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    slope = F.when(
        denom > 0,
        (F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")) / denom,
    ).otherwise(F.lit(0.0))
    mean_y = F.col("_sy") / F.col("_n")
    return agg.select(
        host_col,
        F.col("_n").cast("bigint").alias("n_days"),
        F.round(mean_y, 6).alias("mean_daily"),
        F.round(slope, 6).alias("slope"),
        (slope > 0).alias("rising"),
    )


def staleness_expectation(
    rates: DataFrame,
    url_col: str = "url",
    lambda_col: str = "lambda_per_day",
    period_days_col: str = "period_days",
) -> DataFrame:
    """Expected index staleness under a periodic revisit policy — the
    closed form from Cho & Garcia-Molina (TODS 2003) for a page changing
    as a Poisson process with rate λ revisited every T:

        p_stale_at_revisit = 1 - e^(-λT)            (worst instant)
        expected_stale_frac = 1 - (1 - e^(-λT))/(λT) (time-averaged)

    The time-averaged form is the honest SLA number: a page probed just
    after changing is stale almost the whole cycle, one probed right
    before barely at all; the integral averages over the cycle. Planners
    pair this with ``refresh_allocation`` (r10): allocation picks T per
    page, this reports what that T buys.

    Input: (url, λ/day, T days). λ ≤ 0 or NULL → 0 staleness (no
    evidence of change ⇒ nothing to be stale against, matching
    ``change_rate_estimate``'s NULL-horizon convention). Output adds
    (lambda_t, p_stale_at_revisit, expected_stale_frac), rounded 6.
    Pure JVM projection — zero shuffle."""
    lam_t = F.col(lambda_col) * F.col(period_days_col)
    has = F.col(lambda_col).isNotNull() & (lam_t > 0)
    p_end = F.lit(1.0) - F.exp(-lam_t)
    frac = F.lit(1.0) - (F.lit(1.0) - F.exp(-lam_t)) / lam_t
    return rates.select(
        url_col,
        F.round(F.col(lambda_col), 6).alias(lambda_col),
        F.col(period_days_col).cast("double").alias(period_days_col),
        F.when(has, F.round(lam_t, 6)).otherwise(F.lit(0.0)).alias("lambda_t"),
        F.when(has, F.round(p_end, 6)).otherwise(F.lit(0.0)).alias(
            "p_stale_at_revisit"
        ),
        F.when(has, F.round(frac, 6)).otherwise(F.lit(0.0)).alias(
            "expected_stale_frac"
        ),
    )


def change_periodicity(
    visits: DataFrame,
    url_col: str = "url",
    ts_us_col: str = "ts_us",
    changed_col: str = "changed",
    min_visits: int = 14,
    concentration_threshold: float = 2.0,
) -> DataFrame:
    """Weekly periodicity of observed changes — pages that update on a
    schedule (news digests, weekly releases) should be revisited AT that
    phase, not at the Poisson-average rate: per URL, the weekday change
    ratios and their concentration against the overall ratio.

    weekday = (epoch_day + 3) % 7 (0 = Monday). Output per URL:
    (n_visits, overall_ratio, peak_weekday, peak_ratio, concentration =
    peak/overall, is_periodic = enough visits AND concentration ≥
    threshold). Ties on peak ratio break to the smallest weekday —
    deterministic. URLs with no observed change report 0 ratios and
    never flag.

    Shape: one (url, weekday) hash-agg; the per-URL totals REUSE that
    grain (a second fold, not a second scan); the peak pick is a
    url-keyed window over the 7-row-per-url table. All ratios divide
    exact integers, rounded 6."""
    wd = ((F.floor(F.col(ts_us_col) / F.lit(86_400_000_000)) + 3) % 7).cast("int")
    g = (
        visits.select(
            F.col(url_col).alias("url"),
            wd.alias("weekday"),
            F.when(F.col(changed_col), 1).otherwise(0).alias("ch"),
        )
        .groupBy("url", "weekday")
        .agg(F.count(F.lit(1)).alias("nv"), F.sum("ch").alias("nc"))
    )
    tot = g.groupBy("url").agg(
        F.sum("nv").cast("bigint").alias("n_visits"),
        F.sum("nc").cast("bigint").alias("n_changed"),
    )
    ratio = F.col("nc").cast("double") / F.col("nv").cast("double")
    from pyspark.sql import Window

    w = Window.partitionBy("url").orderBy(
        ratio.desc(), F.asc("weekday")
    )
    peak = (
        g.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "url",
            F.col("weekday").alias("peak_weekday"),
            F.round(ratio, 6).alias("peak_ratio"),
        )
    )
    overall = F.col("n_changed").cast("double") / F.col("n_visits").cast("double")
    j = tot.join(peak, "url")
    conc = F.when(
        F.col("n_changed") > 0, F.round(F.col("peak_ratio") / F.round(overall, 6), 6)
    ).otherwise(F.lit(0.0))
    return j.select(
        "url",
        "n_visits",
        F.round(overall, 6).alias("overall_ratio"),
        F.col("peak_weekday").cast("bigint").alias("peak_weekday"),
        F.when(F.col("n_changed") > 0, F.col("peak_ratio")).otherwise(0.0).alias(
            "peak_ratio"
        ),
        conc.alias("concentration"),
        (
            (F.col("n_visits") >= min_visits)
            & (F.col("n_changed") > 0)
            & (conc >= F.lit(float(concentration_threshold)))
        ).alias("is_periodic"),
    )


def sitemap_coverage(
    sitemap: DataFrame,
    crawled: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Sitemap-vs-crawl coverage audit (the gap report search-console
    tools surface): per URL, one of

    - ``both``          — declared and crawled (healthy);
    - ``sitemap_only``  — declared, never crawled (discovery gap: the
      frontier is missing declared inventory);
    - ``crawled_only``  — crawled but not declared (orphan inventory or
      a stale sitemap — both worth surfacing to the site owner and the
      scheduler).

    One full-outer url hash-join; per-host rollup is a follow-on
    ``groupBy(host)`` the caller composes. Returns (url, in_sitemap,
    in_crawl, status)."""
    sm = sitemap.select(F.col(url_col).alias("url")).distinct().withColumn(
        "_sm", F.lit(True)
    )
    cr = crawled.select(F.col(url_col).alias("url")).distinct().withColumn(
        "_cr", F.lit(True)
    )
    j = sm.join(cr, "url", "full_outer")
    in_sm = F.coalesce(F.col("_sm"), F.lit(False))
    in_cr = F.coalesce(F.col("_cr"), F.lit(False))
    return j.select(
        "url",
        in_sm.alias("in_sitemap"),
        in_cr.alias("in_crawl"),
        F.when(in_sm & in_cr, F.lit("both"))
        .when(in_sm, F.lit("sitemap_only"))
        .otherwise(F.lit("crawled_only"))
        .alias("status"),
    )


def host_crawl_summary(
    fetches: DataFrame,
    host_col: str = "host",
    status_col: str = "status",
    latency_ms_col: str = "latency_ms",
    changed_col: str = "changed",
) -> DataFrame:
    """Per-host crawl-health dashboard row — the one-glance integration
    of the signals the p/r families compute separately (error burn,
    latency-adaptive delay, change-rate planning): per host from a
    fetch log (host, status, latency_ms, changed):

    (n_fetches, n_ok, n_err, err_rate, mean_latency_ms, p95_latency_ms,
    change_rate, health) — ``health`` the conservative traffic-light:
    'red' at err_rate ≥ 0.5, 'yellow' at ≥ 0.2 or p95 ≥ 5000 ms, else
    'green'.

    One host hash-agg; p95 is the exact type-1 quantile over each
    host's latency array (in-cell sort — per-host fetch logs for one
    round are window-sized; the corpus-scale exact path is
    ``operators/quantiles.py``). Exact integer ratios rounded 6."""
    ok = F.col(status_col).between(200, 299)
    agg = fetches.groupBy(F.col(host_col).alias("host")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_fetches"),
        F.sum(ok.cast("int")).cast("bigint").alias("n_ok"),
        F.sum((~ok).cast("int")).cast("bigint").alias("n_err"),
        F.sum(F.col(changed_col).cast("int")).cast("bigint").alias("n_changed"),
        F.sum(F.col(latency_ms_col).cast("decimal(28,0)")).alias("lat_sum"),
        F.sort_array(F.collect_list(F.col(latency_ms_col).cast("bigint"))).alias(
            "lats"
        ),
    )
    n = F.col("n_fetches")
    err = F.round(F.col("n_err").cast("double") / n.cast("double"), 6)
    # exact type-1 p95: element at ceil(0.95 n) in the sorted array
    p95 = F.element_at(
        F.col("lats"), F.ceil(n.cast("double") * F.lit(0.95)).cast("int")
    )
    health = (
        F.when(err >= 0.5, F.lit("red"))
        .when((err >= 0.2) | (p95 >= 5000), F.lit("yellow"))
        .otherwise(F.lit("green"))
    )
    return agg.select(
        "host",
        "n_fetches",
        "n_ok",
        "n_err",
        err.alias("err_rate"),
        F.round(F.col("lat_sum").cast("double") / n.cast("double"), 6).alias(
            "mean_latency_ms"
        ),
        p95.cast("bigint").alias("p95_latency_ms"),
        F.round(F.col("n_changed").cast("double") / n.cast("double"), 6).alias(
            "change_rate"
        ),
        health.alias("health"),
    )
