"""Event-log operators: inactivity-gap sessionization and a scalable
as-of (point-in-time) join.

A crawl/analytics engine at 100 TB spends much of its life on event logs —
fetch outcomes, scheduler decisions, user interactions. Two operators the
DataFrame API lacks as primitives, built here with the engine's plan rules
(every window keyed, one shuffle per operator, no per-row Python):

- **Sessionization**: group a keyed, timestamped event stream into sessions
  separated by an inactivity gap. Classic formulation: a break flag from
  ``lag(ts)``, then a running sum of breaks as the session number — two
  window passes over the SAME (key, order) window, so Spark plans one
  shuffle + one sort and pipelines both windows in a single stage.

- **As-of join**: for each left row, the single most recent right row of
  the same key with ``right.ts <= left.ts``. Spark has no ASOF JOIN; the
  naive range-join explodes. The scalable shape is union-and-carry: tag
  both sides, union, sort per key by (ts, side) with the right side first
  at equal ts (inclusive semantics), and carry the last non-null right
  payload forward with ``last(..., ignorenulls=True)`` over an unbounded-
  preceding window — one shuffle on the key, linear work, identical to
  what a sort-merge ASOF would do. Right-side ties on (key, ts) are
  collapsed to the max payload row first so the result is deterministic
  (DuckDB's ASOF JOIN leaves that tiebreak unspecified).

The reference engine has no event-log analytics (its closest notion is the
per-stage processing timestamps, e.g. ElasticStoreQueries.scala upsert
metadata); these extend §2.6's window/sort family the way a production
pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    value_col: str | None = "value",
) -> DataFrame:
    """Inactivity-gap sessionization: a new session starts when the time
    since the key's previous event exceeds ``gap_seconds`` (strictly).
    Returns one row per session: key, session_no (1-based per key),
    session_start/end, n_events, and total_value when ``value_col`` given.

    Plan shape: both windows share (key, order), so a single exchange +
    sort serves the lag, the running sum, and the final groupBy partial-
    aggregates map-side on (key, session_no) — the session grain is a
    refinement of the window partitioning, no second shuffle."""
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(order_tiebreak))
    # NTZ timestamps don't cast to double in Spark 4; micros via an LTZ hop
    # (same conversion on both operands, so the gap is timezone-invariant)
    micros = F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))
    gap = micros - F.lag(micros).over(w)
    brk = F.when(gap.isNull() | (gap > gap_seconds * 1_000_000), 1).otherwise(0)
    cum = Window.partitionBy(key_col).orderBy(
        F.col(ts_col), F.col(order_tiebreak)
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = events.withColumn("session_no", F.sum(brk).over(cum))
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("total_value"))
    return sessions.groupBy(key_col, "session_no").agg(*aggs)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    right_payload: list[str],
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: attach to every left row the payload of the most
    recent right row with the same key and ``right.ts <= left.ts`` (NULLs
    when none precedes). Right-side (key, ts) ties collapse to the row with
    the greatest payload tuple, making the result deterministic.

    Union-and-carry: one shuffle on the key, one sort by (ts, side) with
    right-before-left at equal ts (inclusive), then ``last(payload,
    ignorenulls=True)`` carries each right payload forward — linear, no
    range join, no broadcast of either side."""
    r = (
        right.groupBy(key_col, ts_col)
        .agg(F.max(F.struct(*right_payload)).alias("__p"))
        .select(
            key_col,
            F.col(ts_col).alias("__rts"),
            F.lit(0).alias("__side"),
            "__p",
            *[F.lit(None).cast(t.dataType).alias(c)
              for c, t in zip(left.columns, left.schema)
              if c not in (key_col,)],
        )
    )
    l = left.select(
        key_col,
        F.col(ts_col).alias("__rts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
        *[c for c in left.columns if c != key_col],
    )
    unioned = r.unionByName(l)
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col("__rts"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__carry", F.last("__p", ignorenulls=True).over(w))
    out = carried.filter(F.col("__side") == 1).drop("__rts", "__side", "__p")
    for c in right_payload:
        out = out.withColumn(c + suffix, F.col("__carry").getField(c))
    return out.drop("__carry")


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    window_s: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel analysis: for each user, the earliest completion of
    ``steps`` in strict order — step k must be the FIRST matching event
    strictly after the chosen step k−1, and every step must fall within
    ``window_s`` seconds of step 1. The greedy earliest-step choice is
    the standard funnel semantics (and is optimal for fixed step 1: an
    earlier intermediate event never shrinks what remains reachable).

    Output: one row per user seen in ``events`` — ``step_reached``
    (0..len(steps)) and ``step{k}_us`` epoch-microsecond timestamps
    (null once the funnel broke). Microsecond integers keep the result
    engine-exact.

    Scale shape: one filtered min-agg per step (each over only that
    step's event type — the filter prunes the shuffle to the funnel
    events) joined back on the user key; all joins share the user-hash
    partitioning, so at N steps the cost is N small keyed aggs, not a
    per-user sort. Ties inside one microsecond collapse to the same min
    — deterministic either way.
    """
    if len(steps) < 2:
        raise ValueError("funnel_steps() needs >= 2 steps")
    us = F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))
    base = events.select(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("_type"),
        us.alias("_us"),
    )
    users = base.select("user_id").distinct()
    horizon = int(window_s) * 1_000_000

    t1 = (
        base.filter(F.col("_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("_us").alias("step1_us"))
    )
    out = users.join(t1, "user_id", "left")
    prev = "step1_us"
    for k, step in enumerate(steps[1:], start=2):
        col = f"step{k}_us"
        cand = base.filter(F.col("_type") == step).select(
            "user_id", F.col("_us").alias("_cand")
        )
        tk = (
            out.select("user_id", "step1_us", F.col(prev).alias("_prev"))
            .filter(F.col("_prev").isNotNull())
            .join(cand, "user_id")
            .filter(
                (F.col("_cand") > F.col("_prev"))
                & (F.col("_cand") <= F.col("step1_us") + F.lit(horizon))
            )
            .groupBy("user_id")
            .agg(F.min("_cand").alias(col))
        )
        out = out.join(tk, "user_id", "left")
        prev = col
    # ascending wrap ⇒ the OUTERMOST test is the highest step, so the
    # deepest non-null step wins
    reached = F.lit(0)
    for k in range(1, len(steps) + 1):
        reached = F.when(F.col(f"step{k}_us").isNotNull(), F.lit(k)).otherwise(
            reached
        )
    cols = ["user_id"] + [f"step{k}_us" for k in range(1, len(steps) + 1)]
    return out.select(*cols, reached.cast("int").alias("step_reached"))


def gapfill_daily(
    series: DataFrame,
    key_col: str = "key",
    day_col: str = "day",
    value_col: str = "n",
) -> DataFrame:
    """Dense daily series per key: fill missing days between each key's
    first and last observed day with zero rows (monitoring dashboards and
    trend fits need the zeros — a host that went silent must read as 0,
    not as an absent row). In-cell ``sequence`` explode of each key's own
    [min_day, max_day] range joined back to the sparse observations — the
    fill cost is each key's SPAN, never the global calendar cross join.
    """
    spans = series.groupBy(key_col).agg(
        F.min(day_col).alias("_d0"), F.max(day_col).alias("_d1")
    )
    dense = spans.select(
        key_col,
        F.explode(F.sequence(F.col("_d0"), F.col("_d1"))).alias(day_col),
    )
    return (
        dense.join(series, [key_col, day_col], "left")
        .select(
            key_col,
            F.col(day_col).cast("bigint").alias(day_col),
            F.coalesce(F.col(value_col), F.lit(0)).cast("bigint").alias(value_col),
        )
    )


def daily_anomaly_zscore(
    series: DataFrame,
    window_days: int = 7,
    min_history: int = 5,
    z_threshold: float = 3.0,
    key_col: str = "key",
    day_col: str = "day",
    value_col: str = "n",
) -> DataFrame:
    """Per-key daily anomaly flags: z-score of today's value against the
    trailing ``window_days`` of the key's OWN history (current day
    excluded — self-inclusion shrinks every spike's z). Run it over
    ``gapfill_daily`` output so silent days are zeros, not gaps — a host
    that stops responding is exactly the anomaly this catches, next to
    fetch-volume spikes (crawler traps, mirror storms).

    z = (x − μ_prev)/σ_prev (population σ over the trailing frame);
    degenerate σ=0 history flags any deviation from the constant; fewer
    than ``min_history`` prior days never flags. One (key, day) window
    frame — same single exchange as the trend/gapfill family.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(day_col))
        .rowsBetween(-int(window_days), -1)
    )
    x = F.col(value_col).cast("double")
    hist_n = F.count(x).over(w)
    mean = F.avg(x).over(w)
    var = F.avg(x * x).over(w) - mean * mean
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    z = F.when(std > 0, (x - mean) / std)
    enough = hist_n >= F.lit(int(min_history))
    anomaly = enough & (
        F.when(std > 0, F.abs(z) > F.lit(float(z_threshold))).otherwise(x != mean)
    )
    return series.select(
        key_col,
        F.col(day_col).cast("bigint").alias(day_col),
        F.col(value_col).cast("bigint").alias(value_col),
        F.round(mean, 6).alias("hist_mean"),
        F.round(std, 6).alias("hist_std"),
        F.round(z, 6).alias("zscore"),
        anomaly.alias("anomaly"),
    )


def sliding_distinct_daily(
    df: DataFrame,
    key_col: str = "user_id",
    day_col: str = "day",
    window_days: int = 7,
) -> DataFrame:
    """Exact trailing-window distinct actives per day (the 7-day-active /
    WAU curve): for every day in the data's span, the count of distinct
    ``key_col`` seen in ``[day - window_days + 1, day]``, next to the
    plain per-day distinct count. Exact, not a sketch — rolling
    count-distinct does NOT decompose over a window function, so the
    engine materializes coverage instead of sorting per day.

    Shape: dedup to (key, day) active pairs (one hash-agg), explode each
    pair to the ``window_days`` window-end days it feeds (in-cell
    sequence, ×w fan-out of the ALREADY-deduped pair table — bounded by
    actives × w, not events × w), then one (day, key) dedup + one day
    hash-agg. For month+ windows over billions of actives, swap in the
    HLL segments (``operators/hll.py``) — this exact form is the oracle
    for that sketch path.

    Output: (day, n_active, n_active_window), restricted to days inside
    the observed [min_day, max_day] span.
    """
    if window_days < 1:
        raise ValueError("sliding_distinct_daily() needs window_days >= 1")
    pairs = (
        df.select(F.col(key_col).alias("key"), F.col(day_col).cast("bigint").alias("day"))
        .filter(F.col("key").isNotNull())
        .distinct()
    )
    daily = pairs.groupBy("day").agg(F.count(F.lit(1)).alias("n_active"))
    span = pairs.select(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    covered = (
        pairs.select(
            "key",
            F.explode(
                F.sequence(F.col("day"), F.col("day") + F.lit(window_days - 1))
            ).alias("day"),
        )
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_active_window"))
    )
    return (
        covered.join(F.broadcast(span), covered["day"].between(F.col("d0"), F.col("d1")))
        .join(daily, "day", "left")
        .select(
            "day",
            F.coalesce("n_active", F.lit(0)).cast("bigint").alias("n_active"),
            F.col("n_active_window").cast("bigint").alias("n_active_window"),
        )
    )


def interarrival_bot_signals(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    min_gaps: int = 5,
    cv_threshold: float = 0.1,
) -> DataFrame:
    """Bot/automation detection from inter-arrival regularity (the classic
    traffic-analytics heuristic: humans are bursty, schedulers are
    metronomes): per key, the coefficient of variation of inter-event
    gaps — ``is_bot`` when at least ``min_gaps`` gaps exist and their
    CV is below ``cv_threshold``.

    Exactness: gaps are integer microseconds; Σgap and Σgap² accumulate
    as ``decimal(38,0)`` (gap² overflows bigint at day-scale gaps), so
    mean/variance are pure functions of the event set, engine- and
    partition-exact; only the final division runs in double (rounded 6).

    Shape: one (key)-keyed window sort for the lag + one key hash-agg —
    the same (key, ts) sort grain ``sessionize`` uses, so a pipeline
    computing both shares one shuffle. Returns (key, n_events, n_gaps,
    mean_gap_s, cv_gap, is_bot); keys with < ``min_gaps`` gaps report
    NULL cv and never flag.
    """
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(order_col))
    us = F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))
    gaps = df.select(
        F.col(key_col).alias("key"),
        (us - F.lag(us).over(w)).alias("gap"),
    )
    agg = gaps.groupBy("key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.count("gap").cast("bigint").alias("n_gaps"),
        F.sum(F.col("gap").cast("decimal(38,0)")).alias("sg"),
        F.sum(
            F.col("gap").cast("decimal(19,0)") * F.col("gap").cast("decimal(19,0)")
        ).alias("sgg"),
    )
    n = F.col("n_gaps").cast("double")
    mean = F.col("sg").cast("double") / n
    var = F.greatest(
        F.col("sgg").cast("double") / n - mean * mean, F.lit(0.0)
    )
    cv = F.sqrt(var) / mean
    enough = F.col("n_gaps") >= min_gaps
    return agg.select(
        F.col("key").alias(key_col),
        "n_events",
        "n_gaps",
        # mean gap is (integer µs sum)/n — the fraction is often EXACTLY
        # .5, where Spark rounds half-up and other engines half-even.
        # floor(x+0.5) is explicit half-up in every engine: round to whole
        # microseconds, then the /1e6 is the same double op everywhere.
        F.when(
            F.col("n_gaps") > 0, F.floor(mean + F.lit(0.5)) / F.lit(1e6)
        ).alias("mean_gap_s"),
        F.when(enough & (mean > 0), F.round(cv, 6)).alias("cv_gap"),
        (
            enough
            & (mean > 0)
            & (F.round(cv, 6) < F.lit(float(cv_threshold)))
        ).alias("is_bot"),
    )


def top_event_paths(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
    path_len: int = 5,
    top_k: int = 20,
) -> DataFrame:
    """Top-k navigation paths: each key's first ``path_len`` event types
    (in (ts, order) sequence) join into a path string; paths rank by
    frequency — the sequence-mining lite that finds dominant crawl/user
    journeys without an FSM pass.

    Shape: one key-keyed window to pick the first ``path_len`` events
    (rank filter BEFORE any path assembly, so long histories never
    concatenate), one key hash-agg folding the types in rank order via
    array_sort on (rn, type) structs — no second sort — then a path
    hash-agg and a rank over the path table (bounded by distinct paths,
    capped at type_alphabet^path_len, metadata-sized for real alphabets).
    Ties break lexicographically on path — deterministic. Returns
    (rank, path, n_keys, share) with share = n_keys / total keys,
    rounded 6."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(order_col))
    first = (
        df.select(
            F.col(key_col).alias("key"),
            F.col(type_col).alias("t"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= path_len)
    )
    paths = (
        first.groupBy("key")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("rn"), F.col("t")))
                    ),
                    lambda s: s["t"],
                ),
                ">",
            ).alias("path")
        )
    )
    counts = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_keys"))
    total = paths.count()
    wr = Window.orderBy(F.desc("n_keys"), F.asc("path"))
    return (
        counts.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= top_k)
        .select(
            F.col("rank").cast("bigint").alias("rank"),
            "path",
            F.col("n_keys").cast("bigint").alias("n_keys"),
            F.round(
                F.col("n_keys").cast("double") / F.lit(float(total)), 6
            ).alias("share"),
        )
    )


def rfm_segments(
    df: DataFrame,
    now_us: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    n_tiles: int = 5,
) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary quintiles — the
    classic engagement grid, applied to hosts as naturally as users: R =
    how recently a host yielded new content, F = how often, M = how much
    value): each metric ranks into ``n_tiles`` NTILE buckets with a
    deterministic total order (metric, then key — NTILE without a total
    order is partition-dependent, the same trap as bare limit()), and
    the segment code concatenates the three digits (R highest = most
    recent = tile n).

    One key hash-agg (exact integer/decimal sums) + three key-table
    NTILE windows (metadata-sized, the key_skew_gini discipline).
    Returns (key, recency_days, frequency, monetary, r, f, m, segment).
    """
    if n_tiles < 2:
        raise ValueError("rfm_segments() needs n_tiles >= 2")
    us = F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))
    agg = df.groupBy(F.col(key_col).alias("key")).agg(
        F.max(us).alias("last_us"),
        F.count(F.lit(1)).cast("bigint").alias("frequency"),
        F.round(F.sum(F.col(value_col)), 6).alias("monetary"),
    )
    rec_days = F.round(
        (F.lit(int(now_us)) - F.col("last_us")) / F.lit(86_400_000_000.0), 6
    )
    base = agg.select(
        "key",
        rec_days.alias("recency_days"),
        "frequency",
        "monetary",
    )
    from pyspark.sql import Window

    # R: smaller recency (more recent) = higher tile -> order DESC so
    # ntile 1 is the stalest, n the freshest... invert by ordering desc
    wr = Window.orderBy(F.desc("recency_days"), F.asc("key"))
    wf = Window.orderBy(F.asc("frequency"), F.asc("key"))
    wm = Window.orderBy(F.asc("monetary"), F.asc("key"))
    out = base.select(
        "key",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(n_tiles).over(wr).alias("r"),
        F.ntile(n_tiles).over(wf).alias("f"),
        F.ntile(n_tiles).over(wm).alias("m"),
    )
    return out.select(
        F.col("key").alias(key_col),
        "recency_days",
        "frequency",
        "monetary",
        F.col("r").cast("bigint").alias("r"),
        F.col("f").cast("bigint").alias("f"),
        F.col("m").cast("bigint").alias("m"),
        F.concat(F.col("r"), F.col("f"), F.col("m")).alias("segment"),
    )


def holt_forecast(
    series: DataFrame,
    key_col: str = "key",
    day_col: str = "day",
    value_col: str = "n",
    alpha: float = 0.5,
    beta: float = 0.3,
) -> DataFrame:
    """Holt linear exponential smoothing per key (Holt 1957) — the
    capacity forecast a crawl scheduler runs over per-host daily volume
    (gapfilled first, so silence reads as 0 — compose with
    ``gapfill_daily``): level/trend fold over the day-ordered series,
    one-day and seven-day-ahead projections.

    The recurrence is inherently sequential, so it runs as ONE in-cell
    fold over the collected per-key series (array_sort on (day, value)
    structs → exact day order; series length = the key's own span —
    window-sized). The fold's float ops execute in identical order in
    any engine's left-fold (the SQL oracle uses list_reduce with the
    SAME expression shape), so results are bit-comparable at 6 dp.

    Keys with < 2 observed days carry no trend evidence → NULL outputs.
    Returns (key, n_days, level, trend, forecast_1d, forecast_7d)."""
    if not (0 < alpha <= 1 and 0 <= beta <= 1):
        raise ValueError("holt_forecast() needs 0<alpha<=1, 0<=beta<=1")
    a, b = float(alpha), float(beta)
    g = series.groupBy(F.col(key_col).alias("key")).agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col(day_col).alias("d"), F.col(value_col).cast("double").alias("x"))
            )
        ).alias("sv")
    )
    vals = F.transform(F.col("sv"), lambda s: s["x"])
    n = F.size(vals)
    x1 = F.element_at(vals, 1)
    x2 = F.element_at(vals, 2)
    init = F.struct(x2.alias("l"), (x2 - x1).alias("b"))

    def step(acc, x):
        new_l = F.lit(a) * x + F.lit(1.0 - a) * (acc["l"] + acc["b"])
        new_b = (
            F.lit(b) * ((F.lit(a) * x + F.lit(1.0 - a) * (acc["l"] + acc["b"])) - acc["l"])
            + F.lit(1.0 - b) * acc["b"]
        )
        return F.struct(new_l.alias("l"), new_b.alias("b"))

    folded = F.aggregate(
        F.slice(vals, 3, F.greatest(n - 2, F.lit(0))), init, step
    )
    has = n >= 2
    lvl = F.when(has, F.round(folded["l"], 6))
    trd = F.when(has, F.round(folded["b"], 6))
    f1 = F.when(has, F.round(folded["l"] + folded["b"], 6))
    f7 = F.when(has, F.round(folded["l"] + F.lit(7.0) * folded["b"], 6))
    return g.select(
        F.col("key").alias(key_col),
        n.cast("bigint").alias("n_days"),
        lvl.alias("level"),
        trd.alias("trend"),
        f1.alias("forecast_1d"),
        f7.alias("forecast_7d"),
    )


def new_vs_returning_daily(
    df: DataFrame, key_col: str = "user_id", day_col: str = "day"
) -> DataFrame:
    """Daily actives split into NEW (first-ever day) vs RETURNING — the
    growth-accounting curve (applied to hosts: newly discovered vs
    revisited domains per round; the companion to the Heaps curve which
    counts content novelty rather than actor novelty).

    First sighting = min(day) per key (the F1 first-occurrence
    convention); one key hash-agg + one (key, day) dedup sharing the
    same grain + a day hash-agg. Returns (day, n_active, n_new,
    n_returning, new_share) with exact integer counts, share rounded 6.
    """
    pairs = (
        df.select(
            F.col(key_col).alias("key"), F.col(day_col).cast("bigint").alias("day")
        )
        .filter(F.col("key").isNotNull())
        .distinct()
    )
    first = pairs.groupBy("key").agg(F.min("day").alias("first_day"))
    j = pairs.join(first, "key")
    agg = j.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_active"),
        F.sum((F.col("day") == F.col("first_day")).cast("int"))
        .cast("bigint")
        .alias("n_new"),
    )
    return agg.select(
        "day",
        "n_active",
        "n_new",
        (F.col("n_active") - F.col("n_new")).cast("bigint").alias("n_returning"),
        F.round(
            F.col("n_new").cast("double") / F.col("n_active").cast("double"), 6
        ).alias("new_share"),
    )
