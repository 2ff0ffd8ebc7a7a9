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
