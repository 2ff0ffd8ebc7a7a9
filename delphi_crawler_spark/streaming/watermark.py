"""Watermark lateness audit — the batch planner that sizes a Structured
Streaming watermark BEFORE the stream runs.

``withWatermark(delay)`` trades state size against data loss: rows whose
event time falls behind the running max event time by more than ``delay``
are dropped once their window closes. The right delay is an empirical
property of the feed's out-of-orderness, so this operator replays a
(event_time, arrival_time) log and reports, per tumbling window, how many
rows a given watermark WOULD have dropped — the exact curve an operator
sweeps before committing a delay to ``frontier_stream``'s windowed aggs.

Watermark model (deterministic, engine-exact): processing order is the
total order (arrival_ts, id); the watermark in force when a row is
processed is ``max(event_ts of all strictly earlier rows) - delay`` — the
Spark model with per-row (i.e. most conservative) watermark advancement.
A row is DROPPED iff its tumbling window has already closed:
``watermark > window_end(event_ts)``.

Scale shape — the running max is a prefix computation, NOT a global
data-sized window: arrivals bucket by hour, the per-bucket max event time
is one hash-agg (bucket table is metadata-sized), the cross-bucket prefix
max is a window over THAT table, and the intra-bucket running max is a
bucket-keyed window — the same two-phase no-global-sort pattern as
``operators/quantiles.py``. All JVM, zero Python.

Reference parity: the reference engine is batch-only (Akka streams with
in-flight buffering, no event-time semantics); this belongs to the §2.8
streaming extension family alongside the tumbling/sliding/session windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_US = 1_000_000


def watermark_lateness_audit(
    df: DataFrame,
    event_ts_col: str = "event_ts",
    arrival_ts_col: str = "arrival_ts",
    id_col: str = "event_id",
    watermark_s: int = 60,
    window_s: int = 300,
    bucket_s: int = 3600,
) -> DataFrame:
    """Per-tumbling-window lateness report under a candidate watermark.

    Returns (window_start, n_events, n_out_of_order, n_dropped,
    drop_ratio): ``n_out_of_order`` counts rows arriving after some
    later-event-time row (watermark basis exceeds their event time),
    ``n_dropped`` counts rows the watermark would discard (window already
    closed at processing time). ``drop_ratio`` rounded 6. The first row
    of the whole replay has no watermark basis and can never drop.
    """
    if watermark_s < 0 or window_s <= 0 or bucket_s <= 0:
        raise ValueError("watermark_lateness_audit(): bad durations")
    ev = F.unix_micros(F.col(event_ts_col).cast("timestamp_ltz"))
    ar = F.unix_micros(F.col(arrival_ts_col).cast("timestamp_ltz"))
    base = df.select(
        F.col(id_col).alias("id"),
        ev.alias("ev_us"),
        ar.alias("ar_us"),
        F.floor(ar / F.lit(bucket_s * _US)).cast("bigint").alias("b"),
    )
    # phase 1: per-bucket max event time (bucket table is metadata-sized)
    bmax = base.groupBy("b").agg(F.max("ev_us").alias("bmax"))
    wb = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    prior = bmax.select(
        "b", F.max("bmax").over(wb).alias("prior_max")
    )
    # phase 2: intra-bucket running max over strictly earlier arrivals
    wi = Window.partitionBy("b").orderBy(
        F.asc("ar_us"), F.asc("id")
    ).rowsBetween(Window.unboundedPreceding, -1)
    scored = (
        base.join(F.broadcast(prior), "b")
        .withColumn("intra_max", F.max("ev_us").over(wi))
        # greatest() skips nulls in both engines (checked): null only when
        # BOTH sides are null, i.e. the very first processed row
        .withColumn("basis", F.greatest("prior_max", "intra_max"))
    )
    basis = F.col("basis")
    wm = basis - F.lit(watermark_s * _US)
    win_start = (
        F.floor(F.col("ev_us") / F.lit(window_s * _US)).cast("bigint")
        * F.lit(window_s)
    )
    win_end_us = (win_start + F.lit(window_s)) * F.lit(_US)
    out_of_order = basis.isNotNull() & (basis > F.col("ev_us"))
    dropped = basis.isNotNull() & (wm > win_end_us)
    agg = (
        scored.select(
            win_start.alias("window_start"),
            out_of_order.cast("int").alias("ooo"),
            dropped.cast("int").alias("drp"),
        )
        .groupBy("window_start")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("ooo").cast("bigint").alias("n_out_of_order"),
            F.sum("drp").cast("bigint").alias("n_dropped"),
        )
    )
    return agg.select(
        "window_start",
        "n_events",
        "n_out_of_order",
        "n_dropped",
        F.round(
            F.col("n_dropped").cast("double") / F.col("n_events").cast("double"), 6
        ).alias("drop_ratio"),
    )
