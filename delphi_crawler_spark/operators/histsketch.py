"""Mergeable quantile-histogram sketch (significant-digit HDR telemetry).

The exact-quantile operators (``quantiles.py``) re-read every row each
time they run — the right tool for a one-shot exact answer, but a crawl
engine dashboards fetch-latency / response-size percentiles EVERY round
over an ever-growing history. This module gives the telemetry family the
same incremental architecture as the bloom / HLL / inverted-index
segments: each round contributes a tiny mergeable *segment* (bucket →
count), merging segments is one bucket-grain hash-agg whose cost is
O(buckets) not O(rows), and quantiles are read off any merged segment
with a narrow cumulative window.

Bucketing is a decimal HDR grid: a non-negative integer value is
truncated to its first ``digits`` significant decimal digits (the rest
zeroed) — pure integer/string arithmetic, so Spark and an independent
SQL oracle agree bit-for-bit (no float ``log`` boundary hazard). With
``digits=3`` a decade holds ≤900 buckets and the whole int64 range ≤
~17k, so a segment is a few KB however many rows fed it.

Accuracy is not approximate-in-distribution but *exactly characterized*:
truncation is a monotone non-decreasing map, and monotone maps commute
with order statistics — so for every q the sketch quantile EQUALS the
truncation of the exact ``percentile_disc(q)`` (same rank convention as
``quantiles.py``: rank ``max(1, ceil(q*n))``). Relative error is bounded
by the grid (< 10^(1-digits)) and the oracle can assert equality, not
closeness.

Reference parity: extends the A5/metrics family (the reference logs
counts ad hoc; SURVEY §2.5 A5) with the round-over-round percentile
telemetry a 10^10-URL crawl actually needs. 100-TB shape: one partial-
aggregating hash-agg per round at (group, bucket) grain; merges touch
segments only; nothing ever sorts or re-reads history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# int64 max has 19 digits — a value's decimal length never exceeds this
_MAX_DIGITS = 19


def sig_trunc(col: F.Column, digits: int = 3) -> F.Column:
    """Truncate a non-negative integral column to its first ``digits``
    significant decimal digits (zeroing the rest) — the sketch's bucket
    representative. Values with ≤ ``digits`` digits are unchanged; 0 maps
    to 0. Pure integer arithmetic (power-of-ten divide + multiply), exact
    for the full bigint range."""
    v = col.cast("bigint")
    ndig = F.length(v.cast("string"))
    # 10^(ndig - digits) as bigint: exponent ≤ 16, and every power of ten up
    # to 10^22 is exactly representable in double, so the cast is exact.
    exp = (ndig - F.lit(digits)).cast("int")
    pow10 = F.pow(F.lit(10.0), exp.cast("double")).cast("bigint")
    # v - (v % pow10): pure bigint arithmetic — `/` would round through
    # double and mis-bucket values beyond 2^53
    return F.when(ndig <= digits, v).otherwise(v - (v % pow10))


def hist_segments(
    df: DataFrame,
    value_col: str,
    by: str | None = None,
    digits: int = 3,
) -> DataFrame:
    """One round's sketch segment: ``(group?, bucket, cnt)`` — a single
    partial-aggregating hash-agg at bucket grain. Null and negative values
    are dropped (telemetry domains are non-negative: latencies, sizes,
    counts). Segments from different rounds merge with
    ``merge_segments``."""
    v = F.col(value_col).cast("bigint")
    keyed = df.where(v.isNotNull() & (v >= 0)).select(
        *([F.col(by).alias("grp")] if by else []),
        sig_trunc(v, digits).alias("bucket"),
    )
    keys = (["grp"] if by else []) + ["bucket"]
    return keyed.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))


def merge_segments(*segments: DataFrame) -> DataFrame:
    """Merge round segments: union + one bucket-grain hash-agg. Cost is
    O(total buckets), independent of the row counts that built them —
    associative and commutative, so compaction can binpack segments the
    same way the bloom/HLL/inverted-index families do."""
    out = segments[0]
    for s in segments[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c != "cnt"]
    return out.groupBy(*keys).agg(F.sum("cnt").alias("cnt"))


def hist_quantiles(
    segment: DataFrame,
    qs: list[float],
    by: str | None = None,
) -> DataFrame:
    """Read quantiles off a (merged) segment: ``(group?, q, value, n)``.

    ``value`` is the bucket representative owning rank ``max(1,
    ceil(q*n))`` in bucket order — by monotone-map commutation this IS
    ``sig_trunc(percentile_disc(q))`` of the original data. The window
    runs over BUCKET grain (≤ ~17k rows per group), so the plan stays
    narrow however many rows the segments summarize; with ``by`` the
    window hash-partitions per group (the many-small-groups shape of
    ``exact_quantiles_keyed``)."""
    from pyspark.sql import Window

    gcols = ["grp"] if by else []
    w = (
        Window.partitionBy(*gcols).orderBy("bucket")
        if by
        else Window.orderBy("bucket")
    )
    cum = segment.select(
        *gcols,
        "bucket",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(
            Window.partitionBy(*gcols) if by else Window.partitionBy()
        ).alias("n"),
    )
    # every q picked in ONE aggregation pass: min bucket whose cumulative
    # count reaches rank max(1, ceil(q*n)) — per-q filter scans would walk
    # the bucket table len(qs) times for the same answer
    picks = [
        F.min(
            F.when(
                F.col("cum")
                >= F.greatest(F.lit(1), F.ceil(F.lit(float(q)) * F.col("n"))),
                F.col("bucket"),
            )
        ).alias(f"_q{i}")
        for i, q in enumerate(qs)
    ]
    wide = cum.groupBy(*gcols, "n").agg(*picks)
    out = wide.select(
        *gcols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(float(q)).alias("q"), F.col(f"_q{i}").alias("value")
                    )
                    for i, q in enumerate(qs)
                ]
            )
        ).alias("pick"),
        F.col("n").cast("bigint").alias("n"),
    ).select(*gcols, "pick.q", "pick.value", "n")
    if by:
        out = out.withColumnRenamed("grp", by)
    return out
