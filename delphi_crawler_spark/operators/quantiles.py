"""Exact distributed quantiles with no global sort.

Percentile telemetry (fetch-latency p50/p95/p99, response-size tails,
per-host score distributions) is usually answered with sketches
(``approx_percentile``) because the naive exact plan — a global sort or an
unpartitioned window — serializes into one task. But *exact* quantiles
don't need a global sort: collapse the data to value grain first (one
partial-aggregating hash-agg; distinct values << rows for telemetry
columns), then compute the running count over value order with the
two-phase per-partition-offset pattern (``ordering.py``): range-partition
the value-grained table, one narrow counting pass, driver prefix-sum of
per-(partition, group) totals (KBs), map-side cumulative add. Each row
then owns a rank interval [cum-cnt+1, cum], and quantile q picks the row
whose interval contains rank ``max(1, ceil(q*n))`` — the Postgres/DuckDB
``percentile_disc`` convention, so a SQL oracle can verify values exactly.

Because the rank intervals depend only on the total (group, value) order,
the answer is byte-identical at any parallelism level. The driver only
ever sees per-(partition, group) count totals, never data.

Reference parity: the reference exposes no quantile operator (its metrics
are counts); this extends the A5/metrics family (SURVEY §2.7) with the
telemetry op a web-scale crawl actually dashboards.

Choosing a variant by group cardinality:

- ``exact_quantiles`` — FEW, LARGE groups (event types, status codes,
  languages: dozens to thousands). Each group's values spread across all
  partitions, so no single task ever sorts a whole group; the driver
  prefix-sum holds partitions × groups counters, which is why this
  variant must NOT be pointed at 10^8 host-grain groups.
- ``exact_quantiles_keyed`` — MANY, SMALL groups (per-host latency at
  10^7-10^8 hosts). One hash-partitioned window per group: groups are
  partition-local and each sorts only its own rows; nothing driver-side
  at all. A single giant group here would serialize into one task —
  exactly the case the two-phase variant exists for.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    qs: list[float],
    by: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ``percentile_disc`` for every q in ``qs``, optionally per
    ``by`` group. Returns ``(group?, q, value, n)`` where ``value`` is the
    smallest input value whose cumulative count reaches ``ceil(q*n)`` and
    ``n`` is the (group's) row count. Nulls in ``value_col`` are dropped
    (SQL aggregate semantics)."""
    if not qs:
        raise ValueError("qs must be non-empty")
    if any(q < 0.0 or q > 1.0 for q in qs):
        raise ValueError(f"quantiles must be in [0, 1]: {qs}")
    spark = df.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    gcol = by or "__g"
    base = df.where(F.col(value_col).isNotNull()).select(
        (F.col(by) if by else F.lit("all")).alias(gcol),
        F.col(value_col).cast("double").alias("v"),
    )
    # value grain: the only full-data shuffle, partial-aggregating
    vals = base.groupBy(gcol, "v").agg(F.count(F.lit(1)).alias("cnt"))
    d = (
        vals.repartitionByRange(n_parts, F.col(gcol), F.col("v"))
        .sortWithinPartitions(gcol, "v")
        .persist()
    )

    def _totals(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        sums: dict[str, int] = {}
        for pdf in batches:
            for k, v in pdf.groupby(pdf[gcol].astype(str))["cnt"].sum().items():
                sums[k] = sums.get(k, 0) + int(v)
        if sums:
            yield pd.DataFrame(
                {"pid": pid, "g": list(sums), "cnt": list(sums.values())}
            )

    totals = d.mapInPandas(_totals, schema="pid int, g string, cnt long").collect()
    offsets: dict[tuple[int, str], int] = {}
    group_n: dict[str, int] = {}
    for r in sorted(totals, key=lambda r: (r.g, r.pid)):
        offsets[(r.pid, r.g)] = group_n.get(r.g, 0)
        group_n[r.g] = group_n.get(r.g, 0) + r.cnt
    if not group_n:  # empty input after the null filter
        d.unpersist()
        empty_schema = StructType(
            ([d.schema[gcol]] if by else [])
            + [
                StructField("q", DoubleType()),
                StructField("value", DoubleType()),
                StructField("n", LongType()),
            ]
        )
        out = spark.createDataFrame([], empty_schema)
        out._release_quantiles = lambda: None  # type: ignore[attr-defined]
        return out
    # target ranks per group: rank_q = max(1, ceil(q * n))
    targets = {
        g: [(q, max(1, math.ceil(q * n))) for q in qs] for g, n in group_n.items()
    }
    bc = spark.sparkContext.broadcast((offsets, targets, group_n))

    out_schema = StructType(
        [
            d.schema[gcol],
            StructField("q", DoubleType()),
            d.schema["v"],
        ]
    )

    def _pick(batches):
        # Vectorized: rows are sorted by (group, v) and rank intervals tile
        # each group's cum contiguously, so the row holding rank r is
        # searchsorted(cum, r) — one O(log rows) probe per (group, q), no
        # per-row Python.
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        offs, tgts, _ns = bc.value
        consumed: dict[str, int] = {}
        for pdf in batches:
            key = pdf[gcol].astype(str)
            local = pdf.groupby(key, sort=False)["cnt"].cumsum().astype("int64")
            start = {
                s: offs.get((pid, s), 0) + consumed.get(s, 0) for s in key.unique()
            }
            cum = (local + key.map(start).astype("int64")).to_numpy()
            vs = pdf["v"].to_numpy()
            karr = key.to_numpy()
            rows = []
            for g in start:  # groups in this batch — few (range-partitioned)
                mask = karr == g
                gcum = cum[mask]
                gvs = vs[mask]
                glo = gcum[0] - int(pdf["cnt"].to_numpy()[mask][0]) + 1
                for q, rank in tgts.get(g, ()):
                    if rank < glo or rank > gcum[-1]:
                        continue  # rank lives in another partition's span
                    i = int(np.searchsorted(gcum, rank, side="left"))
                    rows.append((g, q, gvs[i]))
            for s, v in pdf.groupby(key, sort=False)["cnt"].sum().items():
                consumed[s] = consumed.get(s, 0) + int(v)
            if rows:
                yield pd.DataFrame(rows, columns=[gcol, "q", "v"])

    out = d.mapInPandas(_pick, schema=out_schema)
    # per-group n rides in on a broadcast join of the tiny (group, n) table:
    # a literal create_map would put one plan node per group on the driver,
    # bloating codegen at high-cardinality `by`
    n_df = spark.createDataFrame(
        [(g, int(n)) for g, n in group_n.items()], f"{gcol} string, n bigint"
    ).withColumn(gcol, F.col(gcol).cast(d.schema[gcol].dataType))
    out = out.join(F.broadcast(n_df), gcol).select(
        *( [gcol] if by else [] ), "q", F.col("v").alias("value"), "n"
    )
    out._release_quantiles = lambda: d.unpersist()  # type: ignore[attr-defined]
    return out


def exact_quantiles_keyed(
    df: DataFrame,
    value_col: str,
    qs: list[float],
    by: str,
) -> DataFrame:
    """High-cardinality-group variant (see module docstring): same
    ``percentile_disc`` semantics, computed with one hash-partitioned
    window per group — zero driver state, scales with group COUNT instead
    of group SIZE. Returns the same (group, q, value, n) schema."""
    if not qs:
        raise ValueError("qs must be non-empty")
    if any(q < 0.0 or q > 1.0 for q in qs):
        raise ValueError(f"quantiles must be in [0, 1]: {qs}")
    from pyspark.sql import Window

    base = df.where(F.col(value_col).isNotNull()).select(
        F.col(by), F.col(value_col).cast("double").alias("v")
    )
    w = Window.partitionBy(by)
    ranked = base.select(
        by,
        "v",
        F.row_number().over(w.orderBy("v")).alias("rk"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    qdf = ranked.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    picked = ranked.join(
        F.broadcast(qdf),
        F.col("rk")
        == F.greatest(F.lit(1), F.ceil(F.col("q") * F.col("n"))).cast("int"),
    )
    return picked.select(by, "q", F.col("v").alias("value"), F.col("n").cast("bigint"))
