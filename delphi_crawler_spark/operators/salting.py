"""Skew salting for hot hosts (north rule; SURVEY.md §4 item 2).

The synthetic link distribution (like the real web) is heavy-hitter skewed:
the top hosts own ~40% of links. Any stage partitioned by bare ``host``
would put those hosts' entire volume on single tasks. For *per-row compute*
stages (canonicalization, fetch UDF, link extraction) row order within the
stage doesn't matter, so we repartition on a salted key
``(host, pmod(xxhash64(url), salt))`` — hot hosts fan out over ``salt``
tasks; per-host *emission order* is re-established afterwards by the
explicit sort in ``politeness.emission_order`` (sort keys are total, so
salting can never change output bytes — the determinism discipline).

AQE's skew-join splitting covers the join side automatically; this module
covers the UDF/compute side where AQE cannot help.

``plan_salt`` picks the salt from observed per-host counts (a cheap
aggregate) instead of guessing: salt = ceil(max_host_share / target_share).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_repartition(
    df: DataFrame,
    n_partitions: int,
    host_col: str = "host",
    salt_col_src: str = "url",
    salt: int = 16,
) -> DataFrame:
    """Spread each host over up to ``salt`` partitions for compute stages."""
    return df.repartition(
        n_partitions,
        F.col(host_col),
        F.pmod(F.xxhash64(F.col(salt_col_src)), F.lit(salt)),
    )


def plan_salts(
    df: DataFrame,
    host_col: str = "host",
    n_partitions: int = 32,
    target_share: float | None = None,
    max_hosts: int = 10_000,
) -> dict[str, int]:
    """Per-host salt counts from the FULL count distribution: every host
    whose share exceeds ``target_share`` gets its own
    ``ceil(share / target)`` salt, so multi-modal skew (several hot hosts at
    different magnitudes) is fanned out proportionally — one global salt
    sized for the hottest host would over-shard every other hot host's rows
    (wasting partial-agg locality) or, sized low, under-shard the hottest.

    Driver cost is bounded: only the (rare) above-target hosts come back
    from the one hash-agg, capped at ``max_hosts`` hottest. Cold hosts are
    absent — they keep salt 1."""
    total = df.count()
    if total == 0:
        return {}
    target = target_share if target_share is not None else 1.0 / n_partitions
    cutoff = total * target
    hot = (
        df.groupBy(host_col)
        .count()
        .filter(F.col("count") > F.lit(cutoff))
        .orderBy(F.desc("count"))
        .limit(max_hosts)
        .collect()
    )
    return {
        r[host_col]: max(1, int(-(-(r["count"] / total) // target))) for r in hot
    }


def plan_salt(df: DataFrame, host_col: str = "host", n_partitions: int = 32,
              target_share: float | None = None) -> int:
    """Single global salt for the static ``salted_repartition``: the max of
    the per-host plan (i.e. sized for the hottest host)."""
    salts = plan_salts(df, host_col, n_partitions, target_share, max_hosts=1)
    return max(salts.values(), default=1)


def salted_repartition_by_plan(
    df: DataFrame,
    n_partitions: int,
    salts: dict[str, int],
    host_col: str = "host",
    salt_col_src: str = "url",
) -> DataFrame:
    """Plan-driven variant of ``salted_repartition``: each host fans out
    over ITS OWN salt count (1 for hosts absent from the plan), so every
    (host, salt) cell carries ~target_share of the rows regardless of how
    many hot hosts there are or how unequal they are. The salt map joins in
    as a broadcast of the hot hosts only (bounded by plan_salts' max_hosts)."""
    spark = df.sparkSession
    if not salts:
        return df.repartition(n_partitions, F.col(host_col))
    salt_df = spark.createDataFrame(
        [(h, int(s)) for h, s in salts.items()], f"{host_col} string, __salt int"
    )
    return (
        df.join(F.broadcast(salt_df), host_col, "left")
        .withColumn("__salt", F.coalesce(F.col("__salt"), F.lit(1)))
        .repartition(
            n_partitions,
            F.col(host_col),
            F.pmod(F.xxhash64(F.col(salt_col_src)), F.col("__salt").cast("bigint")),
        )
        .drop("__salt")
    )


def key_skew_gini(
    df: DataFrame, key_col: str = "host", count_col: str | None = None
) -> DataFrame:
    """Skew fingerprint of a key distribution: exact Gini coefficient plus
    top-1 / top-10 shares of per-key counts — the scalar that tells an
    operator WHEN ``plan_salts`` / AQE skew handling is worth wiring in
    (Gini ≈ 0: uniform keys, bare-host partitioning is fine; → 1: a few
    hosts own the frontier and every keyed stage needs fan-out).

    Gini over counts x sorted ascending with rank i (ties broken by key
    asc — total order, partition-exact):

        G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx)

    Σ i·x_i accumulates as ``decimal(38,0)`` (rank × count products are
    exact integers), so the statistic is engine-exact to the final double
    division, rounded 6. Returns one row (n_keys, total, gini,
    top1_share, top10_share); NULL gini for < 2 keys.

    Shape: one key hash-agg, one total-order window over the KEY TABLE
    (n_keys rows, not data rows — hosts, not URLs), one scalar agg. If
    ``count_col`` is given the input is already (key, count)-grained and
    the first agg folds pre-counted values instead."""
    if count_col is None:
        counts = df.groupBy(F.col(key_col).alias("k")).agg(
            F.count(F.lit(1)).alias("x")
        )
    else:
        counts = df.groupBy(F.col(key_col).alias("k")).agg(
            F.sum(F.col(count_col)).alias("x")
        )
    from pyspark.sql import Window

    w = Window.orderBy(F.asc("x"), F.asc("k"))
    wd = Window.orderBy(F.desc("x"), F.asc("k"))
    ranked = counts.select(
        "x",
        F.row_number().over(w).alias("i"),
        F.row_number().over(wd).alias("ri"),
    )
    agg = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(
            F.col("i").cast("decimal(19,0)") * F.col("x").cast("decimal(19,0)")
        ).alias("six"),
        F.sum(
            F.when(F.col("ri") == 1, F.col("x")).otherwise(F.lit(0)).cast(
                "decimal(38,0)"
            )
        ).alias("top1"),
        F.sum(
            F.when(F.col("ri") <= 10, F.col("x")).otherwise(F.lit(0)).cast(
                "decimal(38,0)"
            )
        ).alias("top10"),
    )
    n = F.col("n_keys").cast("double")
    sx = F.col("sx").cast("double")
    gini = (
        F.lit(2.0) * F.col("six").cast("double") - (n + F.lit(1.0)) * sx
    ) / (n * sx)
    return agg.select(
        "n_keys",
        F.col("sx").cast("bigint").alias("total"),
        F.when((F.col("n_keys") >= 2) & (F.col("sx") > 0), F.round(gini, 6)).alias(
            "gini"
        ),
        F.when(F.col("sx") > 0, F.round(F.col("top1").cast("double") / sx, 6)).alias(
            "top1_share"
        ),
        F.when(F.col("sx") > 0, F.round(F.col("top10").cast("double") / sx, 6)).alias(
            "top10_share"
        ),
    )


def host_partition_plan(
    df: DataFrame,
    n_partitions: int,
    host_col: str = "host",
    count_col: str | None = None,
) -> DataFrame:
    """Makespan-aware host→partition assignment: serpentine (boustrophedon)
    placement of hosts in descending load order — the parallel-safe
    deterministic stand-in for greedy LPT (which is inherently
    sequential): rank hosts by load desc, snake ranks across partitions
    (0..n-1, n-1..0, ...) so each pass pairs a heavy host with the
    partition that got a light one last pass. Guarantees every partition
    holds at most ceil(H/n) hosts and empirically lands within a few
    percent of LPT on power-law loads — and unlike hash partitioning it
    cannot put two top hosts on one task.

    Returns one row per host: (host, load, rank, partition) plus the
    per-partition aggregate view via ``partition_loads()`` below. The
    rank window runs over the HOST table (metadata-sized), the same
    discipline as ``key_skew_gini``."""
    if n_partitions < 1:
        raise ValueError("host_partition_plan() needs n_partitions >= 1")
    if count_col is None:
        loads = df.groupBy(F.col(host_col).alias("host")).agg(
            F.count(F.lit(1)).cast("bigint").alias("load")
        )
    else:
        loads = df.groupBy(F.col(host_col).alias("host")).agg(
            F.sum(count_col).cast("bigint").alias("load")
        )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("load"), F.asc("host"))
    r = loads.withColumn("rank", F.row_number().over(w) - 1)
    n = n_partitions
    pass_i = (F.col("rank") / n).cast("bigint")
    pos = F.col("rank") % n
    part = F.when(pass_i % 2 == 0, pos).otherwise(F.lit(n - 1) - pos)
    return r.select(
        "host",
        "load",
        F.col("rank").cast("bigint").alias("rank"),
        part.cast("bigint").alias("partition"),
    )


def partition_loads(plan: DataFrame) -> DataFrame:
    """Aggregate view of a ``host_partition_plan``: per-partition total
    load, host count, and the balance ratio (partition load / ideal
    even share) — the number to alert on before launching the stage."""
    total = plan.agg(F.sum("load").alias("t")).collect()[0]["t"] or 0
    nparts = plan.agg(
        (F.max("partition") + 1).alias("n")
    ).collect()[0]["n"]
    ideal = total / nparts if nparts else 1.0
    agg = plan.groupBy("partition").agg(
        F.sum("load").cast("bigint").alias("part_load"),
        F.count(F.lit(1)).cast("bigint").alias("n_hosts"),
    )
    return agg.select(
        "partition",
        "part_load",
        "n_hosts",
        F.round(F.col("part_load").cast("double") / F.lit(float(ideal)), 6).alias(
            "balance_ratio"
        ),
    )
