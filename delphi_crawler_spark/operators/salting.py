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
