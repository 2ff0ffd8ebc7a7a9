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


def plan_salt(df: DataFrame, host_col: str = "host", n_partitions: int = 32,
              target_share: float | None = None) -> int:
    """Choose a salt from the observed skew: big enough that the hottest
    host's share spreads to ~one partition's worth of work."""
    total = df.count()
    if total == 0:
        return 1
    top = (
        df.groupBy(host_col).count().orderBy(F.desc("count")).limit(1).collect()
    )[0]["count"]
    target = target_share if target_share is not None else 1.0 / n_partitions
    share = top / total
    return max(1, int(-(-share // target)))  # ceil(share/target)
