"""Exploration/exploitation host scheduling: UCB1 over per-host reward.

A frontier scheduler that only exploits (priority = past yield) starves
hosts it has barely sampled; classic crawl-ordering work treats host
selection as a bandit (UCB1, Auer et al. 2002 — the public
"Finite-time Analysis of the Multiarmed Bandit Problem"). Each fetch of a
host is a pull; the reward is the observed yield of that fetch (fraction
of extracted links that were new, in [0, 1]). The scheduler ranks hosts by

    ucb(h) = mean_reward(h) + c * sqrt(ln(N) / n(h))

so rarely-pulled hosts get an exploration bonus that decays as evidence
accumulates. This composes with the politeness family: UCB decides WHICH
hosts lead the round, the token bucket decides WHEN inside it
(SURVEY.md §2.3 P6; the reference schedules FIFO,
IndexProcessing.scala:76-99 — this is the adaptive extension).

Spark shape (scale notes for 10^7+ hosts):
- one partial-aggregating hash-agg over the observation log → (host, n,
  reward-numerator sum) — the only shuffle, O(distinct hosts) output;
- total pull count N is a 1-row aggregate crossJoined in (broadcast, no
  driver collect);
- the score is pure JVM projection; the final rank is a window over the
  host-stats table (already tiny relative to the log). At extreme host
  cardinality swap the window for TakeOrderedAndProject top-k — the
  scores are computed identically.

Exactness discipline: rewards enter as INTEGER numerators over a fixed
``scale`` denominator (e.g. percent), so the per-host sum is an exact
BIGINT hash-agg — order-independent, oracle-reproducible; floats appear
only in the final projection (IEEE division + the documented ln/sqrt
rounding, same policy as the linkrank family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["ucb_host_priority"]


def ucb_host_priority(
    obs: DataFrame,
    host_col: str = "host",
    reward_num: str = "reward_num",
    scale: int = 100,
    c: float = 1.5,
) -> DataFrame:
    """Rank hosts by UCB1 score over an observation log.

    ``obs`` has one row per (host, pull) with ``reward_num`` an integer
    reward numerator in [0, scale]. Returns one row per host:
    (host, n_obs, mean_reward, ucb, rank) — rank 1 is the host the next
    round should lead with. mean/ucb are rounded to 6 dp (ln/sqrt policy);
    ties rank deterministically by (ucb desc, host asc).
    """
    if scale <= 0:
        raise ValueError(f"scale must be positive: {scale}")
    st = obs.groupBy(F.col(host_col).alias("host")).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(F.col(reward_num).cast("bigint")).alias("s"),
    )
    total = st.agg(F.sum("n_obs").cast("double").alias("n_total"))
    mean = F.col("s").cast("double") / (F.lit(float(scale)) * F.col("n_obs"))
    bonus = F.lit(float(c)) * F.sqrt(F.log(F.col("n_total")) / F.col("n_obs"))
    scored = st.crossJoin(F.broadcast(total)).select(
        "host",
        F.col("n_obs").cast("bigint").alias("n_obs"),
        F.round(mean, 6).alias("mean_reward"),
        F.round(mean + bonus, 6).alias("ucb"),
    )
    w = Window.orderBy(F.col("ucb").desc(), F.col("host").asc())
    return scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
