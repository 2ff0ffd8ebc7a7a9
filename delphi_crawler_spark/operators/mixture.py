"""Temperature-scaled domain/source mixture weights for training-data
sampling (multilingual-pretraining practice: XLM-R, mT5 — Conneau et al.
2020 §3.1, Xue et al. 2021 §3.2): with per-source token mass ``n_i`` and
corpus share ``p_i = n_i / N``, the sampler draws from the flattened
distribution ``q_i ∝ p_i^alpha`` (``alpha < 1`` up-samples small sources,
``alpha = 1`` is natural sampling). The per-source *epochs* —
``budget · q_i / n_i`` — is the number a pipeline actually acts on: it is
the repeat factor the data loader applies to source ``i`` when drawing
``budget`` tokens.

Scale shape: one partial-aggregating hash-agg over (group → Σ weight) —
the only pass over the corpus — then scalar math on the group-count-sized
result (sources/domains are ≤ thousands by construction) via a broadcast
cross join of the 1-row totals. Entirely JVM; no UDF, no second scan.

Reference parity: the reference ships every record to one index and has
no sampling notion; this extends the §2.10 training-data tier (SURVEY.md)
upstream of ``corpus.stratified_token_sample`` (which consumes per-stratum
budgets exactly of the form ``epochs_i · n_i``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def temperature_mixture(
    docs: DataFrame,
    group_col: str,
    weight_col: str,
    alpha: float = 0.5,
    budget: int | None = None,
    decimals: int = 6,
) -> DataFrame:
    """Per-group mixture table: ``(group, n_tokens, p, q, epochs)`` where
    ``p`` is the natural share, ``q`` the temperature-``alpha`` sampling
    share, and ``epochs`` the expected passes over the group when drawing
    ``budget`` tokens (default: one corpus-sized draw, ``budget = N``).
    Shares are rounded to ``decimals`` places so the table is
    engine-portable (stable under summation-order differences)."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError("alpha must be in [0, 1]")
    per = (
        docs.select(
            F.col(group_col).cast("string").alias("grp"),
            F.col(weight_col).cast("double").alias("w"),
        )
        .filter(F.col("grp").isNotNull())
        .groupBy("grp")
        .agg(F.sum("w").alias("n_tokens"))
    )
    tot = per.agg(
        F.sum("n_tokens").alias("N"),
        F.sum(F.pow("n_tokens", F.lit(float(alpha)))).alias("Z"),
    )
    b = F.coalesce(F.lit(budget).cast("double"), F.col("N"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            F.col("grp").alias("group"),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.round(F.col("n_tokens") / F.col("N"), decimals).alias("p"),
            F.round(
                F.pow("n_tokens", F.lit(float(alpha))) / F.col("Z"), decimals
            ).alias("q"),
            F.round(
                b * F.pow("n_tokens", F.lit(float(alpha))) / F.col("Z")
                / F.col("n_tokens"),
                decimals,
            ).alias("epochs"),
        )
    )
