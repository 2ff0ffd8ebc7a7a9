"""Per-group uniform downsampling by deterministic hash rank.

Web corpora are wildly host-skewed: a handful of domains contribute most
documents, and training-data pipelines cap the contribution of any single
source ("no more than k docs per host") to keep the mixture balanced.
A random sample is not reproducible across runs and engines; the standard
deterministic substitute is *hash ordering* — rank each group's members
by a cryptographic hash of (group, id) and keep the first k. Because the
hash is uniform, this IS a uniform k-sample of the group, yet every rerun
(and the DuckDB oracle) selects the identical rows.

Distinct from ``corpus.py:stratified_token_sample``, which fills a token
*budget* per stratum in a caller-chosen priority order; this operator
caps *row counts* per group uniformly-at-random-but-deterministically.

Scale shape: one hash-partitioned window per group key (rank + filter);
group cardinality is host-scale (10^7-10^8 keys), so partitions hold many
small groups and the sort inside each is k-bounded per group. A hot group
(one host with 10^8 rows) is exactly the skew case ``operators/salting``
handles: pre-aggregate the top-k per salt cell, then re-rank the k*salt
survivors — the two-phase shape is documented here and applied by callers
when a group exceeds partition scale. No driver collection anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_uniform_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """Keep at most ``k`` rows per group, chosen by md5(group:id) order.

    Adds ``sample_rank`` (1-based within the group). The hash key makes
    the choice uniform; the id tiebreak makes it total even under md5
    collisions. All input columns pass through.
    """
    hkey = F.md5(
        F.concat_ws(":", F.col(group_col).cast("string"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(group_col).orderBy(hkey.asc(), F.col(id_col).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= k)
    )


def group_weighted_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Weighted k-sample without replacement per group — Efraimidis &
    Spirakis (IPL 2006) order sampling: each row draws an exponential race
    key ``-ln(u)/w`` from a DETERMINISTIC uniform u (md5 of (group, id),
    first 48 hex bits → (0,1)); the k smallest keys win, which selects row
    i with probability proportional to ``w_i`` at every step. The training
    -data use: sample documents proportional to quality/importance weight
    while capping per-host contribution — reproducible across reruns AND
    engines (the DuckDB oracle replays the identical arithmetic).

    Rows with null/non-positive weight never win (they draw an infinite
    key only if u could be 1 — instead they are filtered, mirroring
    ``apportion_budget``'s non-positive pool exclusion). Adds
    ``sample_rank`` (1-based by race key, id tiebreak).

    Scale shape: same single per-group window as ``group_uniform_sample``
    (k-bounded sort per group, no driver collection); the skew note above
    applies unchanged.
    """
    wgt = F.col(weight_col).cast("double")
    hkey = F.md5(
        F.concat_ws(":", F.col(group_col).cast("string"), F.col(id_col).cast("string"))
    )
    # first 12 hex chars = 48 bits: exact in a double; +1 keeps u in (0,1]
    v = F.conv(F.substring(hkey, 1, 12), 16, 10).cast("double")
    u = (v + 1.0) / 281474976710657.0  # 2^48 + 1
    key = -F.log(u) / wgt
    w = Window.partitionBy(group_col).orderBy(key.asc(), F.col(id_col).asc())
    return (
        df.where(wgt.isNotNull() & (wgt > 0))
        .withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= k)
    )


def leakage_safe_split(
    df: DataFrame,
    unit_col: str,
    splits: list[tuple[str, float]],
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment by leakage UNIT: every row
    hashes its ``unit_col`` (e.g. the near-dup ``cluster_id`` from
    ``graph.neardup_clusters``, or a registrable domain) to a uniform
    u ∈ (0, 1] and lands in the split whose cumulative-fraction band
    contains u — so all members of a unit land in the SAME split and
    near-duplicates (or same-site pages) can never straddle train and
    eval (the contamination mode Lee et al. 2022 measure). ``splits`` is
    ``[(name, fraction), ...]``; fractions must sum to 1.

    The hash is the engine-portable md5-uniform idiom shared with
    ``group_weighted_sample`` (first 48 bits, exact in a double), so
    reruns AND the SQL oracle assign identically. Pure JVM projection —
    no shuffle, no Python; composes downstream of the one CC clustering
    pass, adding zero passes of its own."""
    import math

    fracs = [f for _, f in splits]
    if not splits or any(f < 0 for f in fracs) or abs(math.fsum(fracs) - 1.0) > 1e-9:
        raise ValueError("split fractions must be >= 0 and sum to 1")
    hkey = F.md5(F.col(unit_col).cast("string"))
    v = F.conv(F.substring(hkey, 1, 12), 16, 10).cast("double")
    u = (v + 1.0) / 281474976710657.0  # 2^48 + 1; u in (0, 1]
    expr = None
    for i in range(len(splits) - 1):
        # fsum, not running +=: naive accumulation drifts a ulp off the
        # literal band edge a SQL twin writes (0.8 + 0.1 != 0.9 in IEEE),
        # while the correctly-rounded exact sum reproduces it.
        acc = math.fsum(fracs[: i + 1])
        cond = u <= F.lit(acc)
        name = splits[i][0]
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(splits[-1][0])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def global_uniform_sample(
    df: DataFrame, id_col: str, k: int, rank_col: str = "sample_rank"
) -> DataFrame:
    """Deterministic GLOBAL uniform k-sample: rank every row by the
    md5-uniform of its id (corpus-wide, not per group) and keep the k
    smallest — the "draw an eval/inspection subset of exactly k docs"
    step, reproducible across reruns and engines.

    Scale shape: expressed as orderBy(hash).limit(k), which Catalyst
    compiles to TakeOrderedAndProject — a per-partition k-bounded top-k
    plus one k-sized driver merge; NO global sort, NO single-task window
    (the trap a row_number() over an unpartitioned window springs).
    Plan-audited in tests/test_plans.py."""
    if k < 1:
        raise ValueError("k must be >= 1")
    h = F.md5(F.col(id_col).cast("string"))
    ranked = df.orderBy(h.asc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.md5(F.col(id_col).cast("string")).asc(),
                       F.col(id_col).asc())
    # the window here ranks only the k survivors (post-limit), so the
    # unpartitioned window is k-bounded, never corpus-bounded
    return ranked.withColumn(rank_col, F.row_number().over(w))
