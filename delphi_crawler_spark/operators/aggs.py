"""Grouping / aggregation operators (reference parity: A1/A3/A5).

- ``group_edges``: the reference's recursive ``mergeEdges`` partition of an
  edge set by library (ElasticCallGraphActor.scala:64-73) becomes a single
  ``groupBy(...).agg(sorted collect)``. We use
  ``array_sort(array_distinct(collect_list(...)))`` — NOT ``collect_set`` —
  because set collection order is shuffle-nondeterministic and the engine's
  outputs must be byte-identical across parallelism levels.
- ``nested_library_doc``: struct-per-library shaping
  (``createLibraryMap``, ElasticCallGraphActor.scala:75-85).
- ``partition_metrics``: per-partition lineage + metrics the north rule
  requires per batch (the reference only logs counts ad hoc,
  MavenDiscoveryProcess.scala:86-99).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_edges(
    links: DataFrame, group_col: str = "library", member_col: str = "method"
) -> DataFrame:
    """Edges grouped per library with a deterministic sorted member list."""
    return links.groupBy(group_col).agg(
        F.array_sort(F.array_distinct(F.collect_list(member_col))).alias("methods"),
        F.count(F.lit(1)).alias("n_edges"),
    )


def nested_library_doc(
    grouped: DataFrame, doc_col: str = "src_doc", group_col: str = "library"
) -> DataFrame:
    """Per-doc nested array<struct(library, methods)> — the store's ``calls``
    field shape (ElasticIndexMaintenance.scala:57-61)."""
    per_lib = grouped.groupBy(doc_col, group_col).agg(
        F.array_sort(F.array_distinct(F.collect_list("method"))).alias("methods")
    )
    return per_lib.groupBy(doc_col).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(group_col).alias("name"), F.col("methods")))
        ).alias("calls")
    )


def partition_metrics(df: DataFrame, seq_col: str = "seq") -> DataFrame:
    """Per-partition lineage row: (partition_id, n_rows, min_seq, max_seq).
    Appended to the ``metrics`` table each round (A5)."""
    return (
        df.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(seq_col).alias("min_seq"),
            F.max(seq_col).alias("max_seq"),
        )
        .withColumnRenamed("__pid", "partition_id")
    )


def partition_metrics_pinned(
    df: DataFrame, num_buckets: int = 8, seq_col: str = "seq"
) -> DataFrame:
    """Input-determined twin of :func:`partition_metrics` (A5): rows are
    bucketed by the DETERMINISTIC key ``pmod(seq, num_buckets)`` and
    physically repartitioned on it — each bucket is one co-located unit,
    exactly like a pinned hash partitioner — and the lineage row reports
    the bucket key instead of the opaque ``spark_partition_id()``. Same
    information (row count + seq range per co-located unit), but a pure
    function of the input, so an exact SQL oracle exists: the
    introspective variant's answer IS the runtime partitioning; this
    one's answer is pinned by construction. The engine checkpoints the
    introspective rows (real physical lineage); this variant is the
    verification surface."""
    bucket = F.pmod(F.col(seq_col), F.lit(num_buckets)).cast("int")
    b = df.withColumn("partition_id", bucket).repartition(
        num_buckets, "partition_id"
    )
    return b.groupBy("partition_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(seq_col).alias("min_seq"),
        F.max(seq_col).alias("max_seq"),
    )


def distribution_drift(
    a: DataFrame,
    b: DataFrame,
    value_col: str = "value",
    ndigits: int = 3,
    eps: float = 1e-6,
) -> DataFrame:
    """Distribution drift between two samples — the monitoring pair every
    corpus pipeline alerts on when a new crawl dump's quality/score
    distribution slides away from the reference dump:

    - ``ks_distance``: two-sample Kolmogorov–Smirnov statistic,
      max |F_a(x) − F_b(x)| over the observed support;
    - ``psi``: Population Stability Index, Σ (p_a−p_b)·ln(p_a/p_b) with
      both shares floored at ``eps`` (the industry zero-bucket guard;
      <0.1 stable, >0.25 action).

    Values bucket to ``ndigits`` decimals first, so the support table is
    bounded by score granularity, not row count — the running-sum window
    runs over THAT table (the key_skew_gini discipline). Exactness: the
    CDF steps are exact integer ratios; each PSI term rounds to 6 dp and
    accumulates as decimal(28,6) (order-exact in any engine); KS is a
    max (order-free). Returns one row: (n_a, n_b, n_buckets,
    ks_distance, psi)."""
    va = a.select(F.round(F.col(value_col), ndigits).alias("v")).groupBy("v").agg(
        F.count(F.lit(1)).alias("na")
    )
    vb = b.select(F.round(F.col(value_col), ndigits).alias("v")).groupBy("v").agg(
        F.count(F.lit(1)).alias("nb")
    )
    j = va.join(vb, "v", "full_outer").select(
        "v",
        F.coalesce("na", F.lit(0)).alias("na"),
        F.coalesce("nb", F.lit(0)).alias("nb"),
    )
    from pyspark.sql import Window

    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    run = j.select(
        "v",
        "na",
        "nb",
        F.sum("na").over(w).alias("ca"),
        F.sum("nb").over(w).alias("cb"),
    )
    tot = run.agg(
        F.sum("na").cast("bigint").alias("n_a"),
        F.sum("nb").cast("bigint").alias("n_b"),
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
    )
    stats = run.crossJoin(F.broadcast(tot))
    fa = F.col("ca").cast("double") / F.col("n_a").cast("double")
    fb = F.col("cb").cast("double") / F.col("n_b").cast("double")
    pa = F.greatest(
        F.col("na").cast("double") / F.col("n_a").cast("double"), F.lit(float(eps))
    )
    pb = F.greatest(
        F.col("nb").cast("double") / F.col("n_b").cast("double"), F.lit(float(eps))
    )
    term = F.round((pa - pb) * F.log(pa / pb), 6).cast("decimal(28,6)")
    out = stats.agg(
        F.max(F.abs(fa - fb)).alias("ks_raw"),
        F.sum(term).alias("psi_sum"),
        F.first("n_a").alias("n_a"),
        F.first("n_b").alias("n_b"),
        F.first("n_buckets").alias("n_buckets"),
    )
    return out.select(
        "n_a",
        "n_b",
        "n_buckets",
        F.round(F.col("ks_raw"), 6).alias("ks_distance"),
        F.round(F.col("psi_sum").cast("double"), 6).alias("psi"),
    )


def weighted_quantile_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    q: float = 0.5,
) -> DataFrame:
    """Exact weighted quantile per group — the size-aware percentile
    (bytes-weighted latency median, token-weighted doc-length p90) that
    an unweighted quantile silently misstates when row sizes vary: the
    result is the smallest value whose cumulative weight reaches
    ``q × total_weight`` over the value-sorted group.

    In-cell exact form for window-sized groups (hosts, shards): one
    group hash-agg collects (value, weight) structs, array_sort orders
    by value (weight as deterministic tiebreak), and the threshold scan
    is an in-cell fold — O(n²) per group via prefix re-aggregation,
    documented bound, fine to ~10³ rows/group; the corpus-scale exact
    path stays ``operators/quantiles.py`` (two-phase, no global sort).
    Zero/negative weights are dropped (no mass). Returns (group,
    n_rows, total_weight, wq) — NULL when the group carries no mass."""
    if not (0.0 < q <= 1.0):
        raise ValueError("weighted_quantile_by_group() needs 0 < q <= 1")
    rows = df.select(
        F.col(group_col).alias("g"),
        F.col(value_col).cast("double").alias("v"),
        F.col(weight_col).cast("double").alias("w"),
    ).filter(F.col("w") > 0)
    agg = rows.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.array_sort(F.collect_list(F.struct("v", "w"))).alias("vw"),
        F.sum("w").alias("tw"),
    )
    n = F.size("vw")
    target = F.col("tw") * F.lit(float(q))
    # cum weight at index i (1-based): prefix fold over the sorted structs
    cum_at = lambda i: F.aggregate(  # noqa: E731
        F.slice(F.col("vw"), 1, i), F.lit(0.0), lambda a, s: a + s["w"]
    )
    idxs = F.filter(
        F.sequence(F.lit(1), n), lambda i: cum_at(i) >= target - F.lit(1e-12)
    )
    pick = F.element_at(idxs, 1)
    wq = F.when(pick.isNotNull(), F.element_at(F.col("vw"), pick)["v"])
    return agg.select(
        F.col("g").alias(group_col),
        "n_rows",
        F.round(F.col("tw"), 6).alias("total_weight"),
        F.round(wq, 6).alias("wq"),
    )
