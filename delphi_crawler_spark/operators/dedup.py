"""First-occurrence dedup (reference parity: F1).

The reference keeps a ``mutable.HashSet`` seen-cache and keeps an identifier
iff not seen, adding on first sight (MavenDiscoveryProcess.scala:57,71-75;
MavenCrawlActor.scala:33,45-49). In a stream, *first occurrence wins* — so
plain ``dropDuplicates`` is NOT a faithful translation (under shuffle it
keeps an arbitrary row). The deterministic pick is "the row whose explicit
arrival order ``seq`` is minimal per key", realized as a hash aggregate:

    groupBy(key).agg(min_by(struct(other_cols), struct(order_cols)))

which is equivalent to ``row_number() OVER (PARTITION BY key ORDER BY seq)
== 1`` but cheaper at scale: a hash aggregate gets map-side partial
combining (duplicates collapse before the shuffle) and never sorts, while
the window form must shuffle every row and sort each key partition. The
order key must be a total order per key (``seq`` is unique) — the
determinism discipline at every parallelism level (the two-cluster-size
equivalence criterion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def first_occurrence_dedup(
    df: DataFrame,
    key: str | list[str] = "url",
    order: list[str] | None = None,
) -> DataFrame:
    """Keep the first-arriving row per key (order = ``seq`` by default)."""
    keys = [key] if isinstance(key, str) else list(key)
    order = order or ["seq"]
    others = [c for c in df.columns if c not in keys]
    if not others:  # key-only frame: first-per-key is just DISTINCT
        return df.distinct()
    def col(c: str):  # backtick-quote so dotted column names stay literal
        return F.col(f"`{c}`")

    ord_struct = F.struct(*[col(c) for c in order])
    agg = df.groupBy(*[col(k) for k in keys]).agg(
        F.min_by(F.struct(*[col(c).alias(c) for c in others]), ord_struct).alias("__first")
    )
    # getField (not string-path access) so dotted column names survive
    out = agg.select(
        *[col(k) for k in keys],
        *[F.col("__first").getField(c).alias(c) for c in others],
    )
    # restore the caller's column order
    return out.select(*[f"`{c}`" for c in df.columns])


def keep_best_per_cluster(
    clustered: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    score_col: str = "score",
) -> DataFrame:
    """The production dedup DECISION rule: within each near-dup cluster keep
    the highest-QUALITY document (score desc, id asc tiebreak), not the
    first-seen/smallest-id one — published corpus pipelines keep the
    longest or best-scored duplicate (e.g. the C4/Gopher keep-longest
    heuristic), because near-dup clusters often pair a full page with its
    truncated or boilerplate-wrapped copies.

    Input is ``neardup_clusters`` output joined with any per-doc score;
    adds ``kept`` (exactly one per cluster). One window over the cluster
    key — same shuffle the cluster-size agg already paid, no new exchange
    shape at 100 TB.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(cluster_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    return clustered.withColumn(
        "kept", (F.row_number().over(w) == 1).cast("int")
    )


def frontier_merge(
    sources: "list[DataFrame]",
    url_col: str = "url",
    priority_col: str = "priority",
    ts_col: str = "discovery_ts",
    source_col: str = "source",
) -> "DataFrame":
    """Multi-source frontier union — seeds, extracted links, and sitemap
    discoveries all propose the same URLs with different priorities and
    timestamps; the frontier must keep ONE row per URL with merge-
    deterministic semantics:

    - ``priority``  = max across sources (any source's urgency wins);
    - ``discovery_ts`` = min (first sighting — the F1 convention, so the
      merged row is stable no matter which source file lands first);
    - ``n_sources`` and a sorted distinct ``sources`` list for lineage.

    One union + one url-keyed hash-agg (partial map-side); the array_agg
    is bounded by the source count, not row count. The same shape merges
    two FRONTIER SNAPSHOTS (cross-datacenter reconciliation) unchanged.
    """
    from pyspark.sql import functions as F

    if not sources:
        raise ValueError("frontier_merge() needs at least one source")
    u = sources[0]
    for s in sources[1:]:
        u = u.unionByName(s)
    return (
        u.groupBy(url_col)
        .agg(
            F.max(priority_col).cast("bigint").alias(priority_col),
            F.min(ts_col).cast("bigint").alias(ts_col),
            F.count(F.lit(1)).cast("bigint").alias("n_proposals"),
            F.array_sort(F.collect_set(source_col)).alias("sources"),
        )
        .withColumn("n_sources", F.size("sources").cast("bigint"))
    )


def dedup_rate_by_source(
    docs: "DataFrame",
    source_col: str = "source",
    text_col: str = "text",
) -> "DataFrame":
    """Per-source duplication report — the dump-level quality table that
    feeds source weighting (a feed whose dup rate doubles between rounds
    is re-serving old content; a source whose text mostly exists
    elsewhere adds tokens but no information):

    - ``dup_rate``    = 1 − distinct digests / docs (within-source);
    - ``cross_rate``  = share of the source's docs whose digest also
      occurs in ANOTHER source (cross-source redundancy — the md5
      digest grain shared with the exact-dedup family).

    Two hash-aggs on the digest grain + one broadcastable digest→
    n_sources join; exact integer ratios rounded 6."""
    from pyspark.sql import functions as F

    d = docs.select(
        F.col(source_col).alias("source"),
        F.md5(F.col(text_col)).alias("digest"),
    )
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("digest").cast("bigint").alias("n_unique"),
    )
    spread = d.distinct().groupBy("digest").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sources")
    )
    cross = (
        d.join(spread, "digest")
        .filter(F.col("n_sources") > 1)
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_cross"))
    )
    return (
        per.join(cross, "source", "left")
        .select(
            "source",
            "n_docs",
            "n_unique",
            F.round(
                F.lit(1.0)
                - F.col("n_unique").cast("double") / F.col("n_docs").cast("double"),
                6,
            ).alias("dup_rate"),
            F.coalesce("n_cross", F.lit(0)).cast("bigint").alias("n_cross_source"),
            F.round(
                F.coalesce("n_cross", F.lit(0)).cast("double")
                / F.col("n_docs").cast("double"),
                6,
            ).alias("cross_rate"),
        )
    )
