"""Hash-bucketed table writes for shuffle-free co-located joins.

The tablestore's directory partitioning (host buckets) prunes SCANS; this
module adds Spark's file-level ``bucketBy`` layout, which removes the
JOIN-side exchange entirely: two tables bucketed (and sorted) on the same
key with the same bucket count sort-merge-join with NO Exchange — each
task zips bucket i of A with bucket i of B. (The residual partition-local
Sort is cheap — linear-ish over pre-sorted single-file buckets — and only
elides under ``spark.sql.legacy.bucketedTableScan.outputOrdering=true``,
off by default since Spark 3.0 / SPARK-28595; the shuffle is the scale
cost, and it is gone.) At 100 TB this is
the difference between re-shuffling the frontier every round and reading
it pre-placed: the big recurring equi-joins (frontier ⋈ fetched-docs on
url_hash, snapshot ⋈ snapshot on url) pay their shuffle once at write
time and never again.

``bucketBy`` requires a catalog table (``saveAsTable``): the bucket spec
lives in the catalog, not the parquet footer, so path-reads cannot use
it. Pinned by ``tests/test_plans.py::test_bucketed_colocated_join_no_shuffle``
(plan audit: zero Exchange; SortMergeJoin over bucketed scans).

Reference parity: the reference's Elasticsearch index routes documents by
id hash to shards — the same placement idea; this is its Spark-native
form (SURVEY §2.1 S4-S6 sinks at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a catalog table hash-bucketed AND sorted on
    ``key`` — the layout both sides of a recurring equi-join should share
    (same key, same ``n_buckets``) to join exchange-free."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    # one file per bucket: repartition on the key with the bucket count
    # (same Murmur3 hash partitioning the bucket spec uses) so each task
    # writes exactly its bucket — Spark only trusts sortBy metadata (and
    # elides the join-side Sort) when a bucket is a single file
    from pyspark.sql import functions as F

    (
        df.repartition(n_buckets, F.col(key))
        .write.bucketBy(n_buckets, key)
        .sortBy(key)
        .mode(mode)
        .format("parquet")
        .saveAsTable(table)
    )


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
    force_merge: bool = False,
) -> DataFrame:
    """Join two same-key same-bucket-count tables; with matching bucketed
    layouts Catalyst plans a sort-merge join with no Exchange (buckets are
    co-located by construction); the remaining Sort is partition-local.
    ``force_merge`` adds a merge hint — at production sizes SMJ wins on its
    own; the hint exists so small-input tests/audits exercise the bucketed
    path instead of a broadcast."""
    left = spark.table(left_table)
    if force_merge:
        left = left.hint("merge")
    return left.join(spark.table(right_table), key, how)
