"""Frontier/source scans (reference parity: S1, C4, F5, S11).

The reference unfolds the remote Maven index into an **ordered** identifier
stream and parses each record's ``u`` field by splitting on ``|``, skipping
malformed records with a warning (IndexProcessing.scala:45-48,76-99). Our
sources are table scans; order is never implicit — it is an explicit ``seq``
column (monotonic discovery sequence), because Spark scans have no row
order guarantee across partitions.

Scale discipline: pass ``columns`` so column pruning reaches the parquet
footer, and ``predicate`` (a Column) so the filter pushes into the scan —
check with ``df.explain`` that ``PushedFilters``/``ReadSchema`` shrink.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def scan_parquet(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    predicate: Column | None = None,
) -> DataFrame:
    """Pruned + pushed-down parquet scan (S1's static analogue)."""
    df = spark.read.parquet(path)
    if predicate is not None:
        df = df.filter(predicate)  # before select: pushes into the scan
    if columns:
        df = df.select(*columns)
    return df


def attach_seq(df: DataFrame, order: list[str]) -> DataFrame:
    """Attach the explicit monotonic ``seq`` over a total order key.

    Delegates to ``operators.ordering.attach_global_seq`` (range partition +
    partition-local sort + driver prefix-sum offsets) — the exact global
    rank with NO single-task global sort, safe on unbounded tables. The
    total ``order`` key makes the result parallelism-independent. The cached
    intermediate is released by Spark's ContextCleaner on GC; callers inside
    a tight loop should use ``attach_global_seq`` directly and call its
    ``release()``.
    """
    from delphi_crawler_spark.operators.ordering import attach_global_seq

    out, _release = attach_global_seq(df, order)
    return out


def parse_index_records(
    records: DataFrame, field: str = "u", sep: str = r"\|", min_parts: int = 3
) -> DataFrame:
    """S1/C4/F5: split the index record field, skip malformed rows (the
    reference logs-and-drops, IndexProcessing.scala:78-99). Adds
    ``grp/art/ver`` columns; rows with fewer than ``min_parts`` fields drop.
    """
    parts = F.split(F.col(field), sep)
    return (
        records.withColumn("__p", parts)
        .filter(F.size("__p") >= min_parts)
        .withColumn("grp", F.element_at("__p", 1))
        .withColumn("art", F.element_at("__p", 2))
        .withColumn("ver", F.element_at("__p", 3))
        .drop("__p")
    )


def preflight(spark: SparkSession, paths: list[str]) -> None:
    """S11: reachability/preflight — verify every source path scans (schema
    read only, no data pass) and the session computes; abort before any
    round starts otherwise (reference Startup.scala:31-44,
    ElasticReachablePreflightCheck.scala:42-61)."""
    spark.sql("SELECT 1").collect()
    for p in paths:
        spark.read.parquet(p).schema  # raises on missing/corrupt
