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
