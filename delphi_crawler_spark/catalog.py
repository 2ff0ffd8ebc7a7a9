"""SQL catalog surface: register the engine's tables as Spark SQL views.

The reference exposes its state as queryable Elasticsearch indices
(ElasticIndexMaintenance.scala:30 bootstraps them; users query by name).
The Spark-native
equivalent is the session catalog: one call registers every parquet table
of a dataset directory — plus the engine's derived interleaved-spans view —
and from there the full engine surface is reachable from ``spark.sql``
(every ``oracle_sql()`` query in ``__spark_entry__`` is ANSI enough to run
against these views with minor dialect shims; the DataFrame operators
compose with them directly via ``spark.table``).

Views are lazy: registration reads only schemas. Catalyst still sees the
parquet scans underneath, so filter pushdown / column pruning on
``spark.sql("SELECT url FROM documents WHERE lang = 'en'")`` behave exactly
as the DataFrame path (a pytest pins PushedFilters on a view query).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def register_tables(
    spark: SparkSession,
    sf_dir: str,
    tables: tuple[str, ...] = TABLES,
    prefix: str = "",
) -> list[str]:
    """Register each ``<sf_dir>/<table>.parquet`` as a temp view named
    ``<prefix><table>``. Missing files are skipped (a dataset directory
    need not carry every table). Returns the view names registered."""
    out: list[str] = []
    for t in tables:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(path):
            continue
        name = f"{prefix}{t}"
        spark.read.parquet(path).createOrReplaceTempView(name)
        out.append(name)
    return out


def register_spans_view(
    spark: SparkSession, docs_view: str = "documents", name: str = "document_spans"
) -> str:
    """Register the shared interleaved-spans derivation (the A2/A4 input
    model: kind = word length mod 3, offset = word index) as a view over
    an already-registered documents view — the input_hint table shape
    (doc_id, spans array<struct<kind,text,media_ref,offset>>) available
    to plain SQL."""
    docs = spark.table(docs_view)
    words = F.split(F.col("text"), r"\s+")
    spans = F.transform(
        words,
        lambda w, i: F.struct(
            F.when(F.length(w) % 3 == 0, F.lit("text"))
            .when(F.length(w) % 3 == 1, F.lit("link"))
            .otherwise(F.lit("media"))
            .alias("kind"),
            w.alias("text"),
            F.when(F.length(w) % 3 == 2, F.concat(F.lit("m://"), i)).alias(
                "media_ref"
            ),
            i.cast("int").alias("offset"),
        ),
    )
    df: DataFrame = docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"), spans.alias("spans")
    )
    df.createOrReplaceTempView(name)
    return name
