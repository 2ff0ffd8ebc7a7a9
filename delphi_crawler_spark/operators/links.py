"""Link extraction from interleaved spans (reference parity: the
POM-dependency extraction, MavenDependencyActor.scala:93-99, and the
call-edge extraction entry of CallGraphStream.scala:39-127).

Input is the ``input_hint`` shape:
``(doc_id, spans array<struct<kind,text,media_ref,offset>>)``.

**Span-sequence invariant.** The reference's jar-then-pom payload identity
is order-significant; our per-row invariant is that every transform
preserves ``(kind, text, media_ref, order)`` per document. We therefore use
``posexplode`` (position = in-array order) and carry ``span_pos`` through —
never a shuffle-nondeterministic explode.

Everything here is JVM-side (posexplode + filters + higher-order array
functions); the only Python is the canonicalization pandas UDF applied to
the extracted raw URLs.

Scale: explode multiplies rows by avg spans/doc; the filter on
``kind='link'`` is applied in the same stage (whole-stage codegen), and the
span struct is pruned to the needed fields before the explode so the scan
reads only ``spans.kind/text`` + doc_id (column pruning reaches parquet).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from delphi_crawler_spark.functions.canonicalize import canonicalize_url, with_url_keys


def extract_links(docs: DataFrame) -> DataFrame:
    """docs -> (doc_id, span_pos, raw_url): one row per link span, in span
    order. ``span_pos`` is the 0-based span index (the order leg of the
    span-sequence invariant)."""
    return (
        docs.select("doc_id", F.posexplode("spans").alias("span_pos", "span"))
        .filter(F.col("span.kind") == "link")
        .select(
            "doc_id",
            "span_pos",
            F.col("span.text").alias("raw_url"),
        )
    )


def canonical_links(docs: DataFrame) -> DataFrame:
    """Extracted links, canonicalized + keyed; malformed URLs dropped (F5:
    the reference skips malformed index records with a warning,
    IndexProcessing.scala:78-99)."""
    links = extract_links(docs).withColumn("url", canonicalize_url("raw_url"))
    links = links.filter(F.col("url").isNotNull())
    return with_url_keys(links)


def span_stats(docs: DataFrame) -> DataFrame:
    """Per-doc feature map over spans (reference parity: A2/A4 — Hermes
    feature counting, HermesAnalyzer.scala:42-51). Pure higher-order array
    functions, no explode, no Python:

    n_spans, per-kind counts, total text length, n_media_refs.
    """
    spans = F.col("spans")

    def count_kind(kind: str):
        return F.size(F.filter(spans, lambda s: s["kind"] == F.lit(kind)))

    return docs.select(
        "doc_id",
        F.size(spans).alias("n_spans"),
        count_kind("text").alias("n_text"),
        count_kind("link").alias("n_link"),
        count_kind("media").alias("n_media"),
        F.aggregate(
            spans, F.lit(0), lambda acc, s: acc + F.coalesce(F.length(s["text"]), F.lit(0))
        ).alias("total_text_len"),
        F.size(F.filter(spans, lambda s: s["media_ref"].isNotNull())).alias("n_media_refs"),
    )


def feature_map(docs: DataFrame) -> DataFrame:
    """Same features as ``span_stats`` but shaped as the reference's
    ``Map[String,Int]`` feature map (HermesActor.scala:49) —
    ``map_from_entries`` keeps it one JVM expression."""
    stats = span_stats(docs)
    entries = F.array(
        *[
            F.struct(F.lit(c).alias("key"), F.col(c).alias("value"))
            for c in ["n_spans", "n_text", "n_link", "n_media", "total_text_len", "n_media_refs"]
        ]
    )
    return stats.select("doc_id", F.map_from_entries(entries).alias("features"))
