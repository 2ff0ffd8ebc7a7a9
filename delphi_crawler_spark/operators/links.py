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


# every integer feature span_stats emits, in one place so feature_map, the
# schema registry, and the oracles stay aligned (the reference declares its
# ≈250-field feature space up-front, ElasticFeatureListMapping.scala:33-426;
# ours is the span-derivable subset, computed — not just declared)
SPAN_INT_FEATURES = [
    "n_spans",
    "n_text",
    "n_link",
    "n_media",
    "n_media_refs",
    "n_empty_text",
    "n_kind_switches",
    "n_distinct_kinds",
    "total_text_len",
    "text_len_text",
    "text_len_link",
    "text_len_media",
    "min_text_len",
    "max_text_len",
    "min_offset",
    "max_offset",
]
SPAN_OTHER_FEATURES = [
    "mean_text_len",
    "link_density",
    "media_density",
    "first_kind",
    "last_kind",
]


def span_stats(docs: DataFrame, keep_spans: bool = False) -> DataFrame:
    """Per-doc feature computation over spans (reference parity: A2/A4 —
    Hermes feature counting, HermesAnalyzer.scala:42-51; the declared field
    breadth of ElasticFeatureListMapping.scala:33-426 scaled to what spans
    support). Pure higher-order array functions — no explode, no shuffle,
    no Python; the whole projection is one whole-stage-codegen stage
    (plan-audited).

    Emits ``SPAN_INT_FEATURES`` (counts, per-kind text lengths, offset
    bounds, interleaving switches) + ``SPAN_OTHER_FEATURES`` (densities,
    mean length, first/last kind). Ratios are rounded to 6 decimals so the
    DuckDB oracles compare exactly.
    """
    spans = F.col("spans")
    kinds = F.transform(spans, lambda s: s["kind"])
    lens = F.transform(spans, lambda s: F.coalesce(F.length(s["text"]), F.lit(0)))
    offs = F.transform(spans, lambda s: s["offset"])
    n = F.size(spans)
    pair_len = F.greatest(n - 1, F.lit(0))
    switches = F.aggregate(
        F.zip_with(
            F.slice(kinds, 1, pair_len),
            F.slice(kinds, 2, pair_len),
            lambda a, b: (a != b).cast("int"),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )

    def count_kind(kind: str):
        return F.size(F.filter(spans, lambda s: s["kind"] == F.lit(kind)))

    def text_len_kind(kind: str):
        return F.aggregate(
            F.filter(spans, lambda s: s["kind"] == F.lit(kind)),
            F.lit(0),
            lambda acc, s: acc + F.coalesce(F.length(s["text"]), F.lit(0)),
        )

    total_len = F.aggregate(
        spans, F.lit(0), lambda acc, s: acc + F.coalesce(F.length(s["text"]), F.lit(0))
    )
    return docs.select(
        "doc_id",
        n.alias("n_spans"),
        count_kind("text").alias("n_text"),
        count_kind("link").alias("n_link"),
        count_kind("media").alias("n_media"),
        F.size(F.filter(spans, lambda s: s["media_ref"].isNotNull())).alias("n_media_refs"),
        F.size(
            F.filter(spans, lambda s: F.coalesce(F.length(s["text"]), F.lit(0)) == 0)
        ).alias("n_empty_text"),
        switches.alias("n_kind_switches"),
        F.size(F.array_distinct(kinds)).alias("n_distinct_kinds"),
        total_len.alias("total_text_len"),
        text_len_kind("text").alias("text_len_text"),
        text_len_kind("link").alias("text_len_link"),
        text_len_kind("media").alias("text_len_media"),
        F.coalesce(F.array_min(lens), F.lit(0)).alias("min_text_len"),
        F.coalesce(F.array_max(lens), F.lit(0)).alias("max_text_len"),
        F.coalesce(F.array_min(offs), F.lit(0)).alias("min_offset"),
        F.coalesce(F.array_max(offs), F.lit(0)).alias("max_offset"),
        F.when(n > 0, F.round(total_len / n, 6)).otherwise(F.lit(0.0)).alias("mean_text_len"),
        F.when(n > 0, F.round(count_kind("link") / n, 6)).otherwise(F.lit(0.0)).alias("link_density"),
        F.when(n > 0, F.round(count_kind("media") / n, 6)).otherwise(F.lit(0.0)).alias("media_density"),
        F.coalesce(F.element_at(kinds, 1), F.lit("")).alias("first_kind"),
        F.coalesce(F.element_at(kinds, -1), F.lit("")).alias("last_kind"),
        *([spans.alias("spans")] if keep_spans else []),
    )


# --------------------------------------------------------------- wide space
# The per-kind × per-metric cross product (reference precedent: ≈250 typed
# fields in ElasticFeatureListMapping.scala:33-426; here every bytecode-
# opcode-style count maps to a span-domain metric). Field name = {kind}_{m}.
SPAN_KINDS = ["text", "link", "media"]
WIDE_KIND_INT_METRICS = [
    "n_empty", "min_len", "max_len", "median_len", "sum_len_sq",
    "n_distinct", "n_dup", "min_off", "max_off", "off_span",
    "first_pos", "last_pos", "len_short", "len_mid", "len_long",
]
WIDE_KIND_DOUBLE_METRICS = ["mean_len", "share_len"]
WIDE_GLOBAL_INT_FEATURES = [
    "n_offset_inversions", "offsets_monotonic", "n_runs", "median_text_len",
]
WIDE_GLOBAL_DOUBLE_FEATURES = ["text_density"]
V4_INT_FEATURES = [
    f"{k}_{m}" for k in SPAN_KINDS for m in WIDE_KIND_INT_METRICS
] + WIDE_GLOBAL_INT_FEATURES
V4_DOUBLE_FEATURES = [
    f"{k}_{m}" for k in SPAN_KINDS for m in WIDE_KIND_DOUBLE_METRICS
] + WIDE_GLOBAL_DOUBLE_FEATURES

# v5 block: the second widening pass toward the reference's full ~250-field
# breadth (ElasticFeatureListMapping.scala:33-426). Positional statistics,
# per-kind character-class totals, a 10-bucket length histogram, run/gap
# structure, and the 3×3 kind-transition matrix — each metric is computed by
# the operator AND independently re-expressed in the DuckDB oracle.
V5_KIND_INT_METRICS = [
    "first_len", "last_len", "p25_len", "p75_len", "len_range",
    "n_unique_lens", "n_even_len", "n_odd_len", "sum_pos", "pos_span",
    "max_gap", "min_gap", "n_runs", "n_first_half",
    "n_with_digit", "n_digits", "n_vowels", "n_alpha", "n_nonalnum",
    "n_vowel_start", "n_digit_start",
] + [f"len_h{j}" for j in range(10)]
V5_KIND_DOUBLE_METRICS = ["share_spans", "mean_pos", "std_len"]
V5_GLOBAL_INT_FEATURES = [
    f"n_trans_{a}_{b}" for a in SPAN_KINDS for b in SPAN_KINDS
] + [
    "argmax_len_pos", "argmin_len_pos", "n_len_increases",
    "n_len_decreases", "n_len_plateaus", "total_len_sq", "n_unique_lens_all",
]
V5_GLOBAL_DOUBLE_FEATURES = ["std_text_len"]
V5_INT_FEATURES = [
    f"{k}_{m}" for k in SPAN_KINDS for m in V5_KIND_INT_METRICS
] + V5_GLOBAL_INT_FEATURES
V5_DOUBLE_FEATURES = [
    f"{k}_{m}" for k in SPAN_KINDS for m in V5_KIND_DOUBLE_METRICS
] + V5_GLOBAL_DOUBLE_FEATURES

WIDE_INT_FEATURES = V4_INT_FEATURES + V5_INT_FEATURES
WIDE_DOUBLE_FEATURES = V4_DOUBLE_FEATURES + V5_DOUBLE_FEATURES


def span_stats_wide(docs: DataFrame) -> DataFrame:
    """``span_stats`` widened with the per-kind × per-metric cross product —
    the engine's answer to the reference's ~250-field declared feature space
    (ElasticFeatureListMapping.scala:33-426; schema v5 declares 217 fields).
    Still one narrow zero-exchange projection of higher-order array
    functions: per kind the spans collapse to one filtered struct array
    reused by every metric; no explode, no shuffle, no Python (higher-order
    array expressions evaluate JVM-side outside whole-stage codegen —
    plan-audited: Exchange count 0).

    v4 per kind: empty/length extrema, lower-median and sum-of-squares of
    text lengths, distinct/duplicate text counts, offset extrema and span,
    first/last position (1-based; 0 = kind absent; offsets -1 = absent),
    length-bucket histogram (1-4 / 5-8 / 9+), mean length and share of total
    text length. v4 globals: text-kind density, offset inversion count /
    monotonicity, run count (kind switches + 1), global median length.

    v5 per kind: first/last/quartile lengths, length range/parity/unique
    counts, position sum/span/gaps/runs, first-half occupancy, character-
    class totals (digits/vowels/alpha/non-alnum; digit- and vowel-start
    counts), a 10-bucket length histogram, span share, mean position, and
    population std of lengths. v5 globals: the 3×3 kind-transition matrix,
    argmax/argmin length positions, length increase/decrease/plateau counts,
    total squared length, distinct-length count, and global length std.
    Ratios round to 6 decimals (oracle-compare convention)."""
    spans = F.col("spans")
    n = F.size(spans)
    # two chained projections (Catalyst collapses them): base stats with the
    # spans column retained, then the wide cross product over the same array
    # — one codegen stage, no join, no shuffle
    base = span_stats(docs.select("doc_id", "spans"), keep_spans=True)
    indexed = F.transform(
        spans,
        lambda s, i: F.struct(
            s["kind"].alias("k"),
            F.coalesce(F.length(s["text"]), F.lit(0)).alias("l"),
            F.coalesce(s["text"], F.lit("")).alias("t"),
            s["offset"].alias("o"),
            (i + 1).cast("int").alias("p"),
        ),
    )
    cols: list = []
    for kind in SPAN_KINDS:
        ek = F.filter(indexed, lambda e: e["k"] == F.lit(kind))
        lens = F.transform(ek, lambda e: e["l"])
        texts = F.transform(ek, lambda e: e["t"])
        offs = F.transform(ek, lambda e: e["o"])
        ps = F.transform(ek, lambda e: e["p"])
        cnt = F.size(ek)
        sum_len = F.coalesce(
            F.aggregate(lens, F.lit(0), lambda a, x: a + x), F.lit(0)
        )
        sum_len_sq = F.aggregate(lens, F.lit(0), lambda a, x: a + x * x)
        sum_pos = F.coalesce(
            F.aggregate(ps, F.lit(0), lambda a, x: a + x), F.lit(0)
        )
        kpair = F.greatest(cnt - 1, F.lit(0))
        gaps = F.zip_with(
            F.slice(ps, 1, kpair), F.slice(ps, 2, kpair), lambda a, b: b - a
        )
        ndist = F.size(F.array_distinct(texts))

        def char_total(pattern: str):
            # total chars of a class = sum of lengths after stripping its
            # complement (mirrors the oracle's regexp_replace(...,'g') form)
            return F.aggregate(
                texts,
                F.lit(0),
                lambda a, t: a + F.length(F.regexp_replace(t, pattern, "")),
            )
        cols += [
            F.size(F.filter(lens, lambda x: x == 0)).alias(f"{kind}_n_empty"),
            F.coalesce(F.array_min(lens), F.lit(0)).alias(f"{kind}_min_len"),
            F.coalesce(F.array_max(lens), F.lit(0)).alias(f"{kind}_max_len"),
            F.when(
                cnt > 0,
                F.element_at(
                    F.array_sort(lens), F.ceil(cnt / 2.0).cast("int")
                ),
            ).otherwise(F.lit(0)).alias(f"{kind}_median_len"),
            F.aggregate(lens, F.lit(0), lambda a, x: a + x * x).alias(
                f"{kind}_sum_len_sq"
            ),
            ndist.alias(f"{kind}_n_distinct"),
            (cnt - ndist).alias(f"{kind}_n_dup"),
            F.when(cnt > 0, F.array_min(offs)).otherwise(F.lit(-1)).alias(
                f"{kind}_min_off"
            ),
            F.when(cnt > 0, F.array_max(offs)).otherwise(F.lit(-1)).alias(
                f"{kind}_max_off"
            ),
            F.when(cnt > 0, F.array_max(offs) - F.array_min(offs))
            .otherwise(F.lit(0))
            .alias(f"{kind}_off_span"),
            F.coalesce(F.array_min(ps), F.lit(0)).alias(f"{kind}_first_pos"),
            F.coalesce(F.array_max(ps), F.lit(0)).alias(f"{kind}_last_pos"),
            F.size(F.filter(lens, lambda x: (x >= 1) & (x <= 4))).alias(
                f"{kind}_len_short"
            ),
            F.size(F.filter(lens, lambda x: (x >= 5) & (x <= 8))).alias(
                f"{kind}_len_mid"
            ),
            F.size(F.filter(lens, lambda x: x >= 9)).alias(f"{kind}_len_long"),
            F.when(cnt > 0, F.round(sum_len / cnt, 6))
            .otherwise(F.lit(0.0))
            .alias(f"{kind}_mean_len"),
            F.when(
                F.col("total_text_len") > 0,
                F.round(sum_len / F.col("total_text_len"), 6),
            )
            .otherwise(F.lit(0.0))
            .alias(f"{kind}_share_len"),
        ]
        # v5 per-kind block
        cols += [
            # try_element_at: per-kind arrays can be empty (ANSI element_at
            # throws on out-of-bounds instead of returning NULL)
            F.coalesce(F.try_element_at(lens, F.lit(1)), F.lit(0)).alias(
                f"{kind}_first_len"
            ),
            F.coalesce(F.try_element_at(lens, F.lit(-1)), F.lit(0)).alias(
                f"{kind}_last_len"
            ),
            F.when(
                cnt > 0,
                F.element_at(F.array_sort(lens), F.ceil(cnt / 4.0).cast("int")),
            ).otherwise(F.lit(0)).alias(f"{kind}_p25_len"),
            F.when(
                cnt > 0,
                F.element_at(
                    F.array_sort(lens), F.ceil(cnt * 3 / 4.0).cast("int")
                ),
            ).otherwise(F.lit(0)).alias(f"{kind}_p75_len"),
            F.when(cnt > 0, F.array_max(lens) - F.array_min(lens))
            .otherwise(F.lit(0))
            .alias(f"{kind}_len_range"),
            F.size(F.array_distinct(lens)).alias(f"{kind}_n_unique_lens"),
            F.size(F.filter(lens, lambda x: x % 2 == 0)).alias(
                f"{kind}_n_even_len"
            ),
            F.size(F.filter(lens, lambda x: x % 2 == 1)).alias(
                f"{kind}_n_odd_len"
            ),
            sum_pos.alias(f"{kind}_sum_pos"),
            F.when(cnt > 0, F.array_max(ps) - F.array_min(ps))
            .otherwise(F.lit(0))
            .alias(f"{kind}_pos_span"),
            F.coalesce(F.array_max(gaps), F.lit(0)).alias(f"{kind}_max_gap"),
            F.coalesce(F.array_min(gaps), F.lit(0)).alias(f"{kind}_min_gap"),
            F.when(cnt > 0, F.size(F.filter(gaps, lambda g: g > 1)) + 1)
            .otherwise(F.lit(0))
            .alias(f"{kind}_n_runs"),
            F.size(
                F.filter(ps, lambda p: p <= F.ceil(n / 2.0).cast("int"))
            ).alias(f"{kind}_n_first_half"),
            F.size(F.filter(texts, lambda t: t.rlike("[0-9]"))).alias(
                f"{kind}_n_with_digit"
            ),
            char_total("[^0-9]").alias(f"{kind}_n_digits"),
            char_total("[^aeiouAEIOU]").alias(f"{kind}_n_vowels"),
            char_total("[^A-Za-z]").alias(f"{kind}_n_alpha"),
            char_total("[A-Za-z0-9]").alias(f"{kind}_n_nonalnum"),
            F.size(F.filter(texts, lambda t: t.rlike("^[aeiouAEIOU]"))).alias(
                f"{kind}_n_vowel_start"
            ),
            F.size(F.filter(texts, lambda t: t.rlike("^[0-9]"))).alias(
                f"{kind}_n_digit_start"
            ),
            *[
                F.size(
                    F.filter(
                        lens,
                        (lambda lo, hi: lambda x: (x >= lo) & (x <= hi))(
                            2 * j + 1, 2 * j + 2
                        ),
                    )
                ).alias(f"{kind}_len_h{j}")
                for j in range(9)
            ],
            F.size(F.filter(lens, lambda x: x >= 19)).alias(f"{kind}_len_h9"),
            F.when(n > 0, F.round(cnt / n, 6))
            .otherwise(F.lit(0.0))
            .alias(f"{kind}_share_spans"),
            F.when(cnt > 0, F.round(sum_pos / cnt, 6))
            .otherwise(F.lit(0.0))
            .alias(f"{kind}_mean_pos"),
            F.when(
                cnt > 0,
                F.round(
                    F.sqrt(
                        F.greatest(
                            sum_len_sq / cnt - (sum_len / cnt) * (sum_len / cnt),
                            F.lit(0.0),
                        )
                    ),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias(f"{kind}_std_len"),
        ]
    all_lens = F.transform(spans, lambda s: F.coalesce(F.length(s["text"]), F.lit(0)))
    all_offs = F.transform(spans, lambda s: s["offset"])
    pair_len = F.greatest(n - 1, F.lit(0))
    inversions = F.aggregate(
        F.zip_with(
            F.slice(all_offs, 1, pair_len),
            F.slice(all_offs, 2, pair_len),
            lambda a, b: (b < a).cast("int"),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    cols += [
        inversions.alias("n_offset_inversions"),
        (inversions == 0).cast("int").alias("offsets_monotonic"),
        F.when(n > 0, F.col("n_kind_switches") + 1).otherwise(F.lit(0)).alias(
            "n_runs"
        ),
        F.when(
            n > 0,
            F.element_at(F.array_sort(all_lens), F.ceil(n / 2.0).cast("int")),
        ).otherwise(F.lit(0)).alias("median_text_len"),
        F.when(n > 0, F.round(F.col("n_text") / n, 6))
        .otherwise(F.lit(0.0))
        .alias("text_density"),
    ]
    # v5 global block
    all_kinds = F.transform(spans, lambda s: s["kind"])
    k_prev = F.slice(all_kinds, 1, pair_len)
    k_next = F.slice(all_kinds, 2, pair_len)
    l_prev = F.slice(all_lens, 1, pair_len)
    l_next = F.slice(all_lens, 2, pair_len)
    total_len_sq = F.aggregate(all_lens, F.lit(0), lambda a, x: a + x * x)
    total_len = F.aggregate(all_lens, F.lit(0), lambda a, x: a + x)
    cols += [
        *[
            F.aggregate(
                F.zip_with(
                    k_prev,
                    k_next,
                    (
                        lambda ka, kb: lambda x, y: (
                            (x == F.lit(ka)) & (y == F.lit(kb))
                        ).cast("int")
                    )(a, b),
                ),
                F.lit(0),
                lambda acc, x: acc + x,
            ).alias(f"n_trans_{a}_{b}")
            for a in SPAN_KINDS
            for b in SPAN_KINDS
        ],
        F.when(n > 0, F.array_position(all_lens, F.array_max(all_lens)))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("argmax_len_pos"),
        F.when(n > 0, F.array_position(all_lens, F.array_min(all_lens)))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("argmin_len_pos"),
        F.aggregate(
            F.zip_with(l_prev, l_next, lambda x, y: (y > x).cast("int")),
            F.lit(0),
            lambda acc, x: acc + x,
        ).alias("n_len_increases"),
        F.aggregate(
            F.zip_with(l_prev, l_next, lambda x, y: (y < x).cast("int")),
            F.lit(0),
            lambda acc, x: acc + x,
        ).alias("n_len_decreases"),
        F.aggregate(
            F.zip_with(l_prev, l_next, lambda x, y: (y == x).cast("int")),
            F.lit(0),
            lambda acc, x: acc + x,
        ).alias("n_len_plateaus"),
        total_len_sq.alias("total_len_sq"),
        F.size(F.array_distinct(all_lens)).alias("n_unique_lens_all"),
        F.when(
            n > 0,
            F.round(
                F.sqrt(
                    F.greatest(
                        total_len_sq / n - (total_len / n) * (total_len / n),
                        F.lit(0.0),
                    )
                ),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("std_text_len"),
    ]
    base_names = ["doc_id"] + SPAN_INT_FEATURES + SPAN_OTHER_FEATURES
    return base.select(*base_names, *cols)


def feature_map(docs: DataFrame, wide: bool = False) -> DataFrame:
    """The integer features of ``span_stats`` shaped as the reference's
    ``Map[String,Int]`` feature map (HermesActor.scala:49) —
    ``map_from_entries`` keeps it one JVM expression. ``wide=True`` maps the
    full declared integer feature space (``WIDE_INT_FEATURES`` too) — the
    breadth analogue of the reference's full mapping list."""
    if wide:
        stats = span_stats_wide(docs)
        names = SPAN_INT_FEATURES + WIDE_INT_FEATURES
    else:
        stats = span_stats(docs)
        names = SPAN_INT_FEATURES
    entries = F.array(
        *[
            F.struct(F.lit(c).alias("key"), F.col(c).cast("int").alias("value"))
            for c in names
        ]
    )
    return stats.select("doc_id", F.map_from_entries(entries).alias("features"))


def render_spans(
    docs: DataFrame,
    sep: str = " ",
    media_prefix: str = "[MEDIA:",
    media_suffix: str = "]",
) -> DataFrame:
    """Render interleaved spans into flat training text: text/link spans
    contribute their text, media spans a typed placeholder carrying the
    ref (``[MEDIA:m://...]``) — the standard interleaved-multimodal →
    LM-input flattening, preserving the span-sequence invariant (the
    placeholder sits exactly where the media sat).

    Defensive ordering: spans are re-sorted by ``offset`` with an
    ``array_sort`` comparator even though the invariant guarantees input
    order — a renderer must not silently depend on upstream discipline.
    All JVM higher-order functions: no explode, no shuffle, no Python."""
    ordered = F.array_sort(
        F.col("spans"), lambda a, b: (a["offset"] - b["offset"]).cast("int")
    )
    piece = lambda s: F.when(  # noqa: E731
        s["kind"] == "media",
        F.concat(
            F.lit(media_prefix), F.coalesce(s["media_ref"], F.lit("")), F.lit(media_suffix)
        ),
    ).otherwise(F.coalesce(s["text"], F.lit("")))
    rendered = F.concat_ws(sep, F.transform(ordered, piece))
    return docs.select("doc_id", rendered.alias("rendered"))


def anchor_context(docs: DataFrame) -> DataFrame:
    """One row per link span with its anchor context: the text of the
    nearest PRECEDING text span in the same document (``''`` when the link
    opens the document). Anchor/context text is the classic crawl-ordering
    and target-description signal (Cho/Garcia-Molina/Page '98 §3 "anchor
    text"; the reference's analogue is the POM context carried next to each
    extracted dependency edge, MavenDependencyActor.scala:93-99).

    Single-pass ``F.aggregate`` fold over the span array — the accumulator
    carries (last text-span text, emitted (target, ctx) pairs), so the scan
    of each document is O(spans), stays inside the JVM, and needs no
    explode-then-window shuffle. Span order is the array order (the
    span-sequence invariant), exactly what a window over ``span_pos`` would
    give. Output rows appear via one ``explode`` of the folded pair array.

    Scale: narrow per-row fold (no shuffle at all); the downstream
    ``anchor_context_agg`` hash-agg is the only exchange.
    """
    # typed empty pair array: slice(len 1, take 0) of a dummy element keeps
    # the element type without relying on a void-array cast
    empty_pairs = F.slice(
        F.array(F.struct(F.lit("").alias("target"), F.lit("").alias("ctx"))), 1, 0
    )
    acc0 = F.struct(F.lit("").alias("last_text"), empty_pairs.alias("out"))
    step = lambda acc, s: F.struct(  # noqa: E731
        F.when(s["kind"] == "text", F.coalesce(s["text"], acc["last_text"]))
        .otherwise(acc["last_text"])
        .alias("last_text"),
        F.when(
            s["kind"] == "link",
            F.concat(
                acc["out"],
                F.array(
                    F.struct(
                        F.coalesce(s["text"], F.lit("")).alias("target"),
                        acc["last_text"].alias("ctx"),
                    )
                ),
            ),
        )
        .otherwise(acc["out"])
        .alias("out"),
    )
    folded = F.aggregate(F.col("spans"), acc0, step)
    return docs.select("doc_id", F.explode(folded["out"]).alias("p")).select(
        "doc_id", F.col("p.target").alias("target"), F.col("p.ctx").alias("ctx")
    )


def anchor_context_agg(docs: DataFrame) -> DataFrame:
    """Per-target anchor aggregation over ``anchor_context``: in-link count,
    distinct source docs, total context length, and a deterministic sample
    context (lexicographic min). One hash-agg shuffle keyed by target — the
    partial aggregate (map-side combine) does the heavy lifting, so the
    exchange carries one row per (partition, target)."""
    return (
        anchor_context(docs)
        .groupBy("target")
        .agg(
            F.count(F.lit(1)).alias("n_inlinks"),
            F.countDistinct("doc_id").alias("n_src_docs"),
            F.sum(F.length("ctx")).alias("ctx_total_len"),
            F.min("ctx").alias("sample_ctx"),
        )
    )


def caption_pairs(docs: DataFrame) -> DataFrame:
    """One row per MEDIA span paired with its caption: the text of the
    NEAREST text span in the same document by span offset, preceding span
    preferred on distance ties (the image-alt/figure-caption pairing every
    interleaved text+media training corpus needs — LAION-style alt-text
    harvesting generalized to span sequences; north-rule input shape).
    Documents with media but no text spans emit the pair with null
    caption so downstream filters can count uncaptioned media.

    Like ``anchor_context`` this never explodes-then-windows: two JVM
    array folds per document — a forward fold carrying the last text span
    (nearest preceding) and a fold over ``reverse(spans)`` carrying the
    next one — are stitched by a per-row ``map_from_entries`` lookup on
    media offset, then ONE explode emits the pairs. O(spans) per row, no
    shuffle at all; the span-sequence invariant (array order = document
    order) is what makes the fold equal to the sort-based plan.

    Returns (doc_id, media_ref, media_off, caption, caption_off, dist).
    """
    intN = F.lit(None).cast("int")
    strN = F.lit(None).cast("string")
    empty = F.slice(
        F.array(
            F.struct(
                F.lit(0).cast("int").alias("m_off"),
                F.lit("").alias("media_ref"),
                intN.alias("t_off"),
                strN.alias("t_txt"),
            )
        ),
        1,
        0,
    )

    def fold(arr):
        acc0 = F.struct(intN.alias("off"), strN.alias("txt"), empty.alias("out"))
        step = lambda acc, s: F.struct(  # noqa: E731
            F.when(s["kind"] == "text", s["offset"]).otherwise(acc["off"]).alias("off"),
            F.when(s["kind"] == "text", s["text"]).otherwise(acc["txt"]).alias("txt"),
            F.when(
                s["kind"] == "media",
                F.concat(
                    acc["out"],
                    F.array(
                        F.struct(
                            s["offset"].alias("m_off"),
                            s["media_ref"].alias("media_ref"),
                            acc["off"].alias("t_off"),
                            acc["txt"].alias("t_txt"),
                        )
                    ),
                ),
            )
            .otherwise(acc["out"])
            .alias("out"),
        )
        return F.aggregate(arr, acc0, step)["out"]

    # order by offset first (like render_spans): the folds then see document
    # order even if a producer shuffled the array
    ordered = F.array_sort(
        F.col("spans"),
        lambda l, r: F.when(l["offset"] < r["offset"], F.lit(-1))
        .when(l["offset"] > r["offset"], F.lit(1))
        .otherwise(F.lit(0)),
    )
    fwd = fold(ordered)
    rev = fold(F.reverse(ordered))
    nmap = F.map_from_entries(
        F.transform(
            rev,
            lambda s: F.struct(
                s["m_off"].alias("key"),
                F.struct(s["t_off"].alias("off"), s["t_txt"].alias("txt")).alias("value"),
            ),
        )
    )
    pairs = F.transform(
        fwd,
        lambda s: F.struct(
            s["m_off"].alias("media_off"),
            s["media_ref"].alias("media_ref"),
            s["t_off"].alias("prev_off"),
            s["t_txt"].alias("prev_txt"),
            F.element_at(nmap, s["m_off"])["off"].alias("next_off"),
            F.element_at(nmap, s["m_off"])["txt"].alias("next_txt"),
        ),
    )
    row = docs.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id",
        F.col("p.media_ref").alias("media_ref"),
        F.col("p.media_off").alias("media_off"),
        "p.prev_off",
        "p.prev_txt",
        "p.next_off",
        "p.next_txt",
    )
    use_prev = F.col("prev_off").isNotNull() & (
        F.col("next_off").isNull()
        | (F.col("media_off") - F.col("prev_off") <= F.col("next_off") - F.col("media_off"))
    )
    caption_off = F.when(use_prev, F.col("prev_off")).otherwise(F.col("next_off"))
    caption = F.when(use_prev, F.col("prev_txt")).otherwise(F.col("next_txt"))
    return row.select(
        "doc_id",
        "media_ref",
        "media_off",
        caption.alias("caption"),
        caption_off.alias("caption_off"),
        F.abs(F.col("media_off") - caption_off).alias("dist"),
    )


def rel_canonical_resolve(
    docs: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fold duplicate page identities along <link rel="canonical"> — the
    page's own declaration of which URL is the real one (the public REP
    canonicalization signal; Google/Bing published semantics). A crawl
    that ignores it stores every print/mobile/tracking variant as a
    separate document; a training pipeline then dedups what the site
    already told us was one page.

    Per doc: canonical_url = declared href when present else own url;
    rel = 'none' (no tag) / 'self' (declares itself) / 'cross' (points
    elsewhere). n_aliases = how many docs fold into the same canonical
    identity — the dedup cluster size this signal alone produces (the
    redirect-chain and content-digest signals compose on top:
    ``redirects.resolve_redirects``, ``dedup_fuzzy``).

    Shape: one JVM regexp projection (no Python), then ONE hash-agg on
    canonical_url joined back — the same single-shuffle grain as the
    first-occurrence dedup. Canonical targets at web scale are skewed
    (site front pages); the agg is partial-aggregating so hot targets
    combine map-side.
    """
    href = F.regexp_extract(
        F.col(html_col), '<link rel="canonical" href="([^"]*)"', 1
    )
    per_doc = docs.select(
        F.col(id_col),
        F.col(url_col).alias("url"),
        F.coalesce(F.nullif(href, F.lit("")), F.col(url_col)).alias("canonical_url"),
        F.when(href == "", F.lit("none"))
        .when(href == F.col(url_col), F.lit("self"))
        .otherwise(F.lit("cross"))
        .alias("rel"),
    )
    sizes = per_doc.groupBy("canonical_url").agg(
        F.count(F.lit(1)).alias("n_aliases")
    )
    return per_doc.join(sizes, "canonical_url").select(
        id_col, "url", "canonical_url", "rel", F.col("n_aliases").cast("bigint").alias("n_aliases")
    )


def span_integrity_audit(docs: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Per-document audit of the interleaved-span invariant (the
    north-rule input contract: ``spans:array<struct<kind,text,media_ref,
    offset>>`` with meaningful order): counts of (1) non-increasing
    adjacent offsets, (2) unknown kinds (∉ {text, link, media}), and
    (3) media_ref mismatches (a media span must carry a ref; a non-media
    span must not). ``is_valid`` gates ingestion — the engine's analogue
    of the reference's span-sequence equality check (jar-then-pom
    identity, MavenArtifact.scala:21) as a data-quality operator.

    Zero shuffle: three in-cell JVM higher-order passes per row; compose
    it into any scan for free and aggregate violations at whatever grain
    the monitoring sink wants."""
    s = F.col(spans_col)
    n = F.size(s)
    offs = F.transform(s, lambda e: e["offset"])
    off_viol = F.when(
        n >= 2,
        F.size(
            F.filter(
                F.zip_with(
                    F.slice(offs, 1, n - 1),
                    F.slice(offs, 2, n - 1),
                    lambda a, b: b <= a,
                ),
                lambda x: x,
            )
        ),
    ).otherwise(F.lit(0))
    kind_viol = F.size(
        F.filter(s, lambda e: ~e["kind"].isin("text", "link", "media"))
    )
    ref_viol = F.size(
        F.filter(
            s, lambda e: (e["kind"] == "media") != e["media_ref"].isNotNull()
        )
    )
    return docs.select(
        "doc_id",
        n.cast("bigint").alias("n_spans"),
        off_viol.cast("bigint").alias("n_offset_viol"),
        kind_viol.cast("bigint").alias("n_kind_viol"),
        ref_viol.cast("bigint").alias("n_mediaref_viol"),
        (
            (off_viol == 0) & (kind_viol == 0) & (ref_viol == 0)
        ).alias("is_valid"),
    )
