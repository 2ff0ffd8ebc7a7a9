"""Corpus scrubbing: HTML boilerplate stripping, PII redaction, and
benchmark decontamination.

Three passes every production pretraining pipeline runs between the crawl
and the tokenizer, absent from both the reference (whose documents are
Maven POMs/JARs, not web pages — IndexProcessing.scala parses identifiers
only) and Spark's built-ins:

- **HTML strip**: drop script/style subtrees, tags, and entities to get
  the visible text. Pure JVM ``regexp_replace`` chain (codegen'd, no
  Python): at 100 TB this runs at scan speed as a narrow projection. The
  patterns stay in the RE2-compatible subset (no backreferences or
  lookaround) so SQL engines replicate them byte-for-byte.

- **PII scrub**: redact emails, phone numbers, and IPv4 addresses with
  typed placeholder tokens, and count each kind (the counts feed quality
  filtering — a doc that is mostly PII is usually a directory page, not
  prose). Same JVM regexp chain; ordering matters (emails before phones:
  a phone regex must not eat the digits of user1234@host) and is pinned
  by tests and the oracle.

- **Decontamination**: flag documents whose shingles overlap a benchmark
  (eval-set) corpus — the n-gram-collision rule used for public-eval
  hygiene (e.g. GPT-3 appendix C; 13-gram standard, parameterizable).
  Scale shape: the benchmark side collapses to DISTINCT shingle hashes —
  tiny relative to the corpus (evals are MBs, the corpus is TBs) — so the
  corpus-side semi-join broadcasts; per-doc overlap counts partially
  aggregate map-side on (doc, gram-hit). Never a cross join; the corpus
  side is one explode → join → hash-agg pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

__all__ = ["html_strip_col", "pii_scrub", "decontaminate"]

# RE2-compatible (and Java-regex-compatible) patterns only — shared with
# the DuckDB oracles, so keep to the common subset: no lookaround, no
# backreferences, no possessive quantifiers.
_TAG_RE = r"(?s)<[^>]*>"
_ENTITY_RE = r"&[a-zA-Z]{1,10};|&#[0-9]{1,7};"
_WS_RE = r"\s+"

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+?[0-9][0-9()\-. ]{7,}[0-9]"
_IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"


def html_strip_col(text: Column | str) -> Column:
    """Visible text of an HTML fragment: script/style subtrees removed,
    tags removed, entities collapsed to a space, whitespace normalized.

    Script/style removal avoids the backreference form (RE2 engines lack
    backreferences) by handling the two tag names explicitly — the chain
    is identical in Java regex and RE2, so SQL oracles match exactly."""
    c = F.col(text) if isinstance(text, str) else text
    c = F.regexp_replace(c, r"(?is)<script[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, r"(?is)<style[^>]*>.*?</style>", " ")
    c = F.regexp_replace(c, _TAG_RE, " ")
    c = F.regexp_replace(c, _ENTITY_RE, " ")
    c = F.regexp_replace(c, _WS_RE, " ")
    return F.trim(c)


def pii_scrub(
    df: DataFrame, text_col: str = "text", out_col: str = "text_scrubbed"
) -> DataFrame:
    """Redact emails → <EMAIL>, IPv4s → <IP>, phone-like digit runs →
    <PHONE>; add per-kind match counts. Order is load-bearing: emails
    first (their local part can look like a phone run), then IPs (dotted
    digits would otherwise match the phone pattern), then phones."""
    c = F.col(text_col)
    n_email = F.size(F.regexp_extract_all(c, F.lit(_EMAIL_RE), 0))
    c1 = F.regexp_replace(c, _EMAIL_RE, "<EMAIL>")
    n_ip = F.size(F.regexp_extract_all(c1, F.lit(_IPV4_RE), 0))
    c2 = F.regexp_replace(c1, _IPV4_RE, "<IP>")
    n_phone = F.size(F.regexp_extract_all(c2, F.lit(_PHONE_RE), 0))
    c3 = F.regexp_replace(c2, _PHONE_RE, "<PHONE>")
    return df.withColumns(
        {
            out_col: c3,
            "n_emails": n_email.cast("bigint"),
            "n_ips": n_ip.cast("bigint"),
            "n_phones": n_phone.cast("bigint"),
        }
    )


def _shingles(text: Column, n: int) -> Column:
    """Distinct lowercase word n-grams as strings (JVM higher-order fns);
    shorter-than-n docs yield their whole text as the single shingle —
    same convention as dedup_fuzzy's gram sets."""
    ws = F.split(F.lower(F.trim(text)), r"\s+")
    k = F.size(ws)
    grams = F.transform(
        F.sequence(F.lit(0), k - F.lit(n)),
        lambda i: F.array_join(F.slice(ws, i + 1, n), " "),
    )
    return F.array_distinct(
        F.when(k < n, F.array(F.array_join(ws, " "))).otherwise(grams)
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 13,
    min_hits: int = 1,
) -> DataFrame:
    """Per-corpus-doc count of shingles that also occur anywhere in the
    benchmark corpus; docs with ``>= min_hits`` are contaminated.

    Returns (id_col, n_shingles, n_hits, contaminated). The benchmark side
    reduces to DISTINCT shingles before the join (eval sets are small) and
    is broadcast; corpus shingles explode once and partially aggregate
    map-side after the semi-hit join.
    """
    bench_grams = (
        benchmark.select(F.explode(_shingles(F.col(text_col), shingle_n)).alias("g"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    doc_grams = corpus.select(
        F.col(id_col), F.explode(_shingles(F.col(text_col), shingle_n)).alias("g")
    )
    hits = (
        doc_grams.join(broadcast(bench_grams), "g", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.coalesce(F.sum("_hit"), F.lit(0)).cast("bigint").alias("n_hits"),
        )
    )
    return hits.withColumn("contaminated", (F.col("n_hits") >= min_hits).cast("bigint"))


def boilerplate_strip(
    df: DataFrame,
    text_col: str = "text",
    min_chars: int = 30,
    min_words: int = 5,
    min_alpha_ratio: float = 0.6,
    max_symbol_ratio: float = 0.05,
) -> DataFrame:
    """Line-density boilerplate removal — the justext/trafilatura-family
    heuristic reduced to its language-independent core: a line survives iff
    it is long enough (``min_chars``), has enough words (``min_words``),
    is mostly letters+spaces (``min_alpha_ratio``), AND is nearly
    punctuation-free (``max_symbol_ratio`` — nav bars and breadcrumb
    trails are wordy but separator-ridden, so the symbol cap is what
    actually catches them; timestamps and footers fail the other three).
    Applied after ``html_strip_col`` in a text pipeline (strip gives text;
    this decides which LINES of it are content).

    Adds ``content`` (surviving lines, newline-joined), ``n_lines_kept``,
    ``n_lines_total``. Pure JVM (split + higher-order filter + regexp
    inside the lambda, whole-stage codegen) — no shuffle, no Python; the
    regex chain is the RE2-compatible subset shared with the DuckDB
    oracles."""
    c = F.col(text_col)
    lines = F.split(c, r"\n")
    alpha_len = lambda s: F.length(  # noqa: E731
        F.regexp_replace(s, r"[^A-Za-z ]", "")
    )
    words = lambda s: F.size(F.split(F.trim(s), r"\s+"))  # noqa: E731
    symbol_len = lambda s: F.length(  # noqa: E731
        F.regexp_replace(s, r"[A-Za-z0-9 ]", "")
    )
    keep = lambda s: (  # noqa: E731
        (F.length(s) >= min_chars)
        & (words(s) >= min_words)
        & (alpha_len(s) >= F.length(s) * min_alpha_ratio)
        & (symbol_len(s) <= F.length(s) * max_symbol_ratio)
    )
    kept = F.filter(lines, keep)
    return df.withColumns(
        {
            "content": F.array_join(kept, "\n"),
            "n_lines_kept": F.size(kept).cast("long"),
            "n_lines_total": F.size(lines).cast("long"),
        }
    )


def template_segments(
    docs: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_words: int = 5,
    min_ratio: float = 0.5,
    min_docs: int = 2,
) -> DataFrame:
    """Corpus-level boilerplate discovery: fixed-width word segments that
    repeat across most documents of a host are site template (nav bars,
    footers, cookie banners), not content — the cross-document frequency
    idea behind Onion's duplicate-paragraph cleaning (Pomikálek 2011) and
    CC-Net's per-shard dedup of common lines, applied per host. Unlike
    ``boilerplate_strip`` (rule-per-line, single doc), this learns the
    template FROM the corpus, so it catches site-specific furniture no
    static rule knows.

    Segmentation is deterministic: the whitespace-token stream is cut into
    non-overlapping ``seg_words``-word segments (tail shorter than
    ``seg_words`` kept). A segment is template for a host when it appears
    in ≥ ``min_ratio`` of that host's docs and ≥ ``min_docs`` docs.

    Spark shape: one explode of per-doc DISTINCT segments (array_distinct
    before the explode, so a segment repeated inside one doc counts once)
    → one (host, segment) partial-aggregating hash-agg + one (host) doc
    count — grain O(docs × segments/doc), the same explode grain the
    n-gram dedup family already carries; no joins wider than host. Output:
    (host, segment, n_docs, host_docs, doc_ratio), template rows only.
    """
    if seg_words < 1:
        raise ValueError(f"seg_words must be >= 1: {seg_words}")
    ws = F.split(F.trim(F.col(text_col)), r"\s+")
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size(ws) - 1, F.lit(0)),
        F.lit(seg_words),
    )
    segs = F.array_distinct(
        F.transform(
            starts, lambda i: F.array_join(F.slice(ws, i + 1, seg_words), " ")
        )
    )
    per_doc = docs.select(
        F.col(host_col).alias("host"),
        F.col(id_col).alias("_doc"),
        F.explode(segs).alias("segment"),
    ).where(F.col("segment") != "")
    host_docs = docs.groupBy(F.col(host_col).alias("host")).agg(
        F.count_distinct(F.col(id_col)).alias("host_docs")
    )
    seg_counts = per_doc.groupBy("host", "segment").agg(
        F.count_distinct("_doc").alias("n_docs")
    )
    return (
        seg_counts.join(host_docs, "host")
        .where(
            (F.col("n_docs") >= F.lit(int(min_docs)))
            & (
                F.col("n_docs").cast("double")
                >= F.lit(float(min_ratio)) * F.col("host_docs")
            )
        )
        .select(
            "host",
            "segment",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("host_docs").cast("bigint").alias("host_docs"),
            (F.col("n_docs").cast("double") / F.col("host_docs")).alias("doc_ratio"),
        )
    )
