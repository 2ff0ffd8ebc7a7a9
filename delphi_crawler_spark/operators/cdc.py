"""Content-defined chunking (CDC) dedup — shift-resistant chunk dedup.

Fixed-size chunking breaks the moment one byte is inserted: every
downstream chunk boundary moves and nothing dedups. Content-DEFINED
boundaries (LBFS, Muthitacharoen SOSP'01; FastCDC, Xia ATC'16) cut where
a rolling window of the content itself satisfies a hash predicate, so an
edit only perturbs the chunks that overlap it — the rest of the document
keeps its digests and keeps deduplicating. That is the property a
100-TB training corpus needs to find *shared passages* (boilerplate,
licenses, quoted blocks, syndicated paragraphs) across documents whose
surrounding bytes differ, where whole-doc hashing (``dedup_exact_text``)
sees nothing and shingle sketches (``dedup_minhash_lsh``) only estimate.

Boundary rule (deterministic, engine-portable): a cut falls AFTER
character position ``i`` (1-based, ``i ≥ window``) iff
``md5(substr(text, i-window+1, window))`` starts with ``mask_hex`` —
the md5-hex prefix test is an exact stand-in for the classic
``gear_hash & mask == 0`` test (expected chunk length =
``16^len(mask_hex)`` chars past the window) and evaluates identically
in any engine with md5/substr, which is what lets the DuckDB oracle
replay it bit-for-bit. ``min_len`` optionally suppresses cut points
closer than ``min_len`` to the previous cut (FastCDC's normalization),
folded sequentially per doc with ``F.aggregate`` — still pure JVM.

Scale shape: everything is JVM higher-order expressions on the text
column — zero Python, zero explode of per-position rows (candidates are
an in-cell ``filter`` over a ``sequence``). Chunk TEXT never shuffles:
chunks are digested and length-measured in the same narrow projection,
and only (digest, len) pairs enter the hash-agg (partial map-side
combine). Cost is linear in corpus bytes; output is corpus-distinct
chunks.

Reference parity: the reference dedups whole artifacts by identity key
(``ElasticStoreQueries.scala:66``); chunk-grain dedup is the §2.10
training-data superset over the interleaved-span text payloads.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cdc_chunks(
    text: Column | str,
    window: int = 8,
    mask_hex: str = "0",
    min_len: int = 0,
) -> Column:
    """Array-of-chunks column: ``text`` split at content-defined cut
    points. Empty/short texts (< window+1 chars) yield one chunk (the
    whole text), zero chunks if the text is empty; nulls stay null."""
    txt = F.col(text) if isinstance(text, str) else text
    n = F.length(txt)
    w = int(window)
    cand = F.when(
        n >= F.lit(w + 1),
        F.filter(
            F.sequence(F.lit(w), n - 1),
            lambda i: F.md5(txt.substr(i - F.lit(w - 1), F.lit(w))).startswith(
                F.lit(mask_hex)
            ),
        ),
    ).otherwise(F.array().cast("array<int>"))
    if min_len > 0:
        # FastCDC-style normalization: drop candidates closer than
        # min_len to the previously KEPT cut — a sequential fold, done
        # in-cell with aggregate (acc = kept cuts so far).
        cand = F.aggregate(
            cand,
            F.array().cast("array<int>"),
            lambda acc, i: F.when(
                (F.size(acc) == 0) & (i >= F.lit(int(min_len))),
                F.array_append(acc, i),
            )
            .when(
                (F.size(acc) > 0)
                & (i - F.element_at(acc, -1) >= F.lit(int(min_len))),
                F.array_append(acc, i),
            )
            .otherwise(acc),
        )
    bounds = F.concat(F.array(F.lit(0)), cand, F.array(n))
    chunks = F.transform(
        F.sequence(F.lit(1), F.size(bounds) - 1),
        lambda k: txt.substr(
            F.element_at(bounds, k) + 1,
            F.element_at(bounds, k + 1) - F.element_at(bounds, k),
        ),
    )
    return F.filter(chunks, lambda c: F.length(c) > 0)


def cdc_chunk_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    mask_hex: str = "0",
    min_len: int = 0,
    min_occurrences: int = 2,
) -> DataFrame:
    """Corpus-wide duplicated-chunk table: one row per distinct chunk
    seen at least ``min_occurrences`` times, with its length, total
    occurrence count, and the number of distinct docs carrying it.
    Chunk text is digested BEFORE the shuffle — only (digest, len)
    pairs aggregate."""
    ch = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            cdc_chunks(F.col(text_col), window=window, mask_hex=mask_hex, min_len=min_len)
        ).alias("chunk"),
    ).select(
        "doc_id",
        F.md5(F.col("chunk")).alias("chunk_digest"),
        F.length(F.col("chunk")).cast("bigint").alias("chunk_len"),
    )
    return (
        ch.groupBy("chunk_digest", "chunk_len")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.count_distinct(F.col("doc_id")).alias("n_docs"),
        )
        .filter(F.col("n_occurrences") >= F.lit(int(min_occurrences)))
    )


def cdc_doc_dup_ratio(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    mask_hex: str = "0",
) -> DataFrame:
    """Per-doc duplication ratio: the share of a doc's chunk characters
    whose chunk digest occurs in MORE THAN ONE document — the decision
    signal for passage-level dedup policies (drop, trim, down-weight).
    Two hash-aggs sharing the chunk-digest grain; doc text shuffles
    never (digests only)."""
    ch = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(cdc_chunks(F.col(text_col), window=window, mask_hex=mask_hex)).alias(
            "chunk"
        ),
    ).select(
        "doc_id",
        F.md5(F.col("chunk")).alias("chunk_digest"),
        F.length(F.col("chunk")).cast("bigint").alias("chunk_len"),
    )
    shared = (
        ch.groupBy("chunk_digest")
        .agg(F.count_distinct(F.col("doc_id")).alias("n_docs"))
        .filter(F.col("n_docs") > 1)
        .select("chunk_digest")
    )
    # shared can be corpus-sized, so membership is a shuffled left-semi
    # on the digest key (never a broadcast).
    flag = ch.join(shared, "chunk_digest", "left_semi").select(
        "doc_id", "chunk_len", F.lit(True).alias("is_shared")
    )
    tot = ch.groupBy("doc_id").agg(F.sum("chunk_len").alias("total_chars"))
    dup = flag.groupBy("doc_id").agg(F.sum("chunk_len").alias("dup_chars"))
    out = tot.join(dup, "doc_id", "left").select(
        "doc_id",
        "total_chars",
        F.coalesce(F.col("dup_chars"), F.lit(0)).alias("dup_chars"),
        F.round(
            F.coalesce(F.col("dup_chars"), F.lit(0)) / F.col("total_chars"), 6
        ).alias("dup_ratio"),
    )
    return out


def _gear_table() -> "np.ndarray":
    """Deterministic 256-entry gear table: splitmix64 of the byte value
    (Steele/Lea mixing constants — public domain), vectorized uint64."""
    import numpy as np

    with np.errstate(over="ignore"):
        x = (np.arange(256, dtype=np.uint64) + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(1)
        z = x.copy()
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z


def _gear_hash_bytes(data: bytes, table) -> "np.ndarray":
    """Rolling gear hash at every byte position, fully vectorized: the
    gear recurrence h_{i} = (h_{i-1} << 1) + gear[b_i] unrolls to
    h_i = Σ_{j=0}^{63} gear[b_{i-j}] << j (older bytes shift out of the
    64-bit lane automatically), so 64 shifted vector adds replace the
    per-byte sequential loop — O(1) amortized per byte with numpy
    constants, the FastCDC-class fast path."""
    import numpy as np

    b = np.frombuffer(data, dtype=np.uint8)
    g = table[b]
    h = np.zeros(len(b), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(64):
            if j >= len(b):
                break
            h[j:] += g[: len(b) - j if j else len(b)] << np.uint64(j)
    return h


def gear_cut_points(data: bytes, table, bits: int = 8,
                    min_len: int = 64, max_len: int = 1024) -> list[int]:
    """FastCDC-style cut offsets (exclusive byte positions) for one
    document: cut after byte i when the gear hash's low ``bits`` are
    zero (expected chunk 2^bits bytes), suppressed below ``min_len``
    since the previous cut, with a forced cut at ``max_len``."""
    import numpy as np

    n = len(data)
    if n == 0:
        return []
    h = _gear_hash_bytes(data, table)
    mask = np.uint64((1 << bits) - 1)
    cand = np.flatnonzero((h & mask) == 0) + 1  # cut AFTER position i
    cuts: list[int] = []
    last = 0
    ci = 0
    m = len(cand)
    while last < n:
        # next natural cut at >= last+min_len, else forced at last+max_len
        while ci < m and cand[ci] < last + min_len:
            ci += 1
        nxt = int(cand[ci]) if ci < m else n
        forced = last + max_len
        cut = min(nxt, forced, n)
        if cut <= last:
            cut = min(last + max_len, n)
        cuts.append(cut)
        last = cut
    return cuts


def gear_chunk_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 8,
    min_len: int = 64,
    max_len: int = 1024,
    min_occurrences: int = 2,
) -> DataFrame:
    """Corpus duplicated-chunk table on the GEAR fast path: same output
    contract as ``cdc_chunk_stats`` but O(1)/byte hashing (64 shifted
    vector adds per Arrow batch) instead of one md5 per position — the
    variant to run at 100 TB. The md5-gated variant stays as the
    engine-portable oracle twin; this one is pinned by property tests
    (losslessness, min/max bounds, shift resistance) instead of SQL.

    Chunking operates on UTF-8 BYTES (multibyte-safe: chunks are byte
    slices, digested directly), emitted from ``mapInPandas`` as
    (doc_id, digest, len) — chunk bytes never leave the executor."""
    import hashlib

    import pandas as pd

    schema = "doc_id long, chunk_digest string, chunk_len long"

    def emit(batches):
        table = _gear_table()
        for pdf in batches:
            ids, digs, lens = [], [], []
            for did, txt in zip(pdf[id_col], pdf[text_col]):
                if txt is None:
                    continue
                data = txt.encode("utf-8")
                last = 0
                for cut in gear_cut_points(data, table, bits, min_len, max_len):
                    ids.append(did)
                    digs.append(hashlib.md5(data[last:cut]).hexdigest())
                    lens.append(cut - last)
                    last = cut
            yield pd.DataFrame(
                {"doc_id": ids, "chunk_digest": digs, "chunk_len": lens}
            )

    ch = docs.select(id_col, text_col).mapInPandas(emit, schema=schema)
    return (
        ch.groupBy("chunk_digest", "chunk_len")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.count_distinct(F.col("doc_id")).alias("n_docs"),
        )
        .filter(F.col("n_occurrences") >= F.lit(int(min_occurrences)))
    )
