"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata — the
reference's jar payloads are exactly this (raw byte streams attached to an
identifier, preprocessing/package.scala:32-44, analyzed per-doc by
HermesActor). The Spark-side contract:

    media(doc_id string, media_ref string, kind string, payload binary,
          meta struct<width:int, height:int, sample_rate:int,
                      duration_ms:int, codec:string>)

Decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages: each batch arrives as a pandas DataFrame whose
``payload`` column is bytes; the decode callable is pluggable. The
image/audio libraries are NOT in this container, so the default decoder is
a **deterministic fake** (clearly marked) that derives pseudo-features from
the payload bytes — the Spark plumbing (schema, batch shape, partitioning)
is real and tested. ``select_raster_decoder``/``select_feature_decoder``
detect pillow at runtime and route through the real decoders when present,
keeping the deterministic fake as the tested fallback.

Scale notes: payloads dominate bytes — keep them OUT of shuffles. All
transforms here are narrow (mapInPandas); anything keyed joins on doc_id
with the payload projected away first. ``spark.sql.execution.arrow.
maxRecordsPerBatch`` bounds decode batch memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = (
    "doc_id string, media_ref string, kind string, "
    "feat array<float>, payload_sha256 string, payload_bytes int"
)


def fake_decode(payload: bytes, kind: str) -> np.ndarray:
    """DETERMINISTIC FAKE decoder (container has no image/audio libs).

    Derives a 16-dim float feature from the payload digest — stable,
    collision-resistant, and shaped like a real embedding so downstream
    plumbing (similarity, dedup) is exercised for real. Production swaps
    this for PIL/librosa/ffmpeg decode + a model forward pass.
    """
    digest = hashlib.sha256(payload).digest()
    return (np.frombuffer(digest[:16], dtype=np.uint8).astype(np.float32) / 255.0)


def _try_import(name: str):
    import importlib

    try:
        return importlib.import_module(name)
    except ImportError:
        return None


def pil_decode_raster(
    payload: bytes, width: int | None, height: int | None
) -> np.ndarray:
    """REAL raster decoder via pillow (used when ``select_raster_decoder``
    finds the library at runtime): decode bytes → grayscale uint8 array.
    Undecodable payloads fall back to the deterministic fake instead of
    throwing (the engine's status-column discipline: UDFs never raise)."""
    from io import BytesIO

    from PIL import Image

    try:
        img = Image.open(BytesIO(payload or b"")).convert("L")
        return np.asarray(img, dtype=np.uint8)
    except Exception:
        return fake_decode_raster(payload, width, height)


def pil_decode_features(payload: bytes, kind: str) -> np.ndarray:
    """REAL image feature decoder via pillow: 16-bin normalized grayscale
    histogram (deterministic, embedding-shaped like the fake). Non-image
    kinds and undecodable payloads fall back to the fake."""
    from io import BytesIO

    from PIL import Image

    if kind != "image":
        return fake_decode(payload, kind)
    try:
        img = Image.open(BytesIO(payload or b"")).convert("L")
        hist, _ = np.histogram(np.asarray(img, dtype=np.uint8), bins=16, range=(0, 256))
        total = max(int(hist.sum()), 1)
        return (hist / total).astype(np.float32)
    except Exception:
        return fake_decode(payload, kind)


def select_raster_decoder() -> Callable[[bytes, int | None, int | None], np.ndarray]:
    """Route image decode through pillow when importable, else the
    deterministic fake — the engine runs identically in codec-less
    containers (the tested fallback). Selection is unit-tested."""
    if _try_import("PIL.Image") is not None:
        return pil_decode_raster
    return fake_decode_raster


def select_feature_decoder() -> Callable[[bytes, str], np.ndarray]:
    """Feature-decoder twin of ``select_raster_decoder``."""
    if _try_import("PIL.Image") is not None:
        return pil_decode_features
    return fake_decode


def extract_media_features(
    media: DataFrame,
    decode: Callable[[bytes, str], np.ndarray] = fake_decode,
) -> DataFrame:
    """Arrow-batched decode + feature extraction (mapInPandas). The batch
    loop is the vectorization boundary: decode is per payload (unavoidable
    — codecs are per-file), everything around it is columnar."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode(p if p is not None else b"", k).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "feat": feats,
                    "payload_sha256": [
                        hashlib.sha256(p if p is not None else b"").hexdigest()
                        for p in pdf["payload"]
                    ],
                    "payload_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def fake_decode_raster(payload: bytes, width: int | None, height: int | None) -> np.ndarray:
    """DETERMINISTIC FAKE raster decoder (container ships no image codecs):
    materializes a (height, width) uint8 grayscale raster by tiling the
    payload bytes. Production swaps this for PIL/libjpeg decode; everything
    downstream (the resize math, the encode, the Spark plumbing) is real."""
    w, h = int(width or 64), int(height or 64)
    buf = np.frombuffer(payload or b"\0", dtype=np.uint8)
    reps = -(-(w * h) // len(buf))  # ceil
    return np.tile(buf, reps)[: w * h].reshape(h, w)


def encode_raster(raster: np.ndarray) -> bytes:
    """Raw-raster encode (row-major uint8) — the fake codec's output format."""
    return raster.astype(np.uint8).tobytes()


def resize_raster(raster: np.ndarray, width: int, height: int) -> np.ndarray:
    """REAL nearest-neighbor resample (pure numpy, no codec needed): index
    maps per axis, gather — the standard NN kernel. Deterministic."""
    src_h, src_w = raster.shape
    yi = (np.arange(height) * src_h // height).clip(0, src_h - 1)
    xi = (np.arange(width) * src_w // width).clip(0, src_w - 1)
    return raster[yi][:, xi]


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    decode: Callable[[bytes, int | None, int | None], np.ndarray] = fake_decode_raster,
    encode: Callable[[np.ndarray], bytes] = encode_raster,
) -> DataFrame:
    """Decode → nearest-neighbor resize → encode for image rows, Arrow-
    batched (mapInPandas, narrow — payloads never shuffle). The decode/
    encode pair is pluggable; the default decoder is the clearly-marked
    deterministic fake above, while the resize kernel itself is real math
    (property: output payload is exactly the NN-gather of the decoded
    raster, len == width*height — tested)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            img = pdf[pdf["kind"] == "image"]
            if len(img) == 0:
                continue
            out_payloads = []
            src_w, src_h = [], []
            for p, m in zip(img["payload"], img["meta"]):
                w0 = m.get("width") if isinstance(m, dict) else m["width"]
                h0 = m.get("height") if isinstance(m, dict) else m["height"]
                raster = decode(p if p is not None else b"", w0, h0)
                out_payloads.append(encode(resize_raster(raster, width, height)))
                src_w.append(w0)
                src_h.append(h0)
            yield pd.DataFrame(
                {
                    "doc_id": img["doc_id"],
                    "media_ref": img["media_ref"],
                    "payload": out_payloads,
                    "width": width,
                    "height": height,
                    "src_width": pd.array(src_w, dtype="Int32"),
                    "src_height": pd.array(src_h, dtype="Int32"),
                }
            )

    return media.mapInPandas(
        run,
        schema=(
            "doc_id string, media_ref string, payload binary, "
            "width int, height int, src_width int, src_height int"
        ),
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling contract for video: emits (doc_id, media_ref, frame_ts)
    rows from meta.duration_ms — pure JVM (sequence + explode), the decode
    of actual frames being the pluggable stage above."""
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "doc_id",
        "media_ref",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts"),
    )


def synth_media(spark, docs: DataFrame, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table derived from docs' media spans
    (payload = seeded bytes from the media_ref) — test fodder only."""
    refs = (
        docs.select("doc_id", F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select("doc_id", F.col("s.media_ref").alias("media_ref"))
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, kinds, metas = [], [], []
            for ref in pdf["media_ref"]:
                h = hashlib.sha256((ref or "").encode()).digest()
                kind = ["image", "audio", "video"][h[0] % 3]
                payloads.append(h * (2 + h[1] % 4))
                kinds.append(kind)
                metas.append(
                    {
                        "width": 64 + h[2] % 192 if kind == "image" else None,
                        "height": 64 + h[3] % 192 if kind == "image" else None,
                        "sample_rate": 16000 if kind == "audio" else None,
                        "duration_ms": 1000 + h[4] * 37 if kind != "image" else None,
                        "codec": {"image": "png", "audio": "pcm", "video": "h264"}[kind],
                    }
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "kind": kinds,
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return refs.mapInPandas(gen, schema=MEDIA_SCHEMA)


# ------------------------------------------------------------- MIME sniffing
# (magic-byte prefixes, WHATWG MIME-sniffing §6 subset; RFC 2046 names).
# Hex-encoded prefix of the payload is matched against signature constants —
# pure JVM (hex + substring + startswith inside whole-stage codegen), zero
# Python, payload never leaves its partition. Condition order follows the
# WHATWG table: exact long magics first, container formats (RIFF/ftyp) with
# their discriminator bytes, then short/ambiguous magics, then the sniffed
# text classes, else application/octet-stream.
_MIME_BY_MAGIC: list[tuple[str, str]] = [
    ("89504E470D0A1A0A", "image/png"),
    ("474946383761", "image/gif"),  # GIF87a
    ("474946383961", "image/gif"),  # GIF89a
    ("FFD8FF", "image/jpeg"),
    ("255044462D", "application/pdf"),  # %PDF-
    ("504B0304", "application/zip"),
    ("4F676753", "application/ogg"),  # OggS
    ("494433", "audio/mpeg"),  # ID3
    ("1F8B", "application/gzip"),
]


def sniff_mime(payload) -> "F.Column":
    """MIME type sniffed from the payload's leading bytes. Accepts a binary
    column (or name); returns a string column. Signatures with interior
    discriminators (RIFF→WEBP/WAVE at offset 8, ISO-BMFF ``ftyp`` at offset
    4, MP3 frame-sync nibble) are matched on the hex of the first 16 bytes;
    the HTML check decodes at most 32 bytes and only runs when no binary
    magic matched (CASE WHEN short-circuit)."""
    col = F.col(payload) if isinstance(payload, str) else payload
    h = F.hex(F.substring(col, 1, 16))
    expr = None
    for magic, mime in _MIME_BY_MAGIC:
        cond = h.startswith(magic)
        expr = F.when(cond, mime) if expr is None else expr.when(cond, mime)
    riff = h.startswith("52494646")  # RIFF....<form>
    expr = expr.when(riff & (F.substring(h, 17, 8) == "57454250"), "image/webp")
    expr = expr.when(riff & (F.substring(h, 17, 8) == "57415645"), "audio/wav")
    expr = expr.when(F.substring(h, 9, 8) == "66747970", "video/mp4")  # ....ftyp
    # MP3 frame sync: FF Ex / FF Fx (11 set bits)
    expr = expr.when(
        h.startswith("FFE") | h.startswith("FFF"), "audio/mpeg"
    )
    head = F.lower(F.ltrim(F.decode(F.substring(col, 1, 32), "UTF-8")))
    expr = expr.when(
        head.startswith("<!doctype html") | head.startswith("<html"), "text/html"
    )
    return expr.otherwise("application/octet-stream")


def with_mime(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Attach the sniffed ``mime`` column — narrow, no shuffle."""
    return media.withColumn("mime", sniff_mime(payload_col))


def media_fetch_plan(
    docs: DataFrame, id_col: str = "doc_id", spans_col: str = "spans"
) -> DataFrame:
    """Fetch-once planning over interleaved media spans: the same media
    asset (``media_ref``) is typically embedded by MANY documents, and a
    crawler must fetch it exactly once — this plans that dedup. Returns one
    row per distinct referenced asset: ``(media_ref, n_refs, n_docs,
    first_doc)`` where ``first_doc`` (min doc id, a deterministic choice)
    is the designated fetch owner.

    Scale shape: explode only the (doc_id, media_ref) pair — never the
    span payloads — then two hash-aggs sharing the (media_ref, doc) grain:
    the pair-grain count partial-aggregates map-side, and the second agg is
    asset-sized, not reference-sized. No count-distinct expansion."""
    refs = (
        docs.select(
            F.col(id_col).cast("bigint").alias("doc_id"),
            F.explode(spans_col).alias("s"),
        )
        .filter((F.col("s.kind") == "media") & F.col("s.media_ref").isNotNull())
        .select("doc_id", F.col("s.media_ref").alias("media_ref"))
    )
    pairs = refs.groupBy("media_ref", "doc_id").agg(
        F.count(F.lit(1)).alias("c")
    )
    return pairs.groupBy("media_ref").agg(
        F.sum("c").cast("bigint").alias("n_refs"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min("doc_id").alias("first_doc"),
    )


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (the standard separable 2-D DCT is
    C @ X @ C.T) — pure numpy, no scipy dependency."""
    k = np.arange(n, dtype=np.float64)
    C = np.cos(np.pi * (2.0 * k[None, :] + 1.0) * k[:, None] / (2.0 * n))
    C[0, :] *= 1.0 / np.sqrt(2.0)
    return C * np.sqrt(2.0 / n)


def phash_signatures(
    media: DataFrame,
    decode: Callable[[bytes, int | None, int | None], np.ndarray] = fake_decode_raster,
    size: int = 32,
    low: int = 8,
) -> DataFrame:
    """Perceptual hash (pHash; public algorithm, Zauner 2010 / pHash.org)
    per image row: decode → nearest-neighbor resize to ``size``² → 2-D
    DCT-II → top-left ``low``×``low`` block → drop the DC term → bit i =
    (coefficient > median of the block) → a 63-bit signature in a LONG
    column named ``simhash`` so the SimHash pigeonhole pair machinery
    (``dedup_fuzzy.simhash_near_dup_pairs``) applies verbatim: image
    near-dup = small hamming distance between pHashes, robust to small
    pixel edits where the sha256 exact digest is not.

    Arrow-batched mapInPandas; the DCT, median threshold, and bit packing
    are one einsum + vectorized numpy over the whole batch (the per-row
    part is only the pluggable decode call, same as the rest of the
    multimodal family). Payloads never shuffle — only (ids, 8-byte hash)
    leave the stage.
    """
    C = _dct_matrix(size)
    weights = np.left_shift(
        np.uint64(1), np.arange(low * low - 1, dtype=np.uint64)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            img = pdf[pdf["kind"] == "image"]
            if len(img) == 0:
                continue
            rasters = np.stack(
                [
                    resize_raster(
                        decode(
                            p if p is not None else b"",
                            (m or {}).get("width"),
                            (m or {}).get("height"),
                        ),
                        size,
                        size,
                    ).astype(np.float64)
                    for p, m in zip(img["payload"], img["meta"])
                ]
            )
            d = np.einsum("ij,bjk,lk->bil", C, rasters, C)
            block = d[:, :low, :low].reshape(len(img), low * low)[:, 1:]
            med = np.median(block, axis=1, keepdims=True)
            bits = (block > med).astype(np.uint64)
            sig = (bits * weights[None, :]).sum(axis=1, dtype=np.uint64)
            yield pd.DataFrame(
                {
                    "doc_id": img["doc_id"],
                    "media_ref": img["media_ref"],
                    "simhash": sig.astype(np.int64),
                }
            )

    return media.mapInPandas(run, schema="doc_id string, media_ref string, simhash long")


def span_transition_matrix(
    docs: DataFrame, id_col: str = "doc_id", spans_col: str = "spans"
) -> DataFrame:
    """Modality transition matrix over interleaved spans: corpus-level
    counts of adjacent (kind → kind) transitions in offset order — the
    interleaving fingerprint of a multimodal corpus (text→media→text
    alternation vs media dumped in a trailing block changes how
    sequence packing and patch-token budgeting behave; this is the
    one-glance audit of that structure, companion to
    ``links.span_integrity_audit`` which checks per-row invariants).

    Per doc the spans sort by (offset, kind, text) IN-CELL (array_sort,
    no shuffle — the span-sequence invariant says offset order IS
    document order), the kind sequence zips against its own tail, and
    the exploded bigrams feed one (from,to) hash-agg plus a from-keyed
    totals join. Returns (from_kind, to_kind, n_transitions, n_docs,
    share_of_from) — share rounded 6, n_docs = docs containing that
    transition at least once."""
    ordered = F.array_sort(
        F.transform(
            F.col(spans_col),
            lambda s: F.struct(
                s["offset"].alias("o"), s["kind"].alias("k"), s["text"].alias("t")
            ),
        )
    )
    kinds = F.transform(ordered, lambda s: s["k"])
    n = F.size(kinds)
    bigrams = F.zip_with(
        F.slice(kinds, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(kinds, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("from_kind"), b.alias("to_kind")),
    )
    ex = docs.select(F.col(id_col).alias("doc_id"), F.explode(bigrams).alias("bg")).select(
        "doc_id", F.col("bg.from_kind").alias("from_kind"), F.col("bg.to_kind").alias("to_kind")
    )
    counts = ex.groupBy("from_kind", "to_kind").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_transitions"),
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
    )
    totals = counts.groupBy("from_kind").agg(
        F.sum("n_transitions").alias("from_total")
    )
    return counts.join(totals, "from_kind").select(
        "from_kind",
        "to_kind",
        "n_transitions",
        "n_docs",
        F.round(
            F.col("n_transitions").cast("double") / F.col("from_total").cast("double"),
            6,
        ).alias("share_of_from"),
    )
