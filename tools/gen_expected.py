"""Generate expected-output parquet for queries whose values are not
SQL-expressible in DuckDB (seeded sketches, Spark-specific hashes).

Independent implementation discipline (VERDICT round 1, task 4): everything
here is plain Python/numpy over the raw parquet inputs — no PySpark, no
imports from the engine's operators. Algorithm PARAMETERS that define the
operator's identity (hash seeds, mix constants, rng draws, plane seeds) are
necessarily shared; the PIPELINE (joins, banding, blocking, windows,
ordering) is re-derived with per-document loops so a bug in the Spark
dataflow cannot self-confirm.

Hash primitives are re-implemented from their public specifications:
- Murmur3 x86_32 in Spark's byte-tail variant (each trailing byte gets a
  full mix round — org.apache.spark.unsafe.hash.Murmur3_x86_32)
- XXH64 per the reference spec (Spark's XxHash64 follows it; longs hash as
  their 8 little-endian bytes)

Outputs land in expected/sf{X}/<query>.parquet; oracle_sql() reads them via
DuckDB read_parquet. Run: python tools/gen_expected.py
"""

from __future__ import annotations

import hashlib
import os
import re
import struct
import sys
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the scalar canonicalizer is shared deliberately: it is the engine's
# semantic source of truth, pinned byte-for-byte by golden-vector tests
from delphi_crawler_spark.functions.canonicalize import canonicalize_url_py

MASK32 = 0xFFFFFFFF
MASK64 = 0xFFFFFFFFFFFFFFFF


# ---------------------------------------------------------------- murmur3_32
def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & MASK32


def _mix_k1(k1: int) -> int:
    k1 = (k1 * 0xCC9E2D51) & MASK32
    k1 = _rotl32(k1, 15)
    return (k1 * 0x1B873593) & MASK32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl32(h1, 13)
    return (h1 * 5 + 0xE6546B64) & MASK32


def murmur3_32_spark(data: bytes, seed: int = 42) -> int:
    """Spark's Murmur3_x86_32.hashUnsafeBytes: 4-byte little-endian words,
    then each TAIL BYTE (sign-extended) mixed as a full round — this differs
    from vanilla murmur3's tail handling. Returns signed int32."""
    h1 = seed & MASK32
    n_words = len(data) // 4
    for i in range(n_words):
        (w,) = struct.unpack_from("<i", data, i * 4)
        h1 = _mix_h1(h1, _mix_k1(w & MASK32))
    for i in range(n_words * 4, len(data)):
        b = data[i]
        if b >= 128:
            b -= 256  # sign-extended byte
        h1 = _mix_h1(h1, _mix_k1(b & MASK32))
    h1 ^= len(data)
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & MASK32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & MASK32
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


# -------------------------------------------------------------------- xxh64
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _xxh_round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & MASK64
    acc = _rotl64(acc, 31)
    return (acc * _P1) & MASK64


def _xxh_merge(acc: int, v: int) -> int:
    acc ^= _xxh_round(0, v)
    return (acc * _P1 + _P4) & MASK64


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 per spec (matches Spark's xxhash64 on UTF-8 string bytes).
    Returns signed int64."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & MASK64
        v2 = (seed + _P2) & MASK64
        v3 = seed & MASK64
        v4 = (seed - _P1) & MASK64
        while i <= n - 32:
            l1, l2, l3, l4 = struct.unpack_from("<QQQQ", data, i)
            v1, v2 = _xxh_round(v1, l1), _xxh_round(v2, l2)
            v3, v4 = _xxh_round(v3, l3), _xxh_round(v4, l4)
            i += 32
        acc = (_rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)) & MASK64
        for v in (v1, v2, v3, v4):
            acc = _xxh_merge(acc, v)
    else:
        acc = (seed + _P5) & MASK64
    acc = (acc + n) & MASK64
    while i <= n - 8:
        (l,) = struct.unpack_from("<Q", data, i)
        acc ^= _xxh_round(0, l)
        acc = (_rotl64(acc, 27) * _P1 + _P4) & MASK64
        i += 8
    if i <= n - 4:
        (w,) = struct.unpack_from("<I", data, i)
        acc ^= (w * _P1) & MASK64
        acc = (_rotl64(acc, 23) * _P2 + _P3) & MASK64
        i += 4
    while i < n:
        acc ^= (data[i] * _P5) & MASK64
        acc = (_rotl64(acc, 11) * _P1) & MASK64
        i += 1
    acc ^= acc >> 33
    acc = (acc * _P2) & MASK64
    acc ^= acc >> 29
    acc = (acc * _P3) & MASK64
    acc ^= acc >> 32
    return acc - (1 << 64) if acc >= (1 << 63) else acc


def xxh64_long(v: int, seed: int = 42) -> int:
    """Spark xxhash64 of a LongType value = XXH64 of its 8 LE bytes."""
    return xxh64(struct.pack("<q", v), seed)


def xxh64_str(s: str, seed: int = 42) -> int:
    return xxh64(s.encode("utf-8"), seed)


# ------------------------------------------------------------ shared helpers
def round_half_up6(x: float) -> float:
    """Spark F.round(double, 6): BigDecimal on the shortest decimal repr of
    the double (Double.toString semantics == python repr), HALF_UP."""
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def fold_cosine(a, b) -> float:
    """cosine_col's exact IEEE op order: left-fold dot + left-fold norms."""
    dot = 0.0
    for x, y in zip(a, b):
        dot = dot + float(x) * float(y)
    na = 0.0
    for x in a:
        na = na + float(x) * float(x)
    nb = 0.0
    for y in b:
        nb = nb + float(y) * float(y)
    import math

    denom = max(math.sqrt(na) * math.sqrt(nb), 1e-12)
    return dot / denom


def ws_split(text: str) -> list[str]:
    """F.split(lower(trim(t)), '\\s+') semantics."""
    return re.split(r"\s+", text.strip().lower())


_HOST_RE = re.compile(r"^[a-z][a-z0-9+.\-]*://([^/:?#]+)")

# parameters shared with the operators by identity (seeds/constants)
_HASH_KEY = "delphi_crawl_16b"
_GRAM_MIX = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9],
    dtype=np.uint64,
)
MERSENNE_P = (1 << 61) - 1


def token_hashes(tokens: list[str]) -> np.ndarray:
    """Per-token deterministic hash — pandas' public vectorized string hash
    (a library primitive, position-independent, same per token everywhere)."""
    if not tokens:
        return np.zeros(0, dtype=np.uint64)
    return pd.util.hash_pandas_object(
        pd.Series(tokens), index=False, hash_key=_HASH_KEY
    ).to_numpy(dtype=np.uint64)


def doc_grams(tokens: list[str], n: int = 3) -> np.ndarray:
    """Distinct mixed n-gram hashes for ONE document (plain loop).
    uint64 wraparound is the intended arithmetic."""
    np.seterr(over="ignore")
    th = token_hashes(tokens)
    if len(th) == 0:
        return np.zeros(0, dtype=np.uint64)
    out = []
    if len(th) >= n:
        for i in range(len(th) - n + 1):
            g = np.uint64(0)
            for j in range(n):
                g ^= th[i + j] * _GRAM_MIX[j]
            out.append(g)
    else:
        g = np.uint64(0)
        for j in range(len(th)):
            g ^= th[j] * _GRAM_MIX[j]
        out.append(g)
    return np.unique(np.array(out, dtype=np.uint64))


def simhash_of(tokens: list[str]) -> int:
    """64-bit simhash of one document (bit-vote loop). Signed int64."""
    th = token_hashes(tokens)
    votes = [0] * 64
    for h in th.tolist():
        for b in range(64):
            votes[b] += 1 if (h >> b) & 1 else -1
    v = 0
    for b in range(64):
        if votes[b] > 0:
            v |= 1 << b
    return v - (1 << 64) if v >= (1 << 63) else v


# ================================================================== queries
def gen_c3_hash_keys(docs: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for r in docs.itertuples():
        d = int(r.doc_id)
        k = str(d % 7)
        m = d % 4
        if m == 0:
            raw = f"HTTPS://WWW.Example{k}.COM:443/a/./b/../{r.source}/page{d}?b=2&a=1#frag"
        elif m == 1:
            raw = f"http://host{k}.example.org:8080/x y/${{v}}/p{d}"
        elif m == 2:
            raw = "ftp://bad.example.com/nope"
        else:
            raw = f"https://Host{k}.Example.IO/p{d}/"
        url = canonicalize_url_py(raw)
        if url is None:
            continue
        host = _HOST_RE.match(url).group(1)
        rows.append(
            {
                "doc_id": d,
                "url": url,
                "host": host,
                "host_rev": ".".join(reversed(host.split("."))),
                "url_hash": murmur3_32_spark(url.encode("utf-8")),
                "url_hash64": xxh64_str(url),
            }
        )
    out = pd.DataFrame(rows)
    return out.astype({"doc_id": "int64", "url_hash": "int64", "url_hash64": "int64"})


def gen_fingerprint_rolling(docs: pd.DataFrame, window: int = 4, keep: int = 8) -> pd.DataFrame:
    rows = []
    for r in docs.itertuples():
        words = ws_split(r.text)
        n = max(len(words) - (window - 1), 1)
        grams = [xxh64_str(" ".join(words[i : i + window])) for i in range(n)]
        kept = sorted(grams)[:keep]  # signed int64 asc == Spark array_sort
        fp = hashlib.md5(",".join(str(h) for h in kept).encode()).hexdigest()
        rows.append({"doc_id": int(r.doc_id), "fp": fp})
    return pd.DataFrame(rows).astype({"doc_id": "int64"})


def gen_dedup_simhash(docs: pd.DataFrame, max_hamming: int = 8) -> pd.DataFrame:
    sigs = []
    for r in docs.itertuples():
        sigs.append((int(r.doc_id), simhash_of(str(r.text).lower().split())))
    rows = []
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            (ia, sa), (ib, sb) = sigs[i], sigs[j]
            h = bin((sa ^ sb) & MASK64).count("1")
            if h <= max_hamming:
                a, b = (ia, ib) if ia < ib else (ib, ia)
                rows.append({"id_a": a, "id_b": b, "hamming": h})
    out = pd.DataFrame(rows, columns=["id_a", "id_b", "hamming"])
    return out.astype({"id_a": "int64", "id_b": "int64", "hamming": "int64"})


def gen_dedup_minhash_lsh(
    docs: pd.DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
    seed: int = 42,
) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE_P, size=num_hashes, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, MERSENNE_P, size=num_hashes, dtype=np.uint64)
    rpb = num_hashes // bands

    ids, sig_list = [], []
    for r in docs.itertuples():
        grams = doc_grams(str(r.text).lower().split(), shingle_n)
        if len(grams):
            sig = (a[:, None] * grams[None, :] + b[:, None]).min(axis=1)
        else:
            sig = np.zeros(num_hashes, dtype=np.uint64)
        ids.append(int(r.doc_id))
        sig_list.append(sig.view(np.int64))

    # banding: bucket key = xxh64 of the comma-joined signed band slice
    buckets: dict[tuple[int, int], list[int]] = {}
    for did, sig in zip(ids, sig_list):
        for bi in range(bands):
            key = ",".join(str(int(v)) for v in sig[bi * rpb : (bi + 1) * rpb])
            buckets.setdefault((bi, xxh64_str(key)), []).append(did)
    cand = set()
    for members in buckets.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                cand.add((ms[i], ms[j]))

    # exact jaccard verify on word 3-gram STRING sets (regex-split semantics)
    def gramset(text: str) -> set[str]:
        words = ws_split(text)
        n = max(len(words) - (shingle_n - 1), 1)
        return {" ".join(words[i : i + shingle_n]) for i in range(n)}

    gsets = {int(r.doc_id): gramset(str(r.text)) for r in docs.itertuples()}
    losers = set()
    for ia, ib in cand:
        inter = len(gsets[ia] & gsets[ib])
        union = len(gsets[ia] | gsets[ib])
        if round_half_up6(inter / max(union, 1)) >= threshold:
            losers.add(ib)
    keep = sorted(d for d in ids if d not in losers)
    return pd.DataFrame({"doc_id": keep}).astype({"doc_id": "int64"})


def gen_dedup_minhash_incr(
    docs: pd.DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
    seed: int = 42,
) -> pd.DataFrame:
    """Independent replication of the incremental-LSH query: same
    signatures/banding as gen_dedup_minhash_lsh, candidate pairs filtered
    to those touching a NEW doc (doc_id % 4 == 0), exact Jaccard >= 0.5
    kept with the pair's rounded score."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE_P, size=num_hashes, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, MERSENNE_P, size=num_hashes, dtype=np.uint64)
    rpb = num_hashes // bands

    ids, sig_list = [], []
    for r in docs.itertuples():
        grams = doc_grams(str(r.text).lower().split(), shingle_n)
        if len(grams):
            sig = (a[:, None] * grams[None, :] + b[:, None]).min(axis=1)
        else:
            sig = np.zeros(num_hashes, dtype=np.uint64)
        ids.append(int(r.doc_id))
        sig_list.append(sig.view(np.int64))

    buckets: dict[tuple[int, int], list[int]] = {}
    for did, sig in zip(ids, sig_list):
        for bi in range(bands):
            key = ",".join(str(int(v)) for v in sig[bi * rpb : (bi + 1) * rpb])
            buckets.setdefault((bi, xxh64_str(key)), []).append(did)
    cand = set()
    for members in buckets.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                if ms[i] % 4 == 0 or ms[j] % 4 == 0:  # touches a new doc
                    cand.add((ms[i], ms[j]))

    def gramset(text: str) -> set[str]:
        words = ws_split(text)
        n = max(len(words) - (shingle_n - 1), 1)
        return {" ".join(words[i : i + shingle_n]) for i in range(n)}

    gsets = {int(r.doc_id): gramset(str(r.text)) for r in docs.itertuples()}
    rows = []
    for ia, ib in sorted(cand):
        inter = len(gsets[ia] & gsets[ib])
        union = len(gsets[ia] | gsets[ib])
        jac = round_half_up6(inter / max(union, 1))
        if jac >= threshold:
            rows.append({"id_a": ia, "id_b": ib, "jaccard": jac})
    out = pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard"])
    return out.astype({"id_a": "int64", "id_b": "int64", "jaccard": "float64"})


def gen_mm_phash_neardup(
    docs: pd.DataFrame,
    size: int = 32,
    low: int = 8,
    max_hamming: int = 10,
) -> pd.DataFrame:
    """Independent replication of the pHash near-dup query: the fake-codec
    byte-tiling raster (part of the synthetic data contract), NN resize +
    DCT re-derived here (the DCT batch einsum keeps the impl's IEEE op
    order, the fold_cosine precedent), banding/pairing as per-pair loops
    with the pigeonhole radius re-checked by exact hamming."""
    n = size

    k = np.arange(n, dtype=np.float64)
    C = np.cos(np.pi * (2.0 * k[None, :] + 1.0) * k[:, None] / (2.0 * n))
    C[0, :] *= 1.0 / np.sqrt(2.0)
    C = C * np.sqrt(2.0 / n)

    ids, rasters = [], []
    texts = {int(r.doc_id): str(r.text) for r in docs.itertuples()}
    for did in sorted(texts):
        canon = texts[did - did % 5]
        payload = (chr(ord("a") + did % 5) + canon[1:]).encode("utf-8")
        buf = np.frombuffer(payload or b"\0", dtype=np.uint8)
        reps = -(-(64 * 64) // len(buf))
        full = np.tile(buf, reps)[: 64 * 64].reshape(64, 64)
        yi = (np.arange(size) * 64 // size).clip(0, 63)
        xi = (np.arange(size) * 64 // size).clip(0, 63)
        rasters.append(full[yi][:, xi].astype(np.float64))
        ids.append(did)
    R = np.stack(rasters)
    d = np.einsum("ij,bjk,lk->bil", C, R, C)
    block = d[:, :low, :low].reshape(len(ids), low * low)[:, 1:]
    med = np.median(block, axis=1, keepdims=True)
    bits = (block > med).astype(np.uint64)
    weights = np.left_shift(np.uint64(1), np.arange(low * low - 1, dtype=np.uint64))
    sigs = (bits * weights[None, :]).sum(axis=1, dtype=np.uint64)

    # pigeonhole banding (blocks = max_hamming + 1, 64 bits split with the
    # first `extra` blocks one bit wider), then exact hamming verify
    blocks = max_hamming + 1
    base, extra = divmod(64, blocks)
    bounds, off = [], 0
    for i in range(blocks):
        w = base + (1 if i < extra else 0)
        bounds.append((off, w))
        off += w
    by_bucket: dict[tuple[int, int], list[int]] = {}
    for idx, s in enumerate(sigs):
        for bi, (o, w) in enumerate(bounds):
            ck = int((int(s) >> o) & ((1 << w) - 1))
            by_bucket.setdefault((bi, ck), []).append(idx)
    cand = set()
    for members in by_bucket.values():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                x, y = members[i], members[j]
                if ids[x] > ids[y]:
                    x, y = y, x
                cand.add((x, y))
    rows = []
    for x, y in sorted(cand):
        h = bin(int(sigs[x]) ^ int(sigs[y])).count("1")
        if h <= max_hamming:
            rows.append({"id_a": ids[x], "id_b": ids[y], "hamming": h})
    out = pd.DataFrame(rows, columns=["id_a", "id_b", "hamming"])
    return out.astype({"id_a": "int64", "id_b": "int64", "hamming": "int64"})


def gen_dedup_embedding_lsh(
    emb: pd.DataFrame,
    threshold: float = 0.35,
    n_planes: int = 8,
    bands: int = 4,
    seed: int = 42,
) -> pd.DataFrame:
    m = np.stack(emb["embedding"].map(np.asarray).to_list()).astype(np.float64)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((bands * n_planes, m.shape[1]))
    bits = (m @ planes.T) > 0
    bits = bits.reshape(len(m), bands, n_planes)
    weights = 1 << np.arange(n_planes)
    bkt = (bits * weights[None, None, :]).sum(2).astype(np.int64)
    ids = emb["vec_id"].astype("int64").to_numpy()
    vecs = emb["embedding"].to_list()

    cand = set()
    for bi in range(bands):
        by_bucket: dict[int, list[int]] = {}
        for idx in range(len(ids)):
            by_bucket.setdefault(int(bkt[idx, bi]), []).append(idx)
        for members in by_bucket.values():
            for i in range(len(members)):
                for j in range(i + 1, len(members)):
                    x, y = members[i], members[j]
                    if ids[x] > ids[y]:
                        x, y = y, x
                    cand.add((x, y))
    rows = []
    for x, y in cand:
        cos = round_half_up6(fold_cosine(vecs[x], vecs[y]))
        if cos >= threshold:
            rows.append({"id_a": int(ids[x]), "id_b": int(ids[y]), "cosine": cos})
    out = pd.DataFrame(rows, columns=["id_a", "id_b", "cosine"])
    return out.astype({"id_a": "int64", "id_b": "int64", "cosine": "float64"})


def gen_sim_ivf_topk(
    emb: pd.DataFrame,
    k: int = 10,
    nlist: int = 8,
    nprobe: int = 4,
    sample_size: int = 10_000,
    seed: int = 42,
) -> pd.DataFrame:
    ids = emb["vec_id"].astype("int64").to_numpy()
    vecs = emb["embedding"].to_list()
    m = np.stack([np.asarray(v) for v in vecs]).astype(np.float64)

    def normalize(x):
        return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)

    # deterministic training sample: hash-ordered TakeOrdered
    order = sorted(range(len(ids)), key=lambda i: (xxh64_long(int(ids[i])), int(ids[i])))
    sample_idx = order[:sample_size]
    mat = normalize(m[sample_idx])
    # spherical k-means, seeded init, 5 iterations
    rng = np.random.default_rng(seed)
    centroids = mat[rng.choice(len(mat), size=min(nlist, len(mat)), replace=False)]
    for _ in range(5):
        assign = (mat @ centroids.T).argmax(1)
        for c in range(len(centroids)):
            pts = mat[assign == c]
            if len(pts):
                centroids[c] = pts.mean(0)
        centroids = normalize(centroids)

    mn = normalize(m)
    list_id = (mn @ centroids.T).argmax(1).astype(np.int32)
    q_idx = [i for i in range(len(ids)) if ids[i] < 8]
    rows = []
    for qi in q_idx:
        probes = (-(mn[qi : qi + 1] @ centroids.T)).argsort(1)[0, :nprobe].astype(np.int32)
        cands = [i for i in range(len(ids)) if list_id[i] in set(int(p) for p in probes)]
        scored = [
            (round_half_up6(fold_cosine(vecs[i], vecs[qi])), int(ids[i])) for i in cands
        ]
        scored.sort(key=lambda t: (-t[0], t[1]))
        for rank, (cos, vid) in enumerate(scored[:k], start=1):
            rows.append(
                {"query_id": int(ids[qi]), "rank": rank, "vec_id": vid, "cosine": cos}
            )
    out = pd.DataFrame(rows, columns=["query_id", "rank", "vec_id", "cosine"])
    return out.astype(
        {"query_id": "int64", "rank": "int64", "vec_id": "int64", "cosine": "float64"}
    )


def gen_dedup_semantic(
    emb: pd.DataFrame,
    n_clusters: int = 8,
    threshold: float = 0.35,
    sample_size: int = 10_000,
    seed: int = 42,
) -> pd.DataFrame:
    """Independent replication of operators/semantic.py:semantic_dedup —
    per-row loops instead of the Spark joins; same algorithm parameters
    (hash-ordered sample, seeded spherical k-means, 5 iterations)."""
    ids = emb["vec_id"].astype("int64").to_numpy()
    vecs = emb["embedding"].to_list()
    m = np.stack([np.asarray(v) for v in vecs]).astype(np.float64)

    def normalize(x):
        return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)

    order = sorted(range(len(ids)), key=lambda i: (xxh64_long(int(ids[i])), int(ids[i])))
    mat = normalize(m[order[:sample_size]])
    rng = np.random.default_rng(seed)
    centroids = mat[rng.choice(len(mat), size=min(n_clusters, len(mat)), replace=False)]
    for _ in range(5):
        assign = (mat @ centroids.T).argmax(1)
        for c in range(len(centroids)):
            pts = mat[assign == c]
            if len(pts):
                centroids[c] = pts.mean(0)
        centroids = normalize(centroids)

    cluster = (normalize(m) @ centroids.T).argmax(1).astype(np.int64)
    by_id = sorted(range(len(ids)), key=lambda i: int(ids[i]))
    rows = []
    for pos, i in enumerate(by_id):
        best = None
        n_dup = 0
        for j in by_id[:pos]:
            if cluster[j] != cluster[i]:
                continue
            cos = round_half_up6(fold_cosine(vecs[j], vecs[i]))
            if cos >= threshold:
                n_dup += 1
                best = cos if best is None else max(best, cos)
        rows.append(
            {
                "vec_id": int(ids[i]),
                "cluster_id": int(cluster[i]),
                "n_dup_lower": n_dup,
                "max_cos_lower": best,
                "keep": 0 if n_dup else 1,
            }
        )
    out = pd.DataFrame(
        rows, columns=["vec_id", "cluster_id", "n_dup_lower", "max_cos_lower", "keep"]
    )
    return out.astype(
        {
            "vec_id": "int64",
            "cluster_id": "int64",
            "n_dup_lower": "int64",
            "max_cos_lower": "float64",
            "keep": "int64",
        }
    )


def gen_sim_kmeans_lloyd(
    emb: pd.DataFrame,
    n_clusters: int = 8,
    iters: int = 2,
    sample_size: int = 10_000,
    init_iters: int = 5,
    seed: int = 42,
) -> pd.DataFrame:
    """Independent replication of operators/semantic.py:kmeans_lloyd —
    per-row loops for the assignment, python-Decimal accumulation for the
    centroid update (twin of Spark's exact decimal(28,6) sum: each
    6-dp-rounded double quantizes through its shortest repr, HALF_UP,
    exactly like the JVM's BigDecimal.valueOf cast)."""
    ids = emb["vec_id"].astype("int64").to_numpy()
    m = np.stack([np.asarray(v) for v in emb["embedding"].to_list()]).astype(
        np.float64
    )

    def normalize(x):
        return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)

    order = sorted(range(len(ids)), key=lambda i: (xxh64_long(int(ids[i])), int(ids[i])))
    mat = normalize(m[order[:sample_size]])
    rng = np.random.default_rng(seed)
    centroids = mat[rng.choice(len(mat), size=min(n_clusters, len(mat)), replace=False)]
    for _ in range(init_iters):
        assign = (mat @ centroids.T).argmax(1)
        for c in range(len(centroids)):
            pts = mat[assign == c]
            if len(pts):
                centroids[c] = pts.mean(0)
        centroids = normalize(centroids)

    mn = normalize(m)
    nm6 = np.round(mn, 6)
    q6 = Decimal("0.000001")
    dim = m.shape[1]
    for _ in range(iters):
        assign = (mn @ centroids.T).argmax(1)
        new = centroids.copy()
        for c in range(len(centroids)):
            idx = np.nonzero(assign == c)[0]
            if len(idx) == 0:
                continue
            mean = np.array(
                [
                    float(
                        sum(
                            (
                                Decimal(repr(float(nm6[i, p]))).quantize(
                                    q6, rounding=ROUND_HALF_UP
                                )
                                for i in idx
                            ),
                            Decimal(0),
                        )
                    )
                    / len(idx)
                    for p in range(dim)
                ],
                dtype=np.float64,
            )
            new[c] = mean / max(np.linalg.norm(mean), 1e-12)
        centroids = new
    final = (mn @ centroids.T).argmax(1).astype(np.int64)
    counts = np.bincount(final, minlength=n_clusters)
    out = pd.DataFrame(
        {
            "vec_id": ids.astype("int64"),
            "cluster_id": final,
            "cluster_n": counts[final].astype("int64"),
        }
    )
    return out.astype({"vec_id": "int64", "cluster_id": "int64", "cluster_n": "int64"})


def gen_sim_kcenter_coreset(emb: pd.DataFrame, k: int = 16) -> pd.DataFrame:
    """Independent replication of operators/coreset.py:kcenter_select —
    per-row loops, same 6-dp rounding before the (dist DESC, id ASC)
    argmax, seed = min id, selected ids excluded."""
    ids = emb["vec_id"].astype("int64").to_numpy()
    m = np.stack([np.asarray(v) for v in emb["embedding"].to_list()]).astype(
        np.float64
    )
    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    n = len(ids)
    if n == 0:
        return pd.DataFrame(columns=["sel_rank", "vec_id", "dist6"]).astype(
            {"sel_rank": "int64", "vec_id": "int64", "dist6": "float64"}
        )
    seed_i = int(np.argmin(ids))
    picked = [(1, int(ids[seed_i]), None)]
    sel = {seed_i}
    mind = np.round(1.0 - mn @ mn[seed_i], 6)
    for r in range(2, k + 1):
        if len(sel) == n:
            break
        best = min(
            (i for i in range(n) if i not in sel),
            key=lambda i: (-mind[i], int(ids[i])),
        )
        picked.append((r, int(ids[best]), float(mind[best])))
        sel.add(best)
        mind = np.minimum(mind, np.round(1.0 - mn @ mn[best], 6))
    out = pd.DataFrame(picked, columns=["sel_rank", "vec_id", "dist6"])
    return out.astype({"sel_rank": "int64", "vec_id": "int64", "dist6": "float64"})


def gen_sim_pca_project(emb: pd.DataFrame, n_components: int = 4) -> pd.DataFrame:
    """Independent replication of operators/similarity.py:pca_fit_transform
    — per-row Decimal accumulation of the (i<=j) product sums and the
    component sums (twin of the decimal(28,12)/decimal(28,6) casts:
    shortest-repr quantize, HALF_UP), then the same eigh + sign fix +
    centered projection."""
    ids = emb["vec_id"].astype("int64").to_numpy()
    m = np.stack([np.asarray(v) for v in emb["embedding"].to_list()]).astype(
        np.float64
    )
    nm6 = np.round(m, 6)
    n, dim = nm6.shape
    q6 = Decimal("0.000001")
    q12 = Decimal("0.000000000001")
    mu = np.array(
        [
            float(
                sum(
                    (
                        Decimal(repr(float(nm6[r, i]))).quantize(
                            q6, rounding=ROUND_HALF_UP
                        )
                        for r in range(n)
                    ),
                    Decimal(0),
                )
            )
            / n
            for i in range(dim)
        ],
        dtype=np.float64,
    )
    cov = np.zeros((dim, dim))
    for i in range(dim):
        for j in range(i, dim):
            s = sum(
                (
                    Decimal(repr(float(nm6[r, i] * nm6[r, j]))).quantize(
                        q12, rounding=ROUND_HALF_UP
                    )
                    for r in range(n)
                ),
                Decimal(0),
            )
            v = float(s) / n - mu[i] * mu[j]
            cov[i, j] = v
            cov[j, i] = v
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    comps = evecs[:, order][:, :n_components]
    for c in range(comps.shape[1]):
        if comps[np.argmax(np.abs(comps[:, c])), c] < 0:
            comps[:, c] = -comps[:, c]
    proj = np.round((nm6 - mu) @ comps, 6)
    out = pd.DataFrame({"vec_id": ids.astype("int64")})
    for c in range(n_components):
        out[f"pc{c + 1}"] = proj[:, c].astype("float64")
    return out


def gen_agg_hll_distinct(docs: pd.DataFrame, p: int = 12) -> pd.DataFrame:
    """Independent HLL replication: per-value python-int bit_length ranks
    over the independent xxh64 (not Spark's JVM hash, not the numpy fold),
    same register layout and estimator formula as operators/hll.py — the
    registers must agree bit-for-bit, so the rounded estimate matches."""
    import math

    texts = docs["text"].astype(str).tolist()
    n_exact = len(set(texts))
    regs = [0] * (1 << p)
    for t in texts:
        h = xxh64_str(t)
        idx = h >> (64 - p)
        rest = (h << p) & ((1 << 64) - 1)
        lz = 64 - rest.bit_length() if rest else 64
        rank = min(lz, 64 - p) + 1
        if rank > regs[idx]:
            regs[idx] = rank
    m = float(1 << p)
    # same alpha source as operators/hll.py:_alpha — tabulated constants for
    # m in {16,32,64} (Flajolet 2007 Fig. 3), formula otherwise — so impl
    # and oracle agree at every p, not just the p=12 exercised by default
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
        int(m), 0.7213 / (1 + 1.079 / m)
    )
    e = alpha * m * m / math.fsum(2.0 ** -r for r in regs)
    if e <= 2.5 * m:
        zeros = regs.count(0)
        if zeros:
            e = m * math.log(m / zeros)
    return pd.DataFrame(
        {"n_exact": [n_exact], "hll_estimate": [round(e, 6)], "p": [p]}
    ).astype({"n_exact": "int64", "hll_estimate": "float64", "p": "int64"})


def gen_corpus_bpe_merges(
    docs: pd.DataFrame, num_merges: int = 30, min_pair_count: int = 2
) -> pd.DataFrame:
    """Independent BPE trainer (Sennrich 2016, per-word Python loops): the
    merge table the Spark fold-based trainer must reproduce exactly —
    greedy left-to-right non-overlapping replacement, argmax pair with
    (count desc, left asc, right asc) tiebreak."""
    from collections import Counter

    wc: Counter = Counter()
    for t in docs["text"]:
        for w in str(t).lower().split():
            wc[w] += 1
    syms = {w: list(w) + ["</w>"] for w in wc}
    merges = []
    for rank in range(1, num_merges + 1):
        pc: Counter = Counter()
        for w, c in wc.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += c
        if not pc:
            break
        (l, r), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if c < min_pair_count:
            break
        merges.append((rank, l, r, c))
        merged = l + r
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return pd.DataFrame(
        merges, columns=["merge_rank", "left", "right", "pair_count"]
    ).astype({"merge_rank": "int64", "pair_count": "int64"})


def gen_corpus_bpe_encode(
    docs: pd.DataFrame, num_merges: int = 30, min_pair_count: int = 2
) -> pd.DataFrame:
    """Independent BPE *application*: learn the merge table with the same
    per-word trainer as gen_corpus_bpe_merges, then encode every document
    — per word, char-init + '</w>', merges applied in rank order with
    greedy left-to-right non-overlapping replacement, word order kept.
    The Spark vocab-sized fold encode must reproduce every token stream."""
    mt = gen_corpus_bpe_merges(docs, num_merges, min_pair_count)
    merges = list(zip(mt["left"], mt["right"]))

    def enc_word(w: str) -> list[str]:
        s = list(w) + ["</w>"]
        for l, r in merges:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            s = out
        return s

    cache: dict[str, list[str]] = {}
    rows = []
    for doc_id, t in zip(docs["doc_id"], docs["text"]):
        toks: list[str] = []
        for w in str(t).lower().split():
            if w not in cache:
                cache[w] = enc_word(w)
            toks.extend(cache[w])
        if toks:
            rows.append((int(doc_id), len(toks), " ".join(toks)))
    return pd.DataFrame(
        rows, columns=["doc_id", "n_tokens", "tokens_text"]
    ).astype({"doc_id": "int64", "n_tokens": "int64"})


def gen_sim_random_projection(
    emb: pd.DataFrame, out_dim: int = 16, seed: int = 42
) -> pd.DataFrame:
    """Independent JL projection: same seeded Gaussian matrix convention
    (default_rng(seed), (d × out_dim) standard normals / sqrt(out_dim)),
    row-by-row Python dot products — the Spark Arrow GEMM must reproduce
    every rounded element."""
    import numpy as np

    d = len(emb["embedding"].iloc[0])
    rng = np.random.default_rng(seed)
    mat = (rng.standard_normal((d, out_dim)) / np.sqrt(out_dim)).astype("float64")
    rows = []
    for vec_id, v in zip(emb["vec_id"], emb["embedding"]):
        p = np.round(np.asarray(v, dtype="float64") @ mat, 6)
        rows.append((int(vec_id), ",".join(f"{x:.6f}" for x in p)))
    return pd.DataFrame(rows, columns=["vec_id", "proj"]).astype({"vec_id": "int64"})


def gen_agg_cms_freq(
    events: pd.DataFrame, depth: int = 4, width: int = 4096
) -> pd.DataFrame:
    """Independent Count-Min sketch (per-event Python loop): keys hash
    Spark-style (xxh64 of the long's 8 LE bytes, seed 42), sketch row i
    re-hashes that 64-bit key with seed i; estimate = min over rows.
    The Spark build (vectorized numpy) must reproduce every estimate —
    including any collision inflation — bit-for-bit."""
    counts = [[0] * width for _ in range(depth)]

    def signed(h: int) -> int:
        return h - (1 << 64) if h >= (1 << 63) else h

    uids = [int(u) for u in events["user_id"]]
    hs = {}
    for uid in uids:
        h = hs.get(uid)
        if h is None:
            h = xxh64_long(uid, 42)
            hs[uid] = h
        for i in range(depth):
            counts[i][xxh64_long(signed(h), i) % width] += 1
    out = []
    for uid in sorted(set(uids)):
        h = hs[uid]
        est = min(
            counts[i][xxh64_long(signed(h), i) % width] for i in range(depth)
        )
        out.append((uid, est))
    return pd.DataFrame(out, columns=["user_id", "est_count"]).astype(
        {"user_id": "int64", "est_count": "int64"}
    )


# ==================================================================== driver
def gen_agg_kmv_overlap(docs: pd.DataFrame, k: int = 64) -> pd.DataFrame:
    """Independent replication of operators/kmv.py over the synthetic
    round-A/round-B URL sets — per-value Python loops + the spec formulas
    (Beyer 2007): pos(h) = double(h)/2^64 + 0.5 (JVM op order), est =
    (k-1)/pos(kth), union sketch = k smallest of sketch-value union,
    intersect = (|U ∩ A ∩ B|/|U|)·est_union."""
    ids = docs["doc_id"].astype("int64").tolist()

    def url(d: int) -> str:
        return f"https://h{d % 31}/p{d}"

    a_all = sorted({xxh64_str(url(d)) for d in ids if d % 3 != 0})
    b_all = sorted({xxh64_str(url(d)) for d in ids if d % 2 != 0})
    sa, sb = a_all[:k], b_all[:k]
    u = sorted(set(sa) | set(sb))[:k]

    def pos(h: int) -> float:
        return float(h) / 18446744073709551616.0 + 0.5

    def est(s: list[int]) -> float:
        return float(len(s)) if len(s) < k else float(k - 1) / pos(s[-1])

    set_a, set_b = set(sa), set(sb)
    in_both = sum(1 for h in u if h in set_a and h in set_b)
    n_u = len(u)
    est_u = est(u)
    est_int = (in_both / float(n_u)) * est_u if n_u else 0.0
    jacc = in_both / float(n_u) if n_u else 0.0
    out = pd.DataFrame(
        [
            {
                "k": k,
                "est_a": round_half_up6(est(sa)),
                "est_b": round_half_up6(est(sb)),
                "est_union": round_half_up6(est_u),
                "est_intersect": round_half_up6(est_int),
                "jaccard_est": round_half_up6(jacc),
            }
        ]
    )
    return out.astype(
        {
            "k": "int64",
            "est_a": "float64",
            "est_b": "float64",
            "est_union": "float64",
            "est_intersect": "float64",
            "jaccard_est": "float64",
        }
    )


def gen_graph_hyperanf(li: pd.DataFrame, max_t: int = 3, p: int = 12) -> pd.DataFrame:
    """Independent HyperANF replication over the p9 host graph: per-node
    singleton HLL from the independent xxh64 (python-int bit_length rank,
    like gen_agg_hll_distinct), per-round register max over the edge list,
    per-node Flajolet estimate in the impl's IEEE op order (np.exp2 +
    np.sum on the same 2^p float64 array — the fold_cosine precedent),
    rounded half-up to integer micros and summed exactly, matching
    operators/graph.py:hyperanf_neighborhood's order-independent N(t)."""
    import math

    m = 1 << p
    src = ("h" + (li["l_suppkey"] % 100).astype(str)).tolist()
    dst = ("h" + (li["l_partkey"] % 103).astype(str)).tolist()
    edges = sorted(set(zip(src, dst)))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})

    regs: dict[str, np.ndarray] = {}
    for nd in nodes:
        h = xxh64_str(nd)
        idx = h >> (64 - p)
        rest = (h << p) & ((1 << 64) - 1)
        lz = 64 - rest.bit_length() if rest else 64
        rank = min(lz, 64 - p) + 1
        a = np.zeros(m, dtype=np.uint8)
        a[idx] = rank
        regs[nd] = a

    def node_estimate(r: np.ndarray) -> float:
        mf = float(m)
        alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
        e = alpha * mf * mf / float(np.sum(np.exp2(-r.astype(np.float64))))
        if e <= 2.5 * mf:
            zeros = int(np.count_nonzero(r == 0))
            if zeros:
                return mf * math.log(mf / zeros)
        return e

    def total(cur: dict[str, np.ndarray]) -> float:
        micros = sum(
            int(math.floor(node_estimate(cur[nd]) * 1e6 + 0.5)) for nd in nodes
        )
        return micros / 1e6

    rows = [(0, total(regs))]
    for t in range(1, max_t + 1):
        nxt = {nd: regs[nd].copy() for nd in nodes}
        for s, d in edges:
            np.maximum(nxt[s], regs[d], out=nxt[s])
        regs = nxt
        rows.append((t, total(regs)))
    return pd.DataFrame(rows, columns=["t", "est_pairs"]).astype(
        {"t": "int64", "est_pairs": "float64"}
    )


def _pq_train_books(
    emb: pd.DataFrame, m_sub: int = 8, n_codes: int = 16,
    sample_size: int = 10_000, iters: int = 5, seed: int = 42,
):
    """Shared-parameter PQ codebook replication (seed, sample order and
    the expanded distance form are the operator's identity, like hash
    seeds elsewhere); the encode/ADC pipeline below is per-document."""
    ids = emb["vec_id"].astype("int64").to_numpy()
    vecs = emb["embedding"].to_list()
    m = np.stack([np.asarray(v) for v in vecs]).astype(np.float64)
    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    order = sorted(range(len(ids)), key=lambda i: (xxh64_long(int(ids[i])), int(ids[i])))
    mat = mn[order[:sample_size]]
    d = mat.shape[1]
    dsub = d // m_sub
    k = min(n_codes, len(mat))
    books = []
    for j in range(m_sub):
        sub = mat[:, j * dsub : (j + 1) * dsub]
        rng = np.random.default_rng(seed + j)
        cb = sub[rng.choice(len(sub), size=k, replace=False)].copy()
        for _ in range(iters):
            assign = (-2.0 * sub @ cb.T + (cb**2).sum(1)).argmin(1)
            for c in range(k):
                pts = sub[assign == c]
                if len(pts):
                    cb[c] = pts.mean(0)
        books.append(cb)
    return ids, mn, np.stack(books)


def gen_sim_pq_encode(emb: pd.DataFrame) -> pd.DataFrame:
    ids, mn, books = _pq_train_books(emb)
    m_sub, _k, dsub = books.shape
    rows = []
    for i in range(len(ids)):
        codes, err = [], 0.0
        for j in range(m_sub):
            sub = mn[i, j * dsub : (j + 1) * dsub]
            cb = books[j]
            c = int((-2.0 * sub @ cb.T + (cb**2).sum(1)).argmin())
            codes.append(c)
            err += float(((sub - cb[c]) ** 2).sum())
        rows.append(
            {
                "vec_id": int(ids[i]),
                "codes": "-".join(str(c) for c in codes),
                "recon_err": float(np.round(err, 6)),
            }
        )
    return pd.DataFrame(rows).astype(
        {"vec_id": "int64", "codes": "string", "recon_err": "float64"}
    )


def gen_sim_pq_topk(emb: pd.DataFrame, k: int = 10) -> pd.DataFrame:
    ids, mn, books = _pq_train_books(emb)
    m_sub, kk, dsub = books.shape
    codes = np.zeros((len(ids), m_sub), dtype=np.int64)
    for i in range(len(ids)):
        for j in range(m_sub):
            sub = mn[i, j * dsub : (j + 1) * dsub]
            cb = books[j]
            codes[i, j] = (-2.0 * sub @ cb.T + (cb**2).sum(1)).argmin()
    rows = []
    for qi in range(len(ids)):
        if ids[qi] >= 8:
            continue
        lut = np.zeros((m_sub, kk))
        for j in range(m_sub):
            qsub = mn[qi, j * dsub : (j + 1) * dsub]
            lut[j] = ((qsub[None, :] - books[j]) ** 2).sum(-1)
        scored = []
        for i in range(len(ids)):
            adc = 0.0
            for j in range(m_sub):
                adc += lut[j, codes[i, j]]
            scored.append((float(np.round(adc, 6)), int(ids[i])))
        scored.sort(key=lambda t: (t[0], t[1]))
        for rank, (adc, vid) in enumerate(scored[:k], start=1):
            rows.append(
                {"query_id": int(ids[qi]), "rank": rank, "vec_id": vid, "adc_dist": adc}
            )
    return pd.DataFrame(rows, columns=["query_id", "rank", "vec_id", "adc_dist"]).astype(
        {"query_id": "int64", "rank": "int64", "vec_id": "int64", "adc_dist": "float64"}
    )


def gen_sim_ivf_recall(emb: pd.DataFrame, k: int = 10) -> pd.DataFrame:
    """Recall@k of the IVF path vs exact brute-force ground truth — both
    sides re-derived independently (gen_sim_ivf_topk for the approx set,
    a full fold_cosine scan for the truth), so the recall row is a pure
    function of the embedding table."""
    approx = gen_sim_ivf_topk(emb, k=k)
    ids = emb["vec_id"].astype("int64").to_numpy()
    vecs = emb["embedding"].to_list()
    rows = []
    q_idx = [i for i in range(len(ids)) if ids[i] < 8]
    exact = {}
    for qi in q_idx:
        scored = [
            (round_half_up6(fold_cosine(vecs[i], vecs[qi])), int(ids[i]))
            for i in range(len(ids))
        ]
        scored.sort(key=lambda t: (-t[0], t[1]))
        exact[int(ids[qi])] = {vid for _, vid in scored[:k]}
    for qid, grp in approx.groupby("query_id"):
        a_ids = set(grp.loc[grp["rank"] <= k, "vec_id"].astype(int))
        n_hits = len(a_ids & exact[int(qid)])
        rows.append(
            {
                "query_id": int(qid),
                "k": k,
                "n_approx": len(a_ids),
                "n_hits": n_hits,
                "recall": round(n_hits / k, 6),
            }
        )
    out = pd.DataFrame(
        rows, columns=["query_id", "k", "n_approx", "n_hits", "recall"]
    )
    return out.astype(
        {"query_id": "int64", "k": "int64", "n_approx": "int64",
         "n_hits": "int64", "recall": "float64"}
    )


def gen_dedup_lsh_eval(
    docs: pd.DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
    seed: int = 42,
) -> pd.DataFrame:
    """Precision/recall of the banded LSH candidate set vs exact
    all-pairs Jaccard — same signatures/banding as gen_dedup_minhash_lsh,
    truth from a full pairwise gramset sweep. The corpus is augmented
    with deterministic prefix-truncation twins (keep (30+15*(id%5))% of
    the words, integer arithmetic) so mid-range Jaccard pairs exist and
    the S-curve actually shows: without them the synthetic dups are all
    J~1 and every config scores 1.0/1.0."""
    import re as _re

    aug_rows = []
    for r in docs.itertuples():
        aug_rows.append({"doc_id": int(r.doc_id), "text": str(r.text)})
        words = _re.split(r"\s+", str(r.text).strip())
        pct = 30 + (int(r.doc_id) % 5) * 15
        k = max((len(words) * pct) // 100, 1)
        aug_rows.append(
            {"doc_id": int(r.doc_id) + 1_000_000, "text": " ".join(words[:k])}
        )
    docs = pd.DataFrame(aug_rows)
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE_P, size=num_hashes, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, MERSENNE_P, size=num_hashes, dtype=np.uint64)
    rpb = num_hashes // bands

    ids, sig_list = [], []
    for r in docs.itertuples():
        grams = doc_grams(str(r.text).lower().split(), shingle_n)
        if len(grams):
            sig = (a[:, None] * grams[None, :] + b[:, None]).min(axis=1)
        else:
            sig = np.zeros(num_hashes, dtype=np.uint64)
        ids.append(int(r.doc_id))
        sig_list.append(sig.view(np.int64))

    buckets: dict[tuple[int, int], list[int]] = {}
    for did, sig in zip(ids, sig_list):
        for bi in range(bands):
            key = ",".join(str(int(v)) for v in sig[bi * rpb : (bi + 1) * rpb])
            buckets.setdefault((bi, xxh64_str(key)), []).append(did)
    cand = set()
    for members in buckets.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                cand.add((ms[i], ms[j]))

    def gramset(text: str) -> set[str]:
        words = ws_split(text)
        n = max(len(words) - (shingle_n - 1), 1)
        return {" ".join(words[i : i + shingle_n]) for i in range(n)}

    gsets = {int(r.doc_id): gramset(str(r.text)) for r in docs.itertuples()}
    sids = sorted(gsets)
    truth = set()
    for i in range(len(sids)):
        gi = gsets[sids[i]]
        for j in range(i + 1, len(sids)):
            gj = gsets[sids[j]]
            inter = len(gi & gj)
            union = len(gi | gj)
            if round_half_up6(inter / max(union, 1)) >= threshold:
                truth.add((sids[i], sids[j]))
    n_hits = len(cand & truth)
    out = pd.DataFrame(
        [
            {
                "n_candidates": len(cand),
                "n_true_pairs": len(truth),
                "n_hits": n_hits,
                "precision": round(n_hits / len(cand), 6) if cand else None,
                "recall": round(n_hits / len(truth), 6) if truth else None,
            }
        ]
    )
    return out.astype(
        {"n_candidates": "int64", "n_true_pairs": "int64", "n_hits": "int64",
         "precision": "float64", "recall": "float64"}
    )


def gen_sim_mmr_rerank(
    emb: pd.DataFrame, topk: int = 10, k: int = 5, lam: float = 0.7
) -> pd.DataFrame:
    """Independent MMR replication: exact brute-force top-10 (fold_cosine
    relevance, (cos desc, id) order), then the same greedy
    lam*rel - (1-lam)*max-sim loop with numpy-rounded sims and scores."""
    ids = emb["vec_id"].astype("int64").to_numpy()
    vecs = emb["embedding"].to_list()
    m = np.stack([np.asarray(v) for v in vecs]).astype(np.float64)
    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    rows = []
    q_idx = [i for i in range(len(ids)) if ids[i] < 8]
    for qi in q_idx:
        scored = [
            (round_half_up6(fold_cosine(vecs[i], vecs[qi])), int(ids[i]), i)
            for i in range(len(ids))
        ]
        scored.sort(key=lambda t: (-t[0], t[1]))
        cand = scored[:topk]
        sub = mn[[c[2] for c in cand]]
        sims = np.round(sub @ sub.T, 6)
        rel = np.array([c[0] for c in cand])
        cids = [c[1] for c in cand]
        picked, free = [], list(range(len(cand)))
        for rank in range(1, min(k, len(cand)) + 1):
            best, best_key = None, None
            for i in free:
                div = max((sims[i, j] for j in picked), default=0.0)
                score = round(lam * rel[i] - (1.0 - lam) * div, 6)
                key = (score, -cids[i])
                if best_key is None or key > best_key:
                    best, best_key = i, key
            picked.append(best)
            free.remove(best)
            rows.append(
                {"query_id": int(ids[qi]), "mmr_rank": rank,
                 "vec_id": cids[best], "mmr_score": float(best_key[0])}
            )
    out = pd.DataFrame(rows, columns=["query_id", "mmr_rank", "vec_id", "mmr_score"])
    return out.astype(
        {"query_id": "int64", "mmr_rank": "int64", "vec_id": "int64",
         "mmr_score": "float64"}
    )


def gen_text_compression_ratio(docs: pd.DataFrame, level: int = 6) -> pd.DataFrame:
    """Same stdlib zlib, same level: the DEFLATE stream is a pure function
    of (bytes, level, zlib build) — identical in the Spark UDF and here."""
    import zlib

    rows = []
    for r in docs.itertuples():
        b = str(r.text).encode("utf-8")
        ratio = round(len(zlib.compress(b, level)) / len(b), 6) if b else None
        rows.append(
            {"doc_id": int(r.doc_id), "n_bytes": len(b), "zlib_ratio": ratio,
             "compressible": bool(ratio is not None and ratio < 0.4)}
        )
    out = pd.DataFrame(rows, columns=["doc_id", "n_bytes", "zlib_ratio", "compressible"])
    return out.astype({"doc_id": "int64", "n_bytes": "int64",
                       "zlib_ratio": "float64", "compressible": "bool"})


GENERATORS = {
    "c3_hash_keys": ("documents", gen_c3_hash_keys),
    "text_fingerprint_rolling": ("documents", gen_fingerprint_rolling),
    "dedup_simhash": ("documents", gen_dedup_simhash),
    "dedup_minhash_lsh": ("documents", gen_dedup_minhash_lsh),
    "dedup_embedding_lsh": ("embeddings", gen_dedup_embedding_lsh),
    "sim_ivf_topk": ("embeddings", gen_sim_ivf_topk),
    "dedup_semantic": ("embeddings", gen_dedup_semantic),
    "agg_hll_distinct": ("documents", gen_agg_hll_distinct),
    "corpus_bpe_merges": ("documents", gen_corpus_bpe_merges),
    "corpus_bpe_encode": ("documents", gen_corpus_bpe_encode),
    "sim_random_projection": ("embeddings", gen_sim_random_projection),
    "agg_cms_freq": ("events", gen_agg_cms_freq),
    "agg_kmv_overlap": ("documents", gen_agg_kmv_overlap),
    "dedup_minhash_incr": ("documents", gen_dedup_minhash_incr),
    "mm_phash_neardup": ("documents", gen_mm_phash_neardup),
    "sim_kmeans_lloyd": ("embeddings", gen_sim_kmeans_lloyd),
    "sim_kcenter_coreset": ("embeddings", gen_sim_kcenter_coreset),
    "sim_pca_project": ("embeddings", gen_sim_pca_project),
    "graph_hyperanf": ("lineitem", gen_graph_hyperanf),
    "sim_pq_encode": ("embeddings", gen_sim_pq_encode),
    "sim_pq_topk": ("embeddings", gen_sim_pq_topk),
    "sim_ivf_recall": ("embeddings", gen_sim_ivf_recall),
    "dedup_lsh_eval": ("documents", gen_dedup_lsh_eval),
    "sim_mmr_rerank": ("embeddings", gen_sim_mmr_rerank),
    "text_compression_ratio": ("documents", gen_text_compression_ratio),
}


def main(sfs=("0.001", "0.01")) -> None:
    base = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for sf in sfs:
        sf_dir = f"/root/testdata/sf{sf}"
        out_dir = os.path.join(base, "expected", f"sf{sf}")
        os.makedirs(out_dir, exist_ok=True)
        tables = {
            "documents": pd.read_parquet(f"{sf_dir}/documents.parquet"),
            "embeddings": pd.read_parquet(f"{sf_dir}/embeddings.parquet"),
            "events": pd.read_parquet(f"{sf_dir}/events.parquet"),
            "lineitem": pd.read_parquet(f"{sf_dir}/lineitem.parquet"),
        }
        for name, (table, fn) in GENERATORS.items():
            df = fn(tables[table])
            path = os.path.join(out_dir, f"{name}.parquet")
            df.to_parquet(path, index=False)
            print(f"[gen_expected] sf{sf} {name}: {len(df)} rows -> {path}")


if __name__ == "__main__":
    main()
