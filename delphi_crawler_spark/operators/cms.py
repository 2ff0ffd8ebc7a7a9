"""Incremental point-frequency telemetry: mergeable Count-Min sketch.

Cormode & Muthukrishnan, "An improved data stream summary: the count-min
sketch and its applications" (J. Algorithms 2005). The crawl telemetry
question it answers — "about how many times has this host / URL pattern /
content digest appeared, ever" — needs point-frequency estimates that
PERSIST and MERGE across rounds, which no built-in aggregate gives. This
module is the frequency-domain sibling of ``operators/hll.py`` (distinct
counts) and ``operators/histsketch.py`` (quantiles): per-partition numpy
count matrices built with ``mapInPandas``, merged with the same two-level
Arrow fold, persistable as small binary segments, so each round adds a
segment built from only its appended rows — O(round) maintenance, never a
rescan.

Guarantees: estimate(x) >= true(x) always (one-sided); with width w and
depth d, P[estimate > true + 2n/w] < (1/2)^d where n is the stream length.
Segment merge is element-wise SUM, which is EXACT: merging round segments
gives bit-identical counts to one pass over the union (property-tested),
so error never compounds across rounds.

Hashing: row i of the sketch indexes with ``xxh64(key_bytes, seed=i)``
over the key's 8 little-endian bytes — the same public-spec XXH64 the
engine already uses for bloom keys, here in a fully vectorized numpy form
(``xxh64_u64``) that the unit tests pin bit-for-bit against the scalar
spec implementation in ``tools/gen_expected.py``. Keys enter as a 64-bit
hashed column (``F.xxhash64``, JVM-side) exactly like the bloom/HLL paths.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r_ = np.uint64(r)
    inv = np.uint64(64 - r)
    return (x << r_) | (x >> inv)


def xxh64_u64(vals: np.ndarray, seed: int) -> np.ndarray:
    """Vectorized XXH64 of each uint64's 8 little-endian bytes (the
    fixed-size specialization of the public spec: one tail lane, no
    stripe loop). Bit-identical to ``tools/gen_expected.xxh64_long``."""
    v = vals.astype(np.uint64, copy=False)
    with np.errstate(over="ignore"):
        acc = np.uint64(seed) + _P5 + np.uint64(8)
        k1 = _rotl(v * _P2, 31) * _P1
        acc = acc ^ k1
        acc = _rotl(acc, 27) * _P1 + _P4
        acc ^= acc >> np.uint64(33)
        acc *= _P2
        acc ^= acc >> np.uint64(29)
        acc *= _P3
        acc ^= acc >> np.uint64(32)
    return acc


@dataclass
class CMS:
    depth: int
    width: int
    counts: np.ndarray  # shape (depth, width), int64

    @staticmethod
    def empty(depth: int = 4, width: int = 1 << 12) -> "CMS":
        return CMS(depth, width, np.zeros((depth, width), dtype=np.int64))

    def _idx(self, hashed: np.ndarray, row: int) -> np.ndarray:
        return (xxh64_u64(hashed, row) % np.uint64(self.width)).astype(np.int64)

    def add_many(self, hashed: np.ndarray) -> None:
        for i in range(self.depth):
            np.add.at(self.counts[i], self._idx(hashed, i), 1)

    def merge(self, other: "CMS") -> "CMS":
        assert (self.depth, self.width) == (other.depth, other.width)
        return CMS(self.depth, self.width, self.counts + other.counts)

    def estimate_many(self, hashed: np.ndarray) -> np.ndarray:
        est = None
        for i in range(self.depth):
            row = self.counts[i][self._idx(hashed, i)]
            est = row if est is None else np.minimum(est, row)
        return est


def build_cms_segment(
    df: DataFrame,
    col: str = "url_hash64",
    depth: int = 4,
    width: int = 1 << 12,
    tree_depth: int = 2,
) -> CMS:
    """Build a CMS segment from a DataFrame of 64-bit hashed keys — the
    exact shape of ``hll.build_hll_segment``: per-partition count matrices
    (Arrow batches, numpy folds), one small binary row per partition, a
    coalesced partial sum-merge stage, tiny driver reduce. Persist
    ``counts.tobytes()`` per round; next round sum-merges its own segment
    in O(round)."""
    spark = df.sparkSession

    def build_partition(batches):
        seg = CMS.empty(depth, width)
        any_rows = False
        for pdf in batches:
            vals = pdf.iloc[:, 0].to_numpy(dtype="int64").view(np.uint64)
            if len(vals):
                seg.add_many(vals)
                any_rows = True
        if any_rows:
            yield pd.DataFrame({"cnts": [seg.counts.tobytes()]})

    def merge_partition(batches):
        acc = None
        for pdf in batches:
            for blob in pdf["cnts"]:
                arr = np.frombuffer(blob, dtype=np.int64)
                acc = arr.copy() if acc is None else acc + arr
        if acc is not None:
            yield pd.DataFrame({"cnts": [acc.tobytes()]})

    cnts_df = df.select(F.col(col)).mapInPandas(build_partition, schema="cnts binary")
    fan_in = max(1, spark.sparkContext.defaultParallelism // (1 << tree_depth))
    rows = (
        cnts_df.coalesce(fan_in)
        .mapInPandas(merge_partition, schema="cnts binary")
        .toPandas()
    )
    merged = np.zeros(depth * width, dtype=np.int64)
    for blob in rows["cnts"]:
        merged += np.frombuffer(blob, dtype=np.int64)
    return CMS(depth, width, merged.reshape(depth, width))
