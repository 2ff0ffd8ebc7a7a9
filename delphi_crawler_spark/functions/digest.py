"""Order-independent table content digest.

Exact-resume verification (SURVEY §2.8) and cross-run audits need a cheap
"are these two frames the same multiset of rows" primitive that does not
sort, collect, or depend on partitioning. The digest here is:

    bit_xor( xxhash64(row-struct) )  combined with  count(*)

- xxhash64 over the row struct gives a 64-bit row fingerprint computed
  JVM-side (whole-stage codegen, no Python);
- XOR is commutative/associative, so the aggregate is invariant to row
  order, partitioning, and parallelism — one partial-aggregating reduce,
  O(1) result bytes at any input size;
- the row count disambiguates the XOR identity cases (XOR alone cannot
  see a row appearing twice vs not at all — pairs cancel; carrying
  count(*) catches every even-multiplicity difference that leaves the
  XOR unchanged except exact multiset permutations of *distinct* rows,
  which is the equality being tested).

This is an audit fingerprint, not a cryptographic commitment: xxhash64 is
public, fast, and collision-plausible at ~2^-64 per pair — the right
trade for "did the resume produce byte-identical state" checks over
10^10-row tables where sorting for comparison is off the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def content_digest(df: DataFrame, cols: list[str] | None = None) -> tuple[int, int]:
    """(xor_of_row_hashes, row_count) over ``cols`` (default: all columns,
    sorted by name so logically-equal frames with different column order
    digest equal). Empty frame → (0, 0)."""
    names = sorted(cols or df.columns)
    h = F.xxhash64(F.struct(*[F.col(c) for c in names]))
    row = df.agg(
        F.bit_xor(h).alias("x"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return (int(row["x"] or 0), int(row["n"]))


def frames_equal(a: DataFrame, b: DataFrame, cols: list[str] | None = None) -> bool:
    """Multiset row equality by digest — one aggregate per side, no sort,
    no shuffle beyond the partial-agg reduce, parallelism-invariant."""
    return content_digest(a, cols) == content_digest(b, cols)
