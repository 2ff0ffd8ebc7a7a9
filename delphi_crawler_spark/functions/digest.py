"""Order-independent table content digest.

Exact-resume verification (SURVEY §2.8) and cross-run audits need a cheap
"are these two frames the same multiset of rows" primitive that does not
sort, collect, or depend on partitioning. The digest here is the triple:

    ( bit_xor(h),  sum(h) mod 2^64,  count(*) )   with
    h = xxhash64( interleaved (value, isnull) struct of the row )

- xxhash64 over the row struct is a 64-bit row fingerprint computed
  JVM-side (whole-stage codegen, no Python). The struct interleaves each
  column with its ``isnull`` flag because Spark's xxhash64 SKIPS null
  fields (a null leaves the running seed unchanged), so without the flags
  rows that differ only by WHICH same-typed column holds the null would
  collide systematically;
- XOR and SUM are both commutative/associative → invariant to row order,
  partitioning, and parallelism; one partial-aggregating reduce, O(1)
  result bytes at any input size;
- XOR alone is blind to even multiplicities (duplicate pairs cancel:
  {r1,r1} and {r2,r2} both XOR to 0), which is why the SUM component is
  carried — a row duplicated k times contributes k·h to the sum, so
  equal-count multiset differences that cancel in XOR still differ in
  SUM (collision now requires the hash sums to agree too, back at the
  ~2^-64-per-component ballpark). count(*) catches size differences and
  disambiguates the empty frame.

This is an audit fingerprint, not a cryptographic commitment: xxhash64 is
public and fast — the right trade for "did the resume produce identical
state" checks over 10^10-row tables where sorting for comparison is off
the table. The SUM accumulates in decimal(38,0) (exact integers; room for
2^63-magnitude terms over >10^18 rows) and is reduced mod 2^64 on the
driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def content_digest(
    df: DataFrame, cols: list[str] | None = None
) -> tuple[int, int, int]:
    """(xor_of_row_hashes, sum_of_row_hashes mod 2^64, row_count) over
    ``cols`` (default: all columns; an explicit empty list is an error),
    sorted by name so logically-equal frames with different column order
    digest equal. Empty frame → (0, 0, 0)."""
    if cols is not None and not cols:
        raise ValueError("cols must be None (all columns) or a non-empty list")
    names = sorted(df.columns if cols is None else cols)
    fields = []
    for c in names:
        fields.append(F.col(c))
        fields.append(F.isnull(F.col(c)))
    h = F.xxhash64(F.struct(*fields))
    row = df.agg(
        F.bit_xor(h).alias("x"),
        F.sum(h.cast("decimal(38,0)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    s = int(row["s"]) % (1 << 64) if row["s"] is not None else 0
    return (int(row["x"] or 0), s, int(row["n"]))


def frames_equal(a: DataFrame, b: DataFrame, cols: list[str] | None = None) -> bool:
    """Multiset row equality by digest — one aggregate per side, no sort,
    no shuffle beyond the partial-agg reduce, parallelism-invariant."""
    return content_digest(a, cols) == content_digest(b, cols)
