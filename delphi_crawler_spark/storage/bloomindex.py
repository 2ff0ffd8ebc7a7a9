"""Per-file Bloom-filter column index + point-lookup file skipping — the
Parquet/Iceberg bloom-index shape (column-level blooms let a point
predicate on a high-cardinality, unordered column skip data files that
zone maps cannot prune, because min/max bounds are useless for hash-
scattered keys; see ``zorder.zone_map_prune_stats`` for the range-predicate
complement).

Engine-exact by construction: bit positions are md5 hex bytes (two
independent 4-hex-digit probes mod the filter size), the per-file filter
is a ``bit_or`` fold of single-bit words — integer arithmetic only, so an
ANSI-SQL oracle reproduces the filter bit-for-bit and the skip decision is
EXACTLY checkable (unlike an engine-internal bloom whose hash seeds are
private). Words are 32-bit values held in bigints: every word stays
positive, no sign traps in either engine.

Scale shape: the build is one explode (2 rows per key) + one
(file, word) hash-agg — map-side partial, shuffle bounded by
files × words, never by rows. The probe side broadcasts the INDEX (file
metadata is KBs/file — the small side by design), joins it twice (one per
probe bit), and the ground-truth check is a key-equi-join against the
data. Nothing collects.

Reference parity: the reference's ES index bootstrap
(ElasticIndexMaintenance.scala:30, createDelphiIndex)
delegates skipping to Elasticsearch internals; this realizes the same
point-lookup pruning as explicit, testable DataFrame state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WORD_BITS = 32


def _positions(key, bits: int):
    """Two independent bit positions from the md5 of the key's string
    form: hex digits 1-4 and 5-8 (16-bit values) mod ``bits``. Mirrored
    in SQL as ``('0x' || substr(md5(k),..))::BIGINT % bits``."""
    hx = F.md5(key.cast("string"))
    p1 = F.conv(F.substring(hx, 1, 4), 16, 10).cast("bigint") % bits
    p2 = F.conv(F.substring(hx, 5, 4), 16, 10).cast("bigint") % bits
    return p1, p2


def build_file_blooms(
    data: DataFrame,
    file_col: str,
    key_col: str,
    bits: int = 16384,
) -> DataFrame:
    """Per-(file, word) bloom words over ``key_col``: k=2 probes into a
    ``bits``-bit filter stored as 32-bit words (``word_idx`` in
    [0, bits/32), ``word`` a positive bigint). Absent (file, word) pairs
    mean an all-zero word — the probe join treats missing as 0.

    One explode + one hash-agg; output rows ≤ files × bits/32 (the index
    is metadata-sized, broadcastable by design)."""
    if bits % _WORD_BITS != 0:
        raise ValueError("bits must be a multiple of 32")
    p1, p2 = _positions(F.col(key_col), bits)
    pos = data.select(
        F.col(file_col).alias("file_id"),
        F.explode(F.array(p1, p2)).alias("p"),
    )
    return (
        pos.select(
            "file_id",
            (F.col("p") / _WORD_BITS).cast("bigint").alias("word_idx"),
            F.expr(f"shiftleft(cast(1 as bigint), cast(p % {_WORD_BITS} as int))").alias(
                "bit"
            ),
        )
        .groupBy("file_id", "word_idx")
        .agg(F.expr("bit_or(bit)").alias("word"))
    )


def bloom_probe_stats(
    blooms: DataFrame,
    data: DataFrame,
    probes: DataFrame,
    file_col: str,
    key_col: str,
    probe_col: str = "probe_key",
    bits: int = 16384,
    n_files: int | None = None,
) -> DataFrame:
    """Point-lookup file skipping: for each probe key, how many files the
    bloom index says MAYBE contain it vs how many truly do.

    Returns (probe_col, n_files_maybe, n_files_true, n_false_pos,
    n_files_skipped) — ``n_false_pos = maybe - true`` (blooms have no
    false negatives, so true ⊆ maybe always; a pytest pins it), and
    ``n_files_skipped = n_files - maybe`` when ``n_files`` is given (else
    derived from the index's distinct file count via a scalar agg).

    The index broadcasts (metadata-sized); truth is one key-equi-join
    against the data — the expensive side only exists to VERIFY the
    index, a real reader would touch only the maybe-files."""
    if n_files is None:
        n_files = blooms.select("file_id").distinct().count()
    p1, p2 = _positions(F.col(probe_col), bits)
    pr = probes.select(
        F.col(probe_col),
        (p1 / _WORD_BITS).cast("bigint").alias("w1"),
        p1.alias("__p1"),
        (p2 / _WORD_BITS).cast("bigint").alias("w2"),
        p2.alias("__p2"),
    ).select(
        probe_col,
        "w1",
        F.expr(f"shiftleft(cast(1 as bigint), cast(__p1 % {_WORD_BITS} as int))").alias("b1"),
        "w2",
        F.expr(f"shiftleft(cast(1 as bigint), cast(__p2 % {_WORD_BITS} as int))").alias("b2"),
    )
    bc = F.broadcast(blooms)
    hit1 = (
        pr.join(bc, pr["w1"] == bc["word_idx"])
        .filter(F.expr("word & b1") != 0)
        .select(probe_col, "file_id")
    )
    hit2 = (
        pr.join(bc, pr["w2"] == bc["word_idx"])
        .filter(F.expr("word & b2") != 0)
        .select(probe_col, "file_id")
    )
    maybe = hit1.join(hit2, [probe_col, "file_id"])
    truth = (
        probes.join(
            data.select(
                F.col(file_col).alias("file_id"), F.col(key_col).alias(probe_col)
            ),
            probe_col,
        )
        .select(probe_col, "file_id")
        .distinct()
    )
    m = maybe.groupBy(probe_col).agg(F.count(F.lit(1)).alias("n_files_maybe"))
    t = truth.groupBy(probe_col).agg(F.count(F.lit(1)).alias("n_files_true"))
    return (
        probes.select(probe_col)
        .join(m, probe_col, "left")
        .join(t, probe_col, "left")
        .select(
            probe_col,
            F.coalesce("n_files_maybe", F.lit(0)).cast("bigint").alias("n_files_maybe"),
            F.coalesce("n_files_true", F.lit(0)).cast("bigint").alias("n_files_true"),
            (F.coalesce("n_files_maybe", F.lit(0)) - F.coalesce("n_files_true", F.lit(0)))
            .cast("bigint")
            .alias("n_false_pos"),
            (F.lit(n_files) - F.coalesce("n_files_maybe", F.lit(0)))
            .cast("bigint")
            .alias("n_files_skipped"),
        )
    )
