"""Small-file compaction planning — the lakehouse maintenance pass.

A 10^10-URL frontier appended in per-round batches accumulates small
parquet files fast (one file per partition per round); scan cost then
degrades from task-scheduling overhead and poor columnar compression
long before data volume is the problem. Iceberg/Delta solve it with a
bin-packing "optimize" pass; this module computes that plan as a pure
DataFrame query over the file manifest, so the rewrite itself stays an
ordinary partitioned read→write of the planned groups.

Policy (deterministic, oracle-able):
- only files smaller than ``small_bytes`` (default target/2) are
  candidates — rewriting an already-right-sized file is wasted IO;
- within a table partition, candidates are ordered by (size desc,
  file_id asc) and packed by exclusive running sum into bins of
  ``target_bytes`` (next-fit on a sorted stream — within 2× of optimal
  bin count, and unlike first-fit it is expressible as ONE window
  cumulative sum, no iteration);
- singleton groups (one candidate alone in its bin with nothing else in
  the partition bin) still compact iff the partition has ≥2 candidates
  overall — compacting a lone small file rewrites bytes for nothing.

Scale shape: the manifest is tiny relative to data (one row per file),
but the plan still avoids any driver collect: one window over
(partition) — the natural manifest grain — and one broadcast-joinable
per-partition count. Output one row per candidate file with its
``compact_group``; non-candidates carry group -1.

Reference parity: none (Elasticsearch hides segment merges); this is
the §2.10 lakehouse-operations superset next to ``storage/zorder.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def compaction_plan(
    manifest: DataFrame,
    target_bytes: int,
    small_bytes: int | None = None,
    partition_col: str = "part",
    file_col: str = "file_id",
    size_col: str = "size_bytes",
) -> DataFrame:
    """Per-file compaction assignment over a file manifest.

    Output: (part, file_id, size_bytes, is_candidate, compact_group)
    where ``compact_group`` numbers bins within each partition from 0
    and is -1 for files left alone (right-sized files, and partitions
    with fewer than 2 candidates).
    """
    if target_bytes <= 0:
        raise ValueError("target_bytes must be > 0")
    small = int(small_bytes) if small_bytes is not None else int(target_bytes) // 2
    part = F.col(partition_col)
    size = F.col(size_col).cast("bigint")
    m = manifest.select(
        part.alias("part"),
        F.col(file_col).alias("file_id"),
        size.alias("size_bytes"),
        (size < F.lit(small)).alias("is_candidate"),
    )
    w = (
        Window.partitionBy("part")
        .orderBy(F.col("size_bytes").desc(), F.col("file_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # exclusive running sum over candidates only: inclusive - self
    run_incl = F.sum(
        F.when(F.col("is_candidate"), F.col("size_bytes")).otherwise(F.lit(0))
    ).over(w)
    run_excl = run_incl - F.when(
        F.col("is_candidate"), F.col("size_bytes")
    ).otherwise(F.lit(0))
    n_cand = F.sum(F.when(F.col("is_candidate"), 1).otherwise(0)).over(
        Window.partitionBy("part")
    )
    grp = F.floor(run_excl / F.lit(int(target_bytes))).cast("bigint")
    return m.select(
        "part",
        "file_id",
        "size_bytes",
        "is_candidate",
        F.when(F.col("is_candidate") & (n_cand >= 2), grp)
        .otherwise(F.lit(-1))
        .cast("bigint")
        .alias("compact_group"),
    )


def snapshot_expiry_plan(
    snapshots: DataFrame,
    now_ms: int,
    keep_last: int = 5,
    keep_daily_days: int = 7,
    table_col: str = "table_name",
    snap_col: str = "snapshot_id",
    ts_col: str = "committed_ms",
) -> DataFrame:
    """Snapshot retention planning (Iceberg ``expire_snapshots``
    semantics, declaratively): per table keep (a) the ``keep_last`` most
    recent snapshots unconditionally and (b) the LAST snapshot of each
    UTC day within ``keep_daily_days`` of ``now_ms`` — everything else
    expires, which is what bounds manifest/metadata growth on a
    continuously-appending frontier table.

    One (table) window for recency rank + one (table, day) window for
    the daily survivor, sharing the same table-hash exchange. Output per
    snapshot: recency_rank, is_daily_keeper, expire (bool) and reason
    ('recent' / 'daily' / 'expire')."""
    day = F.floor(F.col(ts_col).cast("bigint") / F.lit(86_400_000)).cast("bigint")
    w_recent = Window.partitionBy(table_col).orderBy(
        F.col(ts_col).desc(), F.col(snap_col).desc()
    )
    w_daily = Window.partitionBy(table_col, day).orderBy(
        F.col(ts_col).desc(), F.col(snap_col).desc()
    )
    rank = F.row_number().over(w_recent)
    daily_rank = F.row_number().over(w_daily)
    cutoff = int(now_ms) - int(keep_daily_days) * 86_400_000
    is_daily = (daily_rank == 1) & (F.col(ts_col).cast("bigint") >= F.lit(cutoff))
    keep_recent = rank <= F.lit(int(keep_last))
    return snapshots.select(
        table_col,
        F.col(snap_col).cast("bigint").alias(snap_col),
        F.col(ts_col).cast("bigint").alias(ts_col),
        rank.cast("bigint").alias("recency_rank"),
        is_daily.alias("is_daily_keeper"),
        (~(keep_recent | is_daily)).alias("expire"),
        F.when(keep_recent, F.lit("recent"))
        .when(is_daily, F.lit("daily"))
        .otherwise(F.lit("expire"))
        .alias("reason"),
    )


def orphan_file_plan(
    listing: DataFrame,
    referenced: DataFrame,
    now_ms: int,
    grace_ms: int = 3 * 86_400_000,
    path_col: str = "path",
    mtime_col: str = "mtime_ms",
) -> DataFrame:
    """Iceberg ``remove_orphan_files``-style GC plan: classify every path
    from a storage LISTING against the set of manifest-REFERENCED paths.

    - ``orphan``  — listed, unreferenced, and older than ``grace_ms``:
      safe to delete (the grace window protects files written by
      in-flight commits whose manifest isn't visible yet — deleting
      young unreferenced files races active writers, the classic
      orphan-GC footgun);
    - ``recent_unreferenced`` — listed, unreferenced, young: keep for now;
    - ``ok`` — listed and referenced;
    and, from the other direction, ``missing`` — referenced but absent
    from the listing (corruption / external deletion: a read of that
    snapshot WILL fail; surfacing it here is the point of the audit).

    Returns (path, mtime_ms nullable, referenced, status, delete).
    Shape: one full-outer hash-join on path + a JVM projection; both
    sides are metadata tables (file counts, not file bytes). The
    engine-side twin that acts on its own store is
    ``tablestore.TableStore.expire`` (tablestore.py:460); this is the
    planner over ARBITRARY listings that lets operators audit before
    acting."""
    li = listing.select(
        F.col(path_col).alias("path"),
        F.col(mtime_col).cast("bigint").alias("mtime_ms"),
        F.lit(True).alias("_listed"),
    )
    rf = referenced.select(F.col(path_col).alias("path")).distinct().withColumn(
        "_ref", F.lit(True)
    )
    j = li.join(rf, "path", "full_outer")
    in_listing = F.coalesce(F.col("_listed"), F.lit(False))
    ref = F.coalesce(F.col("_ref"), F.lit(False))
    old = F.col("mtime_ms") <= F.lit(int(now_ms - grace_ms))
    status = (
        F.when(~in_listing, F.lit("missing"))
        .when(ref, F.lit("ok"))
        .when(old, F.lit("orphan"))
        .otherwise(F.lit("recent_unreferenced"))
    )
    return j.select(
        "path",
        "mtime_ms",
        ref.alias("referenced"),
        status.alias("status"),
        (status == "orphan").alias("delete"),
    )


def backfill_islands(
    present: DataFrame,
    source_col: str = "source",
    part_col: str = "part",
) -> DataFrame:
    """Backfill planning over time-partitioned data: find the MISSING
    partitions inside each source's own [min, max] span and coalesce
    consecutive misses into islands — a backfill scheduler wants "hours
    14–17 of source A" as ONE range job, not four tickets.

    The gaps-and-islands shape: missing partitions get a group key
    ``part − row_number()`` (constant exactly within a consecutive run),
    then one (source, island) hash-agg emits (source, start_part,
    end_part, n_missing). The sequence explode and the window both run
    on per-source partition-ID tables (spans, not data — the
    key_skew_gini discipline). Sources with no gaps emit nothing."""
    p = present.select(
        F.col(source_col).alias("source"), F.col(part_col).cast("bigint").alias("part")
    ).distinct()
    span = p.groupBy("source").agg(
        F.min("part").alias("p0"), F.max("part").alias("p1")
    )
    grid = span.select(
        "source", F.explode(F.sequence("p0", "p1")).alias("part")
    )
    missing = grid.join(p, ["source", "part"], "left_anti")
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy("part")
    isl = missing.withColumn(
        "island", F.col("part") - F.row_number().over(w)
    )
    return (
        isl.groupBy("source", "island")
        .agg(
            F.min("part").alias("start_part"),
            F.max("part").alias("end_part"),
            F.count(F.lit(1)).cast("bigint").alias("n_missing"),
        )
        .select("source", "start_part", "end_part", "n_missing")
    )


def ttl_expiry_plan(
    rows: DataFrame,
    now_ms: int,
    ttl_ms: int,
    file_col: str = "file_id",
    ts_col: str = "created_ms",
    rewrite_threshold: float = 0.3,
) -> DataFrame:
    """Row-TTL maintenance planning (retention enforcement over an
    immutable-file store): per data file, how many rows have outlived
    ``ttl_ms`` and the cheapest way to drop them — a DELETE VECTOR when
    the expired share is small (mark rows, keep the file), a REWRITE
    when the file is mostly dead (copy the survivors, reclaim the
    space); files with nothing expired are left untouched.

    The threshold is the standard merge-on-read vs copy-on-write
    break-even knob (Iceberg v2 positional deletes / Delta DVs). One
    (file) hash-agg over row timestamps — exact integer counts, share
    rounded 6. Returns (file_id, n_rows, n_expired, expired_share,
    action ∈ none|delete_vector|rewrite)."""
    if ttl_ms <= 0:
        raise ValueError("ttl_expiry_plan() needs ttl_ms > 0")
    cutoff = int(now_ms - ttl_ms)
    expired = (F.col(ts_col) <= F.lit(cutoff)).cast("int")
    agg = rows.groupBy(F.col(file_col).alias("file_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(expired).cast("bigint").alias("n_expired"),
    )
    share = F.round(
        F.col("n_expired").cast("double") / F.col("n_rows").cast("double"), 6
    )
    action = (
        F.when(F.col("n_expired") == 0, F.lit("none"))
        .when(share >= F.lit(float(rewrite_threshold)), F.lit("rewrite"))
        .otherwise(F.lit("delete_vector"))
    )
    return agg.select(
        "file_id", "n_rows", "n_expired", share.alias("expired_share"),
        action.alias("action"),
    )
