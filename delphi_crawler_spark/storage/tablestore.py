"""Snapshot-atomic keyed table store (reference parity: S4-S6, S10, §2.8).

The reference persists everything in one Elasticsearch index with idempotent
keyed upserts — ``indexInto(...).id(uniqueString)`` for inserts
(ElasticStoreQueries.scala:63-75), lookup-then-partial-update for analytics
(ElasticStoreQueries.scala:38-50), and find-or-create-then-update for edges
(ElasticCallGraphActor.scala:31-59,87-93) — with the index schema created
up-front if absent (ElasticIndexPreflightCheck.scala:42-49,
ElasticIndexMaintenance.scala:30-77).

In production this engine targets **Iceberg**: each of these sinks is a
single ``MERGE INTO`` with WHEN MATCHED / WHEN NOT MATCHED branches, tables
partitioned by ``bucket(N, host_rev)``, and each crawl round committed as
one atomic snapshot. The sandbox ships no Iceberg runtime jar, so this
module provides the same contract over plain parquet:

- every write is a **new immutable snapshot directory**; a ``_current``
  pointer file is swapped with ``os.replace`` (atomic on POSIX) — readers
  always see a complete snapshot, a killed writer leaves the old snapshot
  intact (the resume-equivalence property, SURVEY.md §5d);
- ``merge_upsert`` implements MERGE semantics as anti-join + union — the
  exact plan Iceberg's copy-on-write MERGE runs under the hood;
- snapshots are retained, so time-travel/rollback for resume is free.

The API is deliberately shaped so a production deployment swaps the bodies
for ``spark.sql("MERGE INTO ...")`` without touching callers.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_frames(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    update_cols: list[str] | None = None,
    insert: bool = True,
) -> DataFrame:
    """The MERGE INTO plan as a pure DataFrame transform — untouched rows
    (left_anti) ∪ matched-updated rows ∪ (optionally) inserted rows. This is
    exactly the copy-on-write plan Iceberg's MERGE runs; ``TableStore.
    merge_upsert`` commits it as a snapshot (reference keyed upserts,
    ElasticStoreQueries.scala:38-50,63-75; ElasticCallGraphActor.scala:31-59).
    """
    untouched = target.join(source, keys, "left_anti")
    if update_cols is not None:
        src_renamed = source.select(
            *keys, *[F.col(c).alias(f"__src_{c}") for c in update_cols]
        )
        matched = target.join(src_renamed, keys, "inner").select(
            *[
                (F.col(f"__src_{c}") if c in update_cols else F.col(c)).alias(c)
                for c in target.columns
            ]
        )
    else:
        matched = source.join(target.select(*keys), keys, "left_semi").select(
            *target.columns
        )
    merged = untouched.unionByName(matched)
    if insert:
        inserted = source.join(target.select(*keys), keys, "left_anti").select(
            *target.columns
        )
        merged = merged.unionByName(inserted)
    return merged


@dataclass
class TableStore:
    spark: SparkSession
    root: str

    # ------------------------------------------------------------- internals
    def _tdir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _current_file(self, table: str) -> str:
        return os.path.join(self._tdir(table), "_current")

    def _current_snap(self, table: str) -> str | None:
        try:
            with open(self._current_file(table)) as f:
                return f.read().strip() or None
        except FileNotFoundError:
            return None

    def _snap_path(self, table: str, snap: str) -> str:
        return os.path.join(self._tdir(table), snap)

    # ------------------------------------------------------------------- API
    def exists(self, table: str) -> bool:
        """Preflight existence check (reference
        ElasticIndexPreflightCheck.scala:31-55)."""
        return self._current_snap(table) is not None

    def read(self, table: str) -> DataFrame:
        snap = self._current_snap(table)
        if snap is None:
            raise FileNotFoundError(f"table {table!r} has no committed snapshot")
        return self.spark.read.parquet(self._snap_path(table, snap))

    def write_snapshot(
        self,
        table: str,
        df: DataFrame,
        partition_by: list[str] | None = None,
        sort_within_partitions: list[str] | None = None,
    ) -> str:
        """Commit ``df`` as the table's new current snapshot, atomically.

        ``partition_by`` is the Iceberg ``PARTITIONED BY`` analogue (we use
        host buckets for the frontier so per-host politeness windows and
        host-keyed joins get partition pruning). ``sort_within_partitions``
        keeps files range-clustered for downstream merge joins.
        """
        os.makedirs(self._tdir(table), exist_ok=True)
        snap = f"snap-{int(time.time() * 1000):013d}-{uuid.uuid4().hex[:8]}"
        path = self._snap_path(table, snap)
        if sort_within_partitions:
            df = df.sortWithinPartitions(*sort_within_partitions)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        tmp = self._current_file(table) + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(snap)
        os.replace(tmp, self._current_file(table))  # atomic commit point
        return snap

    def merge_upsert(
        self,
        table: str,
        source: DataFrame,
        key: str | list[str],
        update_cols: list[str] | None = None,
        insert: bool = True,
        partition_by: list[str] | None = None,
    ) -> str:
        """MERGE INTO table USING source ON key — idempotent keyed upsert.

        - matched + ``update_cols``: target row keeps its identity, listed
          columns replaced from source (reference partial update,
          ElasticStoreQueries.scala:38-50)
        - matched + no ``update_cols``: whole row replaced
        - not matched + ``insert``: source row inserted (reference
          insert-if-new, ElasticStoreQueries.scala:63-75; S6's
          upsert-or-create is both branches at once)

        Production body: one ``spark.sql("MERGE INTO ...")`` on Iceberg.
        """
        keys = [key] if isinstance(key, str) else list(key)
        if not self.exists(table):
            merged = source if insert else source.limit(0)
            return self.write_snapshot(table, merged, partition_by=partition_by)
        target = self.read(table)
        merged = merge_frames(target, source, keys, update_cols, insert)
        return self.write_snapshot(table, merged, partition_by=partition_by)

    def append(
        self, table: str, df: DataFrame, partition_by: list[str] | None = None
    ) -> str:
        """Append rows (new snapshot = old ∪ new)."""
        if self.exists(table):
            df = self.read(table).unionByName(df)
        return self.write_snapshot(table, df, partition_by=partition_by)

    # ------------------------------------------------------- checkpoint API
    def checkpoint(self, round_no: int, payload: dict) -> None:
        """Record a completed round. Written LAST in a round — a round is
        resumable iff its checkpoint row exists (SURVEY.md §2.8: snapshot-
        atomic batch commit -> exact resume equivalence)."""
        os.makedirs(self._tdir("checkpoints"), exist_ok=True)
        rec = {"round": round_no, **payload}
        tmp = os.path.join(self._tdir("checkpoints"), f".tmp-{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, os.path.join(self._tdir("checkpoints"), f"round-{round_no:06d}.json"))

    def last_checkpoint(self) -> dict | None:
        d = self._tdir("checkpoints")
        if not os.path.isdir(d):
            return None
        rounds = sorted(f for f in os.listdir(d) if f.startswith("round-"))
        if not rounds:
            return None
        with open(os.path.join(d, rounds[-1])) as f:
            return json.load(f)

    def current_snapshot(self, table: str) -> str | None:
        """Current snapshot id (recorded in checkpoints for exact resume)."""
        return self._current_snap(table)

    def restore(self, table: str, snap: str) -> None:
        """Roll the table's pointer back to an earlier snapshot (Iceberg
        time-travel / rollback analogue) — used on resume to discard the
        uncommitted mutations of a killed round."""
        if not os.path.isdir(self._snap_path(table, snap)):
            raise FileNotFoundError(f"snapshot {snap!r} of {table!r} not found")
        tmp = self._current_file(table) + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(snap)
        os.replace(tmp, self._current_file(table))

    def drop(self, table: str) -> None:
        shutil.rmtree(self._tdir(table), ignore_errors=True)
