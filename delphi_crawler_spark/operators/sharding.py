"""Deterministic corpus sharding with balance telemetry.

The last step of a training-data build writes the kept corpus into N
output shards (files/buckets a trainer streams independently). Two
requirements: the assignment must be *deterministic* (resumable runs and
incremental rebuilds must route a document to the same shard forever —
``rand()`` or ``spark_partition_id()`` would not), and the shards must be
*balanced in token weight*, not just document count, or one data-loader
starves. Hash assignment gives both: md5 is uniform, so by law of large
numbers every shard's weight converges to total/N with relative error
O(1/sqrt(docs_per_shard)) — the balance report makes that measurable
instead of assumed.

Scale shape: the assignment is one pure-JVM projection (md5 + conv —
codegen'd, no Python, no shuffle); the balance report is one
partial-aggregating hash-agg on shard_id (N rows) plus a scalar total.
Writing then uses ``df.write.partitionBy(shard_col)`` (or
``repartition(shard_col)`` first for one file per shard) — the plan
stays a single exchange on a perfectly uniform key.

Reference parity: the reference emits into a single ElasticSearch index
(ElasticActor upserts) and has no shard-output notion; this closes the
training-data tier's write path (SURVEY §2.10), downstream of
``pipeline_training_prep``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shard_id(id_col: Column, n_shards: int) -> Column:
    """Portable deterministic shard assignment: first 8 hex digits of
    md5(id) as an integer, mod n_shards. Engine-portable (any SQL engine
    with md5 + hex parse reproduces it bit-for-bit)."""
    h = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10)
    return (h.cast("bigint") % n_shards).alias("shard_id")


def shard_plan(
    docs: DataFrame,
    id_col: str,
    weight_col: str,
    n_shards: int,
) -> DataFrame:
    """Per-shard balance report: ``(shard_id, n_docs, total_weight,
    weight_share)`` where weight_share = shard weight / corpus weight
    (rounded to 6; ideal = 1/n_shards). Empty shards (possible when
    docs << shards) simply have no row — the consumer treats absence
    as zero."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    assigned = docs.select(
        shard_id(F.col(id_col), n_shards),
        F.col(weight_col).cast("bigint").alias("w"),
    )
    per_shard = assigned.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("w").alias("total_weight")
    )
    # corpus total as a scalar aggregate over the assignment itself (map-side
    # partial sums -> one-row exchange) so the shard-grain agg runs once
    total = assigned.agg(F.sum("w").alias("corpus_weight"))
    return per_shard.crossJoin(F.broadcast(total)).select(
        "shard_id",
        "n_docs",
        "total_weight",
        F.round(F.col("total_weight") / F.col("corpus_weight"), 6).alias(
            "weight_share"
        ),
    )


def archive_offsets(
    records: DataFrame,
    id_col: str,
    length_col: str,
    n_shards: int,
    header_bytes: int = 0,
) -> DataFrame:
    """Byte-exact placement manifest for packed-archive shard writes — the
    (shard, offset, length) index a WARC-style store needs so readers can
    random-access one record without scanning the shard (the public
    WARC/CDX pattern: concatenated records + an offset index).

    Each record goes to ``shard_id(id)`` (same deterministic md5 routing
    as ``shard_plan`` — a rebuilt corpus reproduces identical placement);
    within a shard records are laid out in ``id`` order and
    ``offset`` = header_bytes + Σ lengths of all earlier records (an
    EXCLUSIVE running sum, so the first record starts at the header
    boundary). ``rec_index`` is the 0-based position. Determinism makes
    the manifest itself mergeable: an incremental append computes its
    offsets from the previous manifest's per-shard byte totals.

    Scale shape: one exchange on the uniform shard key, then a
    per-shard window (running sum + row_number share the single sort).
    No Python, no driver state; shard count caps partition width so the
    window never sees skew beyond corpus/n_shards.

    Reference parity: the reference upserts into ElasticSearch and keeps
    no byte-addressed archive; this is the write-side complement of
    ``shard_plan`` for the training-data tier (SURVEY §2.10).
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    assigned = records.select(
        F.col(id_col).alias("rec_id"),
        F.col(length_col).cast("bigint").alias("rec_len"),
        shard_id(F.col(id_col), n_shards),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("shard_id").orderBy("rec_id")
    prior = w.rowsBetween(Window.unboundedPreceding, -1)
    return assigned.select(
        "rec_id",
        "shard_id",
        (F.row_number().over(w) - 1).cast("bigint").alias("rec_index"),
        (
            F.lit(int(header_bytes))
            + F.coalesce(F.sum("rec_len").over(prior), F.lit(0))
        ).cast("bigint").alias("offset"),
        "rec_len",
    )


def _ring(n_shards: int, vnodes: int) -> list[tuple[str, int]]:
    import hashlib

    ring = []
    for s in range(n_shards):
        for v in range(vnodes):
            ring.append((hashlib.md5(f"s{s}v{v}".encode()).hexdigest()[:16], s))
    ring.sort()
    return ring


def consistent_hash_shards(
    keys: DataFrame,
    n_shards: int,
    vnodes: int = 64,
    key_col: str = "host",
) -> DataFrame:
    """Consistent-hash shard assignment with virtual nodes (Karger et al.
    STOC'97 / the memcached ring): a key belongs to the first ring
    position clockwise from ``md5(key)``. The property a frontier needs
    when the executor fleet resizes: going n → n+1 shards moves only
    ~1/(n+1) of keys (hash-mod moves ~all of them), so per-shard frontier
    state, bloom segments and politeness queues stay where they are.
    Virtual nodes smooth the load split to ±a few % at vnodes ≥ 64.

    Scale shape: the ring is data-independent and tiny (n·vnodes
    entries) — embedded as two aligned codegen literal arrays (the PSL
    suffix-array trick, ``domains.py``), so assignment is a pure
    zero-shuffle JVM projection: array_min over positions ≥ the key's
    hash, wrapping to the ring's global minimum.
    """
    ring = _ring(n_shards, vnodes)
    positions = F.array(*[F.lit(p) for p, _ in ring])
    pos_to_shard = F.create_map(
        *[x for p, s in ring for x in (F.lit(p), F.lit(s))]
    )
    key_hash = F.substring(F.md5(F.col(key_col)), 1, 16)
    ge = F.filter(positions, lambda p: p >= key_hash)
    chosen = F.when(F.size(ge) > 0, F.array_min(ge)).otherwise(
        F.array_min(positions)
    )
    return keys.select(
        F.col(key_col).alias(key_col),
        key_hash.alias("key_hash"),
        pos_to_shard[chosen].cast("int").alias("shard"),
    )
