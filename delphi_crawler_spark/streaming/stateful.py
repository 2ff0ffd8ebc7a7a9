"""Custom stateful streaming operator: per-host token-bucket politeness
whose bucket position SURVIVES across micro-batches (§2.8).

The batch engine's ``assign_emission_slots`` ranks within one round; in a
continuous stream the reference's throttle is stateful — the bucket
remembers how many elements a host has already emitted
(``throttle(5/s, maxBurst 5, shaping)``, Configuration.scala:80,101). The
built-in streaming operators cannot express "continue this host's emission
schedule where the last micro-batch left off", so this is the engine's
``applyInPandasWithState`` operator: state = rows already emitted per host;
each batch's new arrivals get the NEXT bucket slots, exactly as if every
batch so far had been one big round.

Determinism: within a batch, a host's arrivals are ordered by the explicit
total scheduling order (priority DESC, discovery_ts, seq) — the same order
the batch operator uses — so for data arriving in seq order the cumulative
stream output is byte-equal to the batch operator run over the union
(property-tested in tests/test_streaming_stateful.py).

Scale: state is ONE counter per host (a long), grouped on the same host
key the politeness window shuffles on; GroupStateTimeout can evict idle
hosts (unbounded-host crawls keep bounded state).
"""

from __future__ import annotations

import math
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

DEFAULT_RATE = 5.0  # reference Configuration.scala:80
DEFAULT_BURST = 5

_STATE_SCHEMA = StructType([StructField("emitted", LongType())])

_OUT_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("url", StringType()),
        StructField("priority", IntegerType()),
        StructField("discovery_ts", TimestampType()),
        StructField("seq", LongType()),
        StructField("host_rank", LongType()),
        StructField("emit_ms", LongType()),
    ]
)


def _emit_ms(rank: int, rate: float, burst: int) -> int:
    return 0 if rank <= burst else math.ceil((rank - burst) * 1000.0 / rate)


def _make_func(rate: float, burst: int):
    def assign(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (host,) = key
        (emitted,) = state.get if state.exists else (0,)
        frames = [pdf for pdf in pdfs if len(pdf)]
        if frames:
            batch = pd.concat(frames, ignore_index=True)
            # the batch operator's per-host scheduling order (P6 ⊇ P3)
            batch = batch.sort_values(
                ["priority", "discovery_ts", "seq"],
                ascending=[False, True, True],
                kind="mergesort",
            ).reset_index(drop=True)
            ranks = emitted + 1 + batch.index.to_numpy()
            out = pd.DataFrame(
                {
                    "host": host,
                    "url": batch["url"],
                    "priority": batch["priority"],
                    "discovery_ts": batch["discovery_ts"],
                    "seq": batch["seq"],
                    "host_rank": ranks,
                    "emit_ms": [_emit_ms(int(r), rate, burst) for r in ranks],
                }
            )
            emitted += len(batch)
            state.update((emitted,))
            yield out
        else:
            state.update((emitted,))

    return assign


def stateful_emission_slots(
    candidates: DataFrame,
    rate: float = DEFAULT_RATE,
    burst: int = DEFAULT_BURST,
) -> DataFrame:
    """Streaming per-host token bucket: each host's ``host_rank``/``emit_ms``
    continues across micro-batches (GroupState counter per host). Works on a
    streaming DataFrame grouped on host; the shuffle key is the same host
    key the batch window uses."""
    return (
        candidates.select("host", "url", "priority", "discovery_ts", "seq")
        .groupBy("host")
        .applyInPandasWithState(
            _make_func(rate, burst),
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ------------------------------------------------- streaming heavy hitters

_HH_STATE_SCHEMA = StructType(
    [
        StructField("keys", ArrayType(StringType())),
        StructField("cnts", ArrayType(LongType())),
    ]
)

_HH_OUT_SCHEMA = StructType(
    [
        StructField("bucket", LongType()),
        StructField("key", StringType()),
        StructField("lower_bound", LongType()),
    ]
)


def _make_hh_func(k: int):
    from delphi_crawler_spark.operators.heavy import _mg_fold

    def fold(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (bucket,) = key
        if state.exists:
            keys, cnts = state.get
            summary = {str(a): int(b) for a, b in zip(list(keys), list(cnts))}
        else:
            summary = {}
        for pdf in pdfs:
            if len(pdf):
                summary = _mg_fold(summary, pdf["key"].value_counts(), k)
        state.update((list(summary.keys()), [int(v) for v in summary.values()]))
        if summary:
            yield pd.DataFrame(
                {
                    "bucket": int(bucket),
                    "key": list(summary.keys()),
                    "lower_bound": [int(v) for v in summary.values()],
                }
            )

    return fold


def streaming_heavy_hitter_candidates(
    stream: DataFrame,
    key_col: str = "key",
    k: int = 10,
    buckets: int = 32,
) -> DataFrame:
    """Bounded-state streaming frequency sketch (§2.8 + the batch
    ``operators/heavy.py`` two-pass, fused into a stream): keys hash into
    ``buckets`` groups; each group's ``GroupState`` is ONE Misra–Gries
    summary of at most ``k`` counters, folded per micro-batch with the
    SAME mergeable-summaries rule as the batch sketch (shared ``_mg_fold``
    — stream and batch provably agree). Every trigger emits each bucket's
    current summary in update mode.

    Guarantee (pigeonhole per bucket, since the hash routes every
    occurrence of a key to one bucket): any key whose TRUE stream count is
    ≥ (that bucket's row count)/k — in particular any key ≥ n/k globally —
    is present, and ``lower_bound`` never exceeds the true count. State is
    O(buckets × k) regardless of stream length or key cardinality; the
    exact verify (batch heavy_hitters' second pass) runs downstream over
    the stored stream when exact counts are needed."""
    keyed = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(buckets)).alias(
            "bucket"
        ),
    )
    return keyed.groupBy("bucket").applyInPandasWithState(
        _make_hh_func(k),
        outputStructType=_HH_OUT_SCHEMA,
        stateStructType=_HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------- streaming quantile-histogram sketch

_HS_STATE_SCHEMA = StructType(
    [
        StructField("ver", LongType()),
        StructField("buckets", ArrayType(LongType())),
        StructField("cnts", ArrayType(LongType())),
    ]
)

_HS_OUT_SCHEMA = StructType(
    [
        StructField("grp", StringType()),
        StructField("ver", LongType()),
        StructField("bucket", LongType()),
        StructField("cnt", LongType()),
    ]
)


def _hs_fold(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState):
    (grp,) = key
    if state.exists:
        ver, bks, cs = state.get
        seg = {int(b): int(c) for b, c in zip(list(bks), list(cs))}
    else:
        ver, seg = 0, {}
    for pdf in pdfs:
        if len(pdf):
            # fold = count-sum per bucket: the SAME merge rule as the batch
            # merge_segments hash-agg, so stream state == batch segment
            for b, c in pdf["bucket"].value_counts().items():
                seg[int(b)] = seg.get(int(b), 0) + int(c)
    ver += 1
    state.update((ver, list(seg.keys()), [int(v) for v in seg.values()]))
    if seg:
        yield pd.DataFrame(
            {
                "grp": str(grp),
                "ver": int(ver),
                "bucket": list(seg.keys()),
                "cnt": [int(v) for v in seg.values()],
            }
        )


def streaming_hist_segments(
    stream: DataFrame,
    value_col: str,
    by: str,
    digits: int = 3,
) -> DataFrame:
    """Bounded-state streaming quantile-histogram sketch (§2.8 + the batch
    ``operators/histsketch.py``, fused into a stream): values truncate to
    the SAME significant-digit grid (shared ``sig_trunc`` expression), each
    group's ``GroupState`` is its (bucket → count) segment, folded per
    micro-batch with the same count-sum rule as the batch
    ``merge_segments`` — so the stream's state after any prefix of batches
    EQUALS the batch segment built over that prefix, and the batch
    ``hist_quantiles`` read gives the exact same percentiles either way
    (parity-pinned in tests/test_streaming_stateful.py).

    Every trigger emits each updated group's current segment stamped with a
    monotone ``ver`` (take a group's max-``ver`` rows for its latest
    segment). State is O(grid buckets) per group — ≤900 per decade, ≤ ~17k
    for the full bigint range — regardless of stream length."""
    from delphi_crawler_spark.operators.histsketch import sig_trunc

    v = F.col(value_col).cast("bigint")
    keyed = stream.where(v.isNotNull() & (v >= 0)).select(
        F.col(by).cast("string").alias("grp"),
        sig_trunc(v, digits).alias("bucket"),
    )
    return keyed.groupBy("grp").applyInPandasWithState(
        _hs_fold,
        outputStructType=_HS_OUT_SCHEMA,
        stateStructType=_HS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_GS_STATE = StructType(
    [
        StructField("ranks", ArrayType(StringType())),
        StructField("seqs", ArrayType(LongType())),
        StructField("n_seen", LongType()),
    ]
)

_GS_OUT = StructType(
    [
        StructField("key", StringType()),
        StructField("seq", LongType()),
        StructField("rank_hex", StringType()),
        StructField("n_seen", LongType()),
    ]
)


def _gs_rank(key: str, seq: int) -> str:
    import hashlib

    return hashlib.md5(f"{key}|{seq}".encode()).hexdigest()


def _make_gs_func(k: int):
    def fold(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState):
        kstr = key[0]
        if state.exists:
            ranks, seqs, n = state.get
            pool = list(zip(list(ranks), list(seqs)))
        else:
            pool, n = [], 0
        for pdf in pdfs:
            for seq in pdf["seq"]:
                s = int(seq)
                pool.append((_gs_rank(kstr, s), s))
                n += 1
        pool.sort()  # (rank_hex asc, seq asc) — md5 collisions tie-break by seq
        pool = pool[: int(k)]
        state.update(([r for r, _ in pool], [s for _, s in pool], n))
        yield pd.DataFrame(
            {
                "key": [kstr] * len(pool),
                "seq": [s for _, s in pool],
                "rank_hex": [r for r, _ in pool],
                "n_seen": [n] * len(pool),
            }
        )

    return fold


def streaming_group_sample(
    stream: DataFrame,
    k: int,
    key_col: str = "key",
    seq_col: str = "seq",
) -> DataFrame:
    """Stateful streaming per-key uniform sample of size k — the
    DETERMINISTIC reservoir: keep the k items with the smallest
    ``md5(key|seq)``. Bottom-k priority sampling is uniform over any
    prefix (each item's rank is an i.i.d. hash draw), mergeable, and —
    unlike the classic rng reservoir — replayable: the stream's
    cumulative sample after any number of micro-batches is byte-equal to
    the batch bottom-k over the union of those batches (the property the
    parity test pins), so checkpoint recovery and reprocessing converge
    to the identical sample. Same rank rule as the batch samplers
    (md5-rank windows, ``operators/sampling.py``).

    State per key is exactly k (rank, seq) pairs + one counter —
    bounded forever; emission each micro-batch is the current reservoir
    snapshot tagged with ``n_seen`` (take the max-n_seen rows per key
    downstream)."""
    renamed = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(seq_col).cast("long").alias("seq"),
    )
    return renamed.groupBy("key").applyInPandasWithState(
        _make_gs_func(k),
        outputStructType=_GS_OUT,
        stateStructType=_GS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
