"""Sequence packing: documents → fixed-token-budget training sequences.

LM trainers consume fixed-length context windows; feeding one short
document per window wastes most of the batch, so pipelines *pack*
documents back-to-back into sequences of at most ``budget`` tokens
(GPT-3 / T5 pretraining practice; Krell et al. 2022 survey the packing
variants). The deterministic classic is **greedy next-fit in corpus
order**: walk documents in a fixed total order, append each to the
current sequence iff it still fits, else open a new sequence; a document
longer than the budget gets a sequence of its own (the trainer truncates
or windows it downstream). Next-fit is the only variant whose output is
a pure function of the document ORDER — first-fit/best-fit depend on the
whole bin state and re-pack differently when a shard is re-split — so it
is the one a resumable, engine-portable pipeline wants.

Scale shape: packing is inherently sequential *within* a shard, so the
parallel grain is the shard (the writer's output-file grain, assigned
upstream by ``sharding.shard_id`` — 10^3..10^5 shards at corpus scale).
One hash repartition on the shard key, then ``applyInPandas`` per shard
carrying ONLY (id, weight) — at 100 TB / 3 KB docs / 8192 shards that is
~4M rows × 16 B ≈ 64 MB per group, comfortably in-executor; the text
itself never moves (join the plan back on doc_id). Inside the group the
walk is not a per-row Python loop: with the cumulative-sum array ``cum``,
the sequence starting at doc i ends at the last j with
``cum[j] - cum[i-1] <= budget`` (clamped to ≥ i for oversized docs), so
the loop advances one *sequence* per step via ``np.searchsorted`` —
O(n_sequences · log n_docs), vectorized everywhere else.

Reference parity: the reference ships documents to a single index and
has no training-write notion; this extends the §2.10 training-data tier
downstream of ``sharding.shard_plan`` (same shard grain).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OUT_SCHEMA = (
    "shard bigint, doc_id bigint, n_tokens bigint, seq_id bigint, "
    "pos_in_seq bigint, tok_offset bigint, seq_tokens bigint"
)


def _pack_group(pdf: pd.DataFrame, budget: int) -> pd.DataFrame:
    pdf = pdf.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
    tok = pdf["n_tokens"].to_numpy(np.int64)
    n = len(tok)
    cum = np.cumsum(tok)
    starts = []  # first doc index of each sequence
    i = 0
    while i < n:  # one iteration per SEQUENCE, not per doc
        starts.append(i)
        base = cum[i - 1] if i else 0
        j = int(np.searchsorted(cum, base + budget, side="right")) - 1
        i = max(j, i) + 1  # oversized doc (j < i): own sequence
    starts_a = np.asarray(starts, dtype=np.int64)
    seq_id = np.cumsum(np.bincount(starts_a, minlength=n + 1))[:n] - 1
    base_per_seq = np.where(starts_a > 0, cum[starts_a - 1], 0)
    pos_in_seq = np.arange(n, dtype=np.int64) - starts_a[seq_id]
    tok_offset = cum - tok - base_per_seq[seq_id]
    ends = np.append(starts_a[1:], n) - 1
    seq_tokens = cum[ends] - base_per_seq
    return pd.DataFrame(
        {
            "shard": pdf["shard"].to_numpy(np.int64),
            "doc_id": pdf["doc_id"].to_numpy(np.int64),
            "n_tokens": tok,
            "seq_id": seq_id,
            "pos_in_seq": pos_in_seq,
            "tok_offset": tok_offset,
            "seq_tokens": seq_tokens[seq_id],
        }
    )


def pack_sequences(
    docs: DataFrame,
    id_col: str,
    weight_col: str,
    budget: int,
    shard_col: str = "shard",
) -> DataFrame:
    """Greedy next-fit packing of ``docs`` into per-shard training
    sequences of at most ``budget`` tokens, walking docs in ``id_col``
    order within each shard. Returns one row per document:
    ``(shard, doc_id, n_tokens, seq_id, pos_in_seq, tok_offset,
    seq_tokens)`` where ``seq_id`` is 0-based per shard, ``tok_offset``
    is the document's starting token position inside its sequence, and
    ``seq_tokens`` is the packed sequence's total fill (≤ budget except
    for single oversized documents). Deterministic: a pure function of
    (shard, id, weight)."""
    if budget < 1:
        raise ValueError("budget must be >= 1")
    slim = docs.select(
        F.col(shard_col).cast("bigint").alias("shard"),
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.col(weight_col).cast("bigint").alias("n_tokens"),
    )
    return slim.groupBy("shard").applyInPandas(
        lambda pdf: _pack_group(pdf, budget), schema=_OUT_SCHEMA
    )


def chunk_token_windows(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    seq_len: int,
    stride: int,
) -> DataFrame:
    """Packing's inverse: split each document's whitespace token stream
    into overlapping fixed-length context windows (BERT/GPT long-document
    convention: window w covers tokens ``[w*stride, w*stride+seq_len)``;
    windows are emitted until the stream is covered, so the last window may
    be shorter; a doc of ``<= seq_len`` tokens yields exactly one window).
    Returns ``(doc_id, win_id, start_tok, n_tok, window_text)``.

    Scale shape: entirely JVM (split → sequence → explode → slice →
    array_join inside whole-stage codegen), narrow — no shuffle, no Python.
    Fan-out is ``~n_tokens/stride`` rows per doc, each carrying only its
    own slice of text, so the exploded volume is ``seq_len/stride ×`` the
    corpus — the same constant a trainer's window loader would read."""
    if seq_len < 1 or stride < 1:
        raise ValueError("seq_len and stride must be >= 1")
    if stride > seq_len:
        # stride > seq_len leaves coverage gaps AND mints phantom trailing
        # windows (start past the stream, n_tok <= 0) — never meaningful.
        raise ValueError("stride must be <= seq_len (windows must cover)")
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    n = F.size(toks)
    n_win = F.when(n <= seq_len, F.lit(1)).otherwise(
        F.floor((n - seq_len + stride - 1) / stride).cast("bigint") + 1
    )
    win = docs.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        toks.alias("_toks"),
        n.cast("bigint").alias("_n"),
        F.explode(F.sequence(F.lit(0).cast("bigint"), n_win - 1)).alias("win_id"),
    )
    start = win["win_id"] * stride
    piece = F.slice(win["_toks"], (start + 1).cast("int"), seq_len)
    return win.select(
        "doc_id",
        "win_id",
        start.alias("start_tok"),
        F.least(F.lit(seq_len).cast("bigint"), win["_n"] - start).alias("n_tok"),
        F.array_join(piece, " ").alias("window_text"),
    )
