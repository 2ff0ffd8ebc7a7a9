"""Distributed BPE (byte-pair encoding) vocabulary training.

Sennrich, Haddow & Birch, "Neural Machine Translation of Rare Words with
Subword Units" (ACL 2016) — the standard subword-vocabulary construction a
training-data pipeline runs over its corpus before tokenization. The
reference engine has no analogue (SURVEY §2.10 training-data superset);
the published algorithm is the spec.

Shape at 100 TB — the key trick is the **distinct-word grain**: the corpus
is scanned ONCE into a ``(word, count)`` table (one corpus-sized hash-agg
with map-side partial counts), and every one of the K merge iterations
runs on that vocabulary-sized table (millions of rows, not billions):

  - pair counting = explode adjacent symbol pairs weighted by word count
    → one hash-agg per iteration over vocab-sized input;
  - argmax pair   = orderBy(count desc, pair asc).limit(1) — a TakeOrdered,
    driver receives ONE row per iteration;
  - merge         = a single-pass JVM ``F.aggregate`` fold per word
    (greedy left-to-right non-overlapping, exactly the reference
    algorithm's replacement scan), narrow, no shuffle;
  - ``localCheckpoint`` each iteration truncates the otherwise K-deep
    fold-on-fold lineage (same discipline as ``operators/graph.py``).

Ties in pair counts break (left asc, right asc) — deterministic at any
parallelism, matching the independent plain-Python oracle in
``tools/gen_expected.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"


def _empty_syms():
    # typed empty array<string> (slice of a dummy 1-element array)
    return F.slice(F.array(F.lit("")), 1, 0)


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → distinct-word grain: ``(word, cnt)``. The only
    corpus-sized pass in BPE training."""
    w = F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word")
    return (
        docs.select(w)
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _init_symbols(words: DataFrame) -> DataFrame:
    syms = F.concat(F.split("word", ""), F.array(F.lit(END)))
    return words.select("word", "cnt", syms.alias("syms"))


def _pair_counts(state: DataFrame) -> DataFrame:
    pairs = F.arrays_zip(
        F.slice("syms", 1, F.size("syms") - 1).alias("l"),
        F.expr("slice(syms, 2, size(syms) - 1)").alias("r"),
    )
    return (
        state.select("cnt", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("left"), F.col("p.r").alias("right"))
        .agg(F.sum("cnt").alias("pair_count"))
    )


def _merge_pair(state: DataFrame, left: str, right: str) -> DataFrame:
    """Greedy left-to-right non-overlapping replacement of the adjacent
    pair (left, right) with their concatenation — one JVM fold per word."""
    l, r = F.lit(left), F.lit(right)
    step = lambda acc, s: F.when(  # noqa: E731
        (F.size(acc) > 0) & (F.element_at(acc, -1) == l) & (s == r),
        F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.concat(l, r))),
    ).otherwise(F.concat(acc, F.array(s)))
    merged = F.aggregate("syms", _empty_syms(), step)
    return state.select("word", "cnt", merged.alias("syms"))


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 30,
    min_pair_count: int = 2,
) -> DataFrame:
    """Learn up to ``num_merges`` BPE merges over the corpus. Returns the
    merge table ``(merge_rank, left, right, pair_count)`` in learned order
    (rank 1 = first merge). Stops early when no pair reaches
    ``min_pair_count``. The final per-word symbol state is attached as
    ``result._bpe_state`` (a DataFrame ``(word, cnt, syms)``) so callers
    can read the trained vocabulary without re-encoding."""
    spark = docs.sparkSession
    state = _init_symbols(word_counts(docs, text_col)).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, num_merges + 1):
        top = (
            _pair_counts(state)
            .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["pair_count"] < min_pair_count:
            break
        l, r, c = top[0]["left"], top[0]["right"], int(top[0]["pair_count"])
        merges.append((rank, l, r, c))
        # checkpoint per iteration: truncates the fold-on-fold lineage and
        # materializes the vocab-sized state (cheap at any corpus size)
        state = _merge_pair(state, l, r).localCheckpoint()
    out = spark.createDataFrame(
        merges, "merge_rank long, left string, right string, pair_count long"
    )
    out._bpe_state = state  # type: ignore[attr-defined]
    return out


def bpe_vocab(state: DataFrame) -> DataFrame:
    """Trained subword vocabulary from the final symbol state:
    ``(token, total_count)`` — one vocab-sized hash-agg."""
    return (
        state.select("cnt", F.explode("syms").alias("token"))
        .groupBy("token")
        .agg(F.sum("cnt").alias("total_count"))
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    state: DataFrame | None = None,
) -> DataFrame:
    """Encode text with a learned merge list (rank order): per-word symbol
    init, then each merge's fold applied in order over the DISTINCT-word
    table, joined back to documents — encoding cost is vocab-sized, not
    corpus-sized, and unseen words fall back to characters exactly like
    the reference algorithm. Output: ``(doc_id, tokens array<string>)``
    with the document's whitespace word order preserved.

    When encoding the SAME corpus the merges were trained on, pass the
    trainer's final symbol state (``bpe_train(...)._bpe_state``) as
    ``state`` — it is exactly the (word, syms) lookup this function would
    otherwise re-derive with 30 more vocab-wide folds."""
    if state is None:
        words = (
            docs.select(
                F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word")
            )
            .where(F.col("word") != "")
            .distinct()
            .select("word", F.lit(1).alias("cnt"))
        )
        state = _init_symbols(words).localCheckpoint()
        for i, (l, r) in enumerate(merges):
            state = _merge_pair(state, l, r)
            if (i + 1) % 8 == 0:
                state = state.localCheckpoint()
    lookup = state.select("word", F.col("syms").alias("word_tokens"))
    exploded = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("pos", "word"),
    ).where(F.col("word") != "")
    joined = exploded.join(F.broadcast(lookup), "word", "left")
    per_doc = (
        joined.groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "word_tokens"))
                    ),
                    lambda s: s["word_tokens"],
                )
            ).alias("tokens")
        )
    )
    return per_doc
