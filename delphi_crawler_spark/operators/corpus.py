"""Corpus-level training-data preparation operators: cross-document segment
dedup, within-document repetition signals, and token-budget stratified
sampling.

These extend the per-document text family (``functions/textfns.py``) and the
pairwise dedup family (``operators/dedup_fuzzy.py``) with the corpus-shaped
passes a large-scale pretraining pipeline runs between crawl and training:

- **Cross-corpus segment dedup** (the distributed analogue of CCNet/
  RefinedWeb "remove duplicated spans across documents"): split each
  document into fixed ``seg_tokens``-token segments, count each distinct
  segment's document frequency corpus-wide, and either report per-document
  duplication stats or rebuild the text with every repeated segment removed
  except its first occurrence (min ``doc_id`` wins — deterministic).

  Scale shape: segmentation is pure JVM array math (``sequence`` +
  ``slice`` + ``array_join`` — no explode before the segment grain), the
  frequency pass is ONE partial-aggregating hash-agg keyed on the segment
  text, and the flag pass is an equi-join on the same key, so the shuffle
  is linear in corpus token count. We deliberately group on the segment
  STRING, not a 64-bit hash of it: at 10^10+ segments a 64-bit key has
  birthday collisions that would silently merge distinct segments, and the
  segment is itself short (~8 tokens), so the shuffle-width saving of
  hashing is not worth the correctness caveat.

- **Repetition signals** (the duplicate-text quality heuristics of
  Rae et al. 2021 "Scaling Language Models" §A1.1, public knowledge):
  duplicate-word fraction, top-word fraction, and top-bigram fraction per
  document, plus the keep/drop verdict at the published-style thresholds.
  Distinct-count and totals come from per-(doc, term) hash-aggs —
  partial-aggregated, keyed by document, never a window over the corpus.

- **Token-budget stratified sampling**: admit documents per stratum (e.g.
  language) in a deterministic pseudo-random order until each stratum's
  token budget fills — the "mix N billion tokens per language" step of a
  corpus build. Order is ``md5(doc_id)`` (portable across engines), the
  running total is a per-stratum window cumsum, and a document is admitted
  iff the budget was not already full before it (so the budget-crossing
  document is kept — "fill to at least B tokens", matching greedy packing).

Reference parity: the reference engine has no corpus-level text pass (its
documents are Maven artifacts); these operators are the training-data
extension mandated by the brief, built on the same declarative-plan rules
as the rest of the engine (no per-row Python, no unkeyed windows).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def _tokens(text_col: str | Column) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(c, " ")


def segment_docs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_tokens: int = 8,
) -> DataFrame:
    """Explode documents into fixed-width token segments
    ``(id, seg_id, seg_text)``. Segmentation happens inside the row (JVM
    ``sequence``/``slice``/``array_join``) so the explode emits exactly one
    row per segment — no token-grain intermediate ever exists."""
    toks = _tokens(text_col)
    n_segs = F.ceil(F.size(toks) / F.lit(seg_tokens)).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), n_segs - 1),
        lambda i: F.array_join(
            F.slice(toks, i * seg_tokens + 1, seg_tokens), " "
        ),
    )
    return docs.select(
        F.col(id_col), F.posexplode(segs).alias("seg_id", "seg_text")
    )


def dup_segment_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_tokens: int = 8,
) -> DataFrame:
    """Per-document cross-corpus duplication stats and the de-duplicated
    text: ``n_segments``, ``n_dup_segments`` (segments occurring in ≥ 2
    distinct documents), and ``clean_text`` — the document with every
    corpus-repeated segment dropped unless this document is the segment's
    first occurrence (min id). One hash-agg + one equi-join + one
    per-document regroup; every stage partial-aggregates map-side."""
    segs = segment_docs(docs, id_col, text_col, seg_tokens)
    freq = segs.groupBy("seg_text").agg(
        F.count_distinct(id_col).alias("__n_docs"),
        F.min(id_col).alias("__first_doc"),
    )
    flagged = segs.join(freq, "seg_text")
    keep = (F.col("__n_docs") == 1) | (F.col("__first_doc") == F.col(id_col))
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count("*").alias("n_segments"),
            F.sum(F.when(F.col("__n_docs") > 1, 1).otherwise(0)).alias(
                "n_dup_segments"
            ),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                keep,
                                F.struct(
                                    F.col("seg_id"), F.col("seg_text")
                                ),
                            )
                        )
                    ),
                    lambda s: s.getField("seg_text"),
                ),
                " ",
            ).alias("clean_text"),
        )
    )


def repetition_signals(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dup_word_frac: float = 0.7,
    max_top_word_frac: float = 0.3,
    max_top_bigram_frac: float = 0.18,
) -> DataFrame:
    """Within-document repetition quality signals per document:

    - ``dup_word_frac``   = 1 − distinct_tokens / n_tokens
    - ``top_word_frac``   = occurrences of the most frequent token / n_tokens
    - ``top_bigram_frac`` = tokens covered by the most frequent bigram
                            (2 × its count) / n_tokens
    - ``keep``            = all three under their thresholds (defaults in the
                            spirit of Rae et al. 2021 Table A1).

    The token and bigram frequency passes are hash-aggs keyed by
    ``(doc, term)`` then ``doc`` — linear, partial-aggregated, skew-free
    (a document's terms spread over the term dimension)."""
    toks = _tokens(text_col)
    base = docs.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.size(toks).alias("n_tokens"),
        (
            1.0
            - F.size(F.array_distinct(toks)) / F.size(toks)
        ).alias("dup_word_frac"),
    )
    words = base.select(id_col, "n_tokens", F.explode("__toks").alias("__w"))
    top_word = (
        words.groupBy(id_col, "__w")
        .count()
        .groupBy(id_col)
        .agg(F.max("count").alias("__top_word_n"))
    )
    bigrams = base.select(
        id_col,
        "n_tokens",
        F.explode(
            F.zip_with(
                F.slice(F.col("__toks"), 1, F.size("__toks") - 1),
                F.slice(F.col("__toks"), 2, F.size("__toks") - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("__bg"),
    )
    top_bigram = (
        bigrams.groupBy(id_col, "__bg")
        .count()
        .groupBy(id_col)
        .agg(F.max("count").alias("__top_bigram_n"))
    )
    out = (
        base.drop("__toks")
        .join(top_word, id_col)
        .join(top_bigram, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            "dup_word_frac",
            (F.col("__top_word_n") / F.col("n_tokens")).alias("top_word_frac"),
            (
                F.coalesce(F.col("__top_bigram_n"), F.lit(0))
                * 2.0
                / F.col("n_tokens")
            ).alias("top_bigram_frac"),
        )
    )
    return out.withColumn(
        "keep",
        (F.col("dup_word_frac") <= max_dup_word_frac)
        & (F.col("top_word_frac") <= max_top_word_frac)
        & (F.col("top_bigram_frac") <= max_top_bigram_frac),
    )


def stratified_token_sample(
    docs: DataFrame,
    budget_tokens: int,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic token-budget sampling per stratum: order each stratum
    by ``md5(id)`` (an engine-portable pseudo-random shuffle — no ``rand()``
    so reruns and resumes agree), take documents until the stratum's running
    token total reaches ``budget_tokens``; the budget-crossing document is
    admitted (greedy fill-to-at-least-B).

    Scale shape — two-phase per-partition offsets (the ``ordering.py``
    frontier-seq pattern), NOT a per-stratum window: a window cumsum
    serializes each stratum into one sort task, which is the scale killer
    for the common few-strata (per-language) corpus. Instead the rows are
    range-partitioned on the total key (stratum, md5, id) — so every
    stratum spreads over many partitions while staying order-consistent —
    then (1) one narrow counting pass yields per-(partition, stratum) token
    totals, (2) the driver prefix-sums them into offsets (a few KB: strata
    × partitions), and (3) a map-side pass adds the offset to the
    partition-local running sum. The cumsum depends only on the global
    order of the total key, so output is byte-identical at any parallelism
    (parallelism-invariance is pytest-pinned).

    The partitioned intermediate is persisted so both passes see identical
    partitions; ``out._release_stratified()`` unpersists it once the result
    is materialized."""
    spark = docs.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    base = docs.withColumn("n_tokens", F.size(_tokens(text_col))).withColumn(
        "__shuffle_key", F.md5(F.col(id_col).cast("string"))
    )
    sort_cols = [F.col(stratum_col), F.col("__shuffle_key"), F.col(id_col)]
    d = (
        base.repartitionByRange(n, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .persist()
    )

    def _totals(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        sums: dict[str, int] = {}
        for pdf in batches:
            g = pdf.groupby(pdf[stratum_col].astype(str))["n_tokens"].sum()
            for k, v in g.items():
                sums[k] = sums.get(k, 0) + int(v)
        if sums:
            yield pd.DataFrame(
                {"pid": pid, "stratum": list(sums), "tok": list(sums.values())}
            )

    totals = d.mapInPandas(_totals, schema="pid int, stratum string, tok long").collect()
    offsets: dict[tuple[int, str], int] = {}
    acc: dict[str, int] = {}
    for r in sorted(totals, key=lambda r: (r.stratum, r.pid)):
        offsets[(r.pid, r.stratum)] = acc.get(r.stratum, 0)
        acc[r.stratum] = acc.get(r.stratum, 0) + r.tok
    bc = spark.sparkContext.broadcast(offsets)

    out_schema = StructType(
        list(d.schema.fields) + [StructField("cum_tokens", LongType())]
    )

    def _cumsum(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        consumed: dict[str, int] = {}  # tokens already emitted per stratum
        for pdf in batches:
            pdf = pdf.copy()
            key = pdf[stratum_col].astype(str)
            local = (
                pdf.groupby(key, sort=False)["n_tokens"].cumsum().astype("int64")
            )
            od = {
                s: bc.value.get((pid, s), 0) + consumed.get(s, 0)
                for s in key.unique()
            }
            pdf["cum_tokens"] = local + key.map(od).astype("int64")
            for s, v in pdf.groupby(key, sort=False)["n_tokens"].sum().items():
                consumed[s] = consumed.get(s, 0) + int(v)
            yield pdf[pdf["cum_tokens"] - pdf["n_tokens"] < budget_tokens]

    out = d.mapInPandas(_cumsum, schema=out_schema).select(
        *docs.columns, "n_tokens", "cum_tokens"
    )
    out._release_stratified = lambda: d.unpersist()  # type: ignore[attr-defined]
    return out


def importance_weights(
    docs: DataFrame,
    target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document importance weight for target-distribution resampling —
    the DSIR shape (Xie et al. 2023 "Data Selection for Language Models via
    Importance Resampling", public): score each raw document by the
    log-likelihood ratio of its tokens under a *target* corpus's unigram
    distribution vs the raw corpus's, then select high-weight documents.
    ``target`` is a boolean Column marking the target subset (e.g. curated
    or high-quality docs).

    Weight = (1/n_tokens) · Σ_tokens [ log p_target(w) − log p_raw(w) ]
    with add-one smoothing over the raw vocabulary:
    p(w) = (count(w)+1) / (total_tokens + |V|).

    DSIR hashes n-grams into a fixed-width bucket vector because a single
    machine cannot hold an open vocabulary; here the vocabulary lives in a
    distributed hash-agg, so the weights are computed over exact unigrams —
    same estimator, no hash collisions (the hashing trick remains available
    by keying on ``hash(term) % B`` instead of ``term``).

    Scale shape: one token explode feeds BOTH frequency tables (target
    counts = filtered partial hash-agg on term; raw counts = the same grain)
    — the term join is vocabulary-sized (hash join, deliberately NOT
    broadcast); totals |V|, T, R are three scalar aggregates; the per-doc
    regroup is a partial-aggregating hash-agg keyed by doc. Never wider than
    corpus token count.

    Returns (id_col, n_tokens, avg_logratio) — avg_logratio rounded to 6
    (engine-wide reproducibility convention)."""
    tok = docs.select(
        F.col(id_col),
        target.alias("__is_target"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")
    raw = tok.groupBy("term").agg(
        F.count(F.lit(1)).alias("rc"),
        F.sum(F.when(F.col("__is_target"), 1).otherwise(0)).alias("tc"),
    )
    totals = raw.agg(
        F.sum("rc").alias("R"), F.sum("tc").alias("T"), F.count(F.lit(1)).alias("V")
    ).collect()[0]
    r_tot, t_tot, vocab = float(totals["R"]), float(totals["T"]), float(totals["V"])
    lr = F.log((F.col("tc") + 1.0) / F.lit(t_tot + vocab)) - F.log(
        (F.col("rc") + 1.0) / F.lit(r_tot + vocab)
    )
    scored = tok.join(raw.withColumn("__lr", lr).select("term", "__lr"), "term")
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        # + 0.0 normalizes IEEE negative zero (round can emit -0.0, and
        # -0.0 vs 0.0 breaks string-keyed row sorting in external
        # comparators even though the values are equal)
        (F.round(F.sum("__lr") / F.count(F.lit(1)), 6) + F.lit(0.0)).alias(
            "avg_logratio"
        ),
    )


def tfidf_topk_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF
    (Sparck Jones 1972 weighting, sklearn-style smoothing:
    ``idf = ln((N+1)/(df+1)) + 1``) — the standard keyword/topic signal a
    corpus pipeline derives for routing, sampling strata, and search.

    Returns (id_col, term, tf, df, tfidf, rank), rank 1..k per doc,
    deterministic tiebreak (tfidf desc, term asc).

    Scale shape: tokenization is an in-row JVM explode; tf is one
    partial-aggregating hash-agg on (doc, term); df reuses the SAME
    (doc, term) grain (distinct-by-construction, so df is a plain count
    keyed by term — no count-distinct shuffle); the df table joins back on
    term (vocabulary-sized, hash join — NOT broadcast: at web scale the
    vocabulary is billions of terms); the top-k window is keyed by doc.
    N (corpus size) is the one scalar aggregate."""
    tok = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")
    tf = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.count()
    scored = tf.join(df_tbl, "term").withColumn(
        "tfidf",
        F.col("tf")
        * (F.log((F.lit(float(n_docs + 1))) / (F.col("df") + F.lit(1.0))) + F.lit(1.0)),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "tfidf", "rank")
    )


def token_budget_select(
    docs: DataFrame,
    budget_tokens: int,
    quality_col: str = "quality",
    id_col: str = "doc_id",
    weight_col: str = "n_tokens",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global quality-ordered data selection under a token budget: walk the
    corpus best-quality-first ((quality desc, id asc) — a total order) and
    admit documents while the token mass BEFORE each one is under
    ``budget_tokens`` (the budget-crossing document is admitted —
    fill-to-at-least-B, the same convention as ``stratified_token_sample``).
    The "take the best X-billion-token subset" step of a corpus build
    (quality-classifier selection practice, e.g. GPT-3 §2.2 / FineWeb).

    Scale shape: ``ordering.attach_global_cumsum`` — range-partition on the
    total order key, partition-local sorts, one per-partition weight-total
    pass, map-side prefix add; NO single-task global window. Selection is
    then a plain filter, so Catalyst prunes everything below the cut.
    Returns the admitted rows + ``cum_before``; ``out._release_budget()``
    unpersists the partitioned intermediate once the result is materialized.
    """
    from delphi_crawler_spark.operators.ordering import attach_global_cumsum

    if budget_tokens < 0:
        raise ValueError("budget_tokens must be >= 0")
    keyed = docs.withColumn("_negq", -F.col(quality_col).cast("double"))
    with_cum, release = attach_global_cumsum(
        keyed,
        ["_negq", id_col],
        weight_col,
        cum_col="cum_before",
        num_partitions=num_partitions,
    )
    out = with_cum.filter(F.col("cum_before") < F.lit(int(budget_tokens))).drop(
        "_negq"
    )
    out._release_budget = release  # type: ignore[attr-defined]
    return out


def dsir_select(
    docs: DataFrame,
    target: Column,
    group_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 30,
) -> DataFrame:
    """The DSIR selection step (Xie et al. 2023): sample ``k`` documents
    per group with probability proportional to ``exp(avg_logratio)`` — the
    per-document importance ratio ``importance_weights`` computes — via
    Efraimidis-Spirakis order sampling IN THE LOG DOMAIN. The E-S race key
    ``-ln(u)/w`` with ``w = exp(r)`` orders identically to
    ``ln(-ln(u)) - r`` (log is monotone on positive keys), so the ratio
    never needs exponentiating: no overflow for extreme log-ratios and no
    cross-engine ``exp`` parity risk — the only transcendentals are the
    same ``ln``-on-md5-uniform the weighted sampler already pins against
    DuckDB, plus the already-rounded ``avg_logratio``.

    Docs with zero tokens have no defined ratio and are excluded (the
    inner join to the weight table — mirroring the weight>0 exclusion of
    ``group_weighted_sample``). Deterministic: u is the md5 of
    (group, id), ranks tie-break on id.

    Scale shape: ``importance_weights``'s token hash-aggs + vocab join,
    then ONE id-keyed equi-join back to (group, id) and one k-bounded
    per-group window — no new corpus-sized shuffle beyond the join.
    """
    if k < 1:
        raise ValueError("dsir_select() needs k >= 1")
    iw = importance_weights(docs, target, id_col, text_col)
    base = docs.select(F.col(group_col), F.col(id_col)).join(iw, id_col)
    hkey = F.md5(
        F.concat_ws(":", F.col(group_col).cast("string"), F.col(id_col).cast("string"))
    )
    v = F.conv(F.substring(hkey, 1, 12), 16, 10).cast("double")
    u = (v + 1.0) / 281474976710657.0  # 2^48 + 1: u in (0,1], exact in a double
    key = F.log(-F.log(u)) - F.col("avg_logratio")
    w = Window.partitionBy(group_col).orderBy(key.asc(), F.col(id_col).asc())
    return (
        base.withColumn("sel_rank", F.row_number().over(w))
        .where(F.col("sel_rank") <= k)
        .select(group_col, id_col, "n_tokens", "avg_logratio", "sel_rank")
    )


def vocab_coverage(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    term_col: str = "term",
) -> DataFrame:
    """Per-doc vocabulary coverage vs a reference vocab — the
    tokenizer-fit signal of a training-data pipeline (high OOV rate ⇒
    the doc is mis-languaged, mis-encoded, or out-of-domain for the
    tokenizer; type/token ratio adds a lexical-diversity prior).

    Output per doc (docs with ≥1 token): ``n_tokens`` (occurrences),
    ``n_oov`` (occurrences not in vocab), ``oov_rate``, ``n_types``
    (distinct tokens), ``n_oov_types``, ``type_token_ratio``.

    Scale shape: one explode → one join against the vocab dim (hinted
    broadcast — tokenizer vocabs are ≤ a few hundred k terms; drop the
    hint for corpus-derived mega-vocabs and AQE falls back to shuffle)
    → one per-doc hash-agg with map-side partials. Tokenization is the
    house rule: ``split(lower(trim(text)), '\\s+')`` — pure JVM.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    dim = vocab.select(F.col(term_col).alias("token")).distinct().withColumn(
        "_in_vocab", F.lit(1)
    )
    flagged = toks.join(F.broadcast(dim), "token", "left")
    oov = F.col("_in_vocab").isNull()
    agg = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(oov, 1).otherwise(0)).alias("n_oov"),
        F.count_distinct("token").alias("n_types"),
        F.count_distinct(F.when(oov, F.col("token"))).alias("n_oov_types"),
    )
    return agg.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("n_oov").cast("bigint").alias("n_oov"),
        F.round(F.col("n_oov") / F.col("n_tokens"), 6).alias("oov_rate"),
        F.col("n_types").cast("bigint").alias("n_types"),
        F.col("n_oov_types").cast("bigint").alias("n_oov_types"),
        F.round(F.col("n_types") / F.col("n_tokens"), 6).alias("type_token_ratio"),
    )


def curriculum_order(
    docs: DataFrame,
    tier_col: str = "tier",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic curriculum ordering for training: documents stream
    tier by tier (0 = cleanest first — the standard quality-curriculum
    schedule), with a seeded md5 shuffle INSIDE each tier so no
    within-tier ordering bias (source, crawl time, doc id) leaks into
    gradient order. The total order is (tier, md5(tier|id), id) — a pure
    function of the data, so a resumed or re-sharded training run reads
    the identical sequence.

    ``train_seq`` is assigned with ``attach_global_seq`` (range partition
    + per-partition offsets) — no partitionless window, parallelism-
    invariant. Release hook ``_release_curriculum`` unpersists the
    range-partitioned intermediate."""
    from delphi_crawler_spark.operators.ordering import attach_global_seq

    keyed = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(tier_col).cast("int").alias("tier"),
    ).withColumn(
        "shuffle_key",
        F.md5(
            F.concat(
                F.col("tier").cast("string"),
                F.lit("|"),
                F.col("doc_id").cast("string"),
            )
        ),
    )
    ranked, release = attach_global_seq(
        keyed, order=["tier", "shuffle_key", "doc_id"], seq_col="train_seq"
    )
    out = ranked.select("doc_id", "tier", "shuffle_key", "train_seq")
    out._release_curriculum = release  # type: ignore[attr-defined]
    return out


def heaps_curve(
    docs: DataFrame,
    n_buckets: int = 10,
    text_col: str = "text",
    order_col: str = "doc_id",
    gram: int = 1,
) -> DataFrame:
    """Heap's-law vocabulary growth curve — "what does more data buy":
    processing documents in ``order_col`` order, the cumulative count of
    DISTINCT ``gram``-word shingles after each bucket of the corpus,
    next to cumulative token volume. A flattening curve is the
    data-curation signal that additional same-source data adds volume
    but no new content (and the per-bucket marginal new-gram rate is the
    quantitative version).

    Distributed shape with NO ordered scan: a gram's first occurrence is
    ``min(order)`` over its postings (one hash-agg on the gram grain —
    the same grain the inverted index pays), bucketed by the order
    column's range; cumulative sums then run over the n_buckets-row
    result. Gram text never shuffles twice: the first-occurrence agg is
    the only gram-keyed exchange.
    """
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    ng = F.greatest(F.size(words) - F.lit(gram - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(0), ng - 1),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, gram)),
    )
    ordmax = docs.agg(F.max(F.col(order_col)).alias("m")).collect()[0]["m"]
    bucket = F.least(
        F.floor(F.col(order_col) * n_buckets / F.lit(int(ordmax) + 1)),
        F.lit(n_buckets - 1),
    ).cast("bigint")
    ex = docs.select(
        bucket.alias("bucket"),
        F.col(order_col).alias("ord"),
        F.explode(grams).alias("g"),
    ).filter(F.col("g") != "")
    first = ex.groupBy("g").agg(F.min("bucket").alias("first_bucket"))
    new_per_bucket = first.groupBy("first_bucket").agg(
        F.count(F.lit(1)).alias("n_new_grams")
    )
    toks_per_bucket = ex.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_tokens"))
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    joined = (
        toks_per_bucket.join(
            new_per_bucket.withColumnRenamed("first_bucket", "bucket"),
            "bucket",
            "left",
        )
        .select(
            "bucket",
            "n_tokens",
            F.coalesce(F.col("n_new_grams"), F.lit(0)).alias("n_new_grams"),
        )
    )
    return joined.select(
        "bucket",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("n_new_grams").cast("bigint").alias("n_new_grams"),
        F.sum("n_tokens").over(w).cast("bigint").alias("cum_tokens"),
        F.sum("n_new_grams").over(w).cast("bigint").alias("cum_distinct_grams"),
    )


def zipf_fit(
    docs: DataFrame,
    text_col: str = "text",
    by: str | None = None,
    top_n: int = 100,
) -> DataFrame:
    """Zipf rank-frequency fit (Zipf 1949): exact OLS slope/intercept of
    ln(frequency) on ln(rank) over each group's ``top_n`` terms — the
    standard corpus-health fingerprint (natural language sits near slope
    -1; template farms and generated spam bend the curve, so the slope is
    a cheap per-source / per-language quality gate).

    Returns one row per group: (by?, n_terms, zipf_slope, zipf_intercept).
    Groups with < 2 distinct terms return NULL slope/intercept (a fit
    needs 2 points).

    **Engine-exact determinism**: the regression inputs are the logs
    rounded to 6 dp and accumulated as ``decimal(28,6)`` / ``decimal(38,12)``
    — Spark and any ANSI engine sum decimals exactly and
    order-independently, so the slope is a pure function of the term
    table, not of partitioning (the house decimal-sum rule, same as
    ``kmeans_lloyd``'s centroid update). The final slope/intercept math
    runs in double from those exact sums — bit-identical cross-engine.

    Scale shape: one (group, term) hash-agg (map-side partial), a top-n
    window keyed by group, then a group-keyed hash-agg of 4 decimal sums.
    The vocabulary never broadcasts; nothing collects.
    """
    gcols = [by] if by else []
    tok = docs.select(
        *gcols,
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")
    counts = tok.groupBy(*gcols, "term").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy(*gcols).orderBy(F.desc("cnt"), F.asc("term"))
    ranked = counts.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= top_n
    )
    x = F.round(F.ln(F.col("rank").cast("double")), 6).cast("decimal(18,6)")
    y = F.round(F.ln(F.col("cnt").cast("double")), 6).cast("decimal(18,6)")
    pts = ranked.select(*gcols, x.alias("x"), y.alias("y"))
    agg = pts.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n = F.col("n_terms").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    den = n * F.col("sxx").cast("double") - sx * sx
    slope = (n * F.col("sxy").cast("double") - sx * sy) / den
    return agg.select(
        *gcols,
        "n_terms",
        F.when(F.col("n_terms") >= 2, F.round(slope, 6)).alias("zipf_slope"),
        F.when(
            F.col("n_terms") >= 2, F.round(sy / n - slope * sx / n, 6)
        ).alias("zipf_intercept"),
    )


def soft_dedup_weights(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Soft deduplication: instead of DROPPING near-duplicates, keep every
    member and down-weight it by its cluster size (w = 1/|cluster|), so a
    passage duplicated k times contributes one document's worth of
    training mass in expectation — the soft alternative (public idea in
    SlimPajama/D4-style data-mix work) when hard dedup would lose
    rephrasings a model should still see once.

    ``clusters`` is any (id, cluster_id, cluster_size) assignment —
    ``graph.neardup_clusters`` output slots in directly, exact-digest
    clusters equally. Returns (id, cluster_id, cluster_size, n_tokens,
    weight, eff_tokens): ``weight = round(1/size, 6)``, ``eff_tokens =
    round(n_tokens/size, 6)`` (both from the unrounded ratio — the
    mirrored-oracle convention). One id-keyed equi-join + in-row JVM
    arithmetic; the token count is the house whitespace rule."""
    toks = docs.select(
        F.col(id_col),
        F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0))
        .otherwise(F.size(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")))
        .cast("bigint")
        .alias("n_tokens"),
    )
    w = F.lit(1.0) / F.col("cluster_size").cast("double")
    return (
        clusters.select(id_col, "cluster_id", "cluster_size")
        .join(toks, id_col)
        .select(
            id_col,
            F.col("cluster_id").cast("bigint").alias("cluster_id"),
            F.col("cluster_size").cast("bigint").alias("cluster_size"),
            "n_tokens",
            F.round(w, 6).alias("weight"),
            F.round(F.col("n_tokens").cast("double") * w, 6).alias("eff_tokens"),
        )
    )


def tokenizer_fertility(
    docs: DataFrame,
    by: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer fertility per group — subword tokens per whitespace word
    and bytes per subword token, the pair of scalars multilingual data-mix
    work balances on (a language whose tokenizer fertility is 2× pays 2×
    the sequence length for the same text; mixture weights and packing
    budgets must see that, Scao 2022 / BLOOM tokenizer analyses).

    Uses the house BPE-ish pretokenizer proxy (``\\w+|[^\\w\\s]+`` runs,
    ``textfns.bpe_ish_token_count_col``) over the whitespace word count.
    All counts are exact integer sums; the two ratios divide once in
    double, rounded 6. One group hash-agg — map-side partial, no second
    shuffle. Returns (by, n_docs, n_words, n_subwords, n_chars,
    fertility, chars_per_subword); groups with zero words report NULL
    ratios."""
    from delphi_crawler_spark.functions.textfns import (
        bpe_ish_token_count_col,
        token_count_col,
    )

    per = docs.select(
        F.col(by),
        token_count_col(F.col(text_col)).alias("w"),
        bpe_ish_token_count_col(F.col(text_col)).alias("t"),
        F.length(F.col(text_col)).alias("c"),
    )
    agg = per.groupBy(by).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("w").cast("bigint").alias("n_words"),
        F.sum("t").cast("bigint").alias("n_subwords"),
        F.sum("c").cast("bigint").alias("n_chars"),
    )
    return agg.select(
        by,
        "n_docs",
        "n_words",
        "n_subwords",
        "n_chars",
        F.when(
            F.col("n_words") > 0,
            F.round(
                F.col("n_subwords").cast("double") / F.col("n_words").cast("double"), 6
            ),
        ).alias("fertility"),
        F.when(
            F.col("n_subwords") > 0,
            F.round(
                F.col("n_chars").cast("double") / F.col("n_subwords").cast("double"), 6
            ),
        ).alias("chars_per_subword"),
    )
