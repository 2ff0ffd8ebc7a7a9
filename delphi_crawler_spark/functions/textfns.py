"""Text-analysis functions for large-scale training-data pipelines:
language ID, quality scoring, token counting, document fingerprinting.

All hot paths are JVM-side ``pyspark.sql.functions`` expressions (codegen'd,
no Python); the language-ID heuristic is the one Arrow-vectorized pandas
UDF (per-batch numpy, no per-row Python).

These extend the reference's per-document analyzer surface (the Hermes
feature queries, HermesAnalyzer.scala:42-51 — pluggable doc -> features
functions) to the text-pipeline operations a 100 TB corpus needs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# ----------------------------------------------------------------- tokens


def token_count_col(text: Column) -> Column:
    """Whitespace token count — JVM split, no Python. Empty/blank -> 0."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def bpe_ish_token_count_col(text: Column) -> Column:
    """BPE-ish subword proxy: count of word/number/punct units — the
    regex-segmentation used by byte-pair tokenizers' pretokenizers.
    JVM regexp (``\\w+`` runs and punctuation runs), useful as a fast
    token-budget estimator; RE2-compatible so SQL oracles can replicate."""
    return F.size(F.regexp_extract_all(text, F.lit(r"\w+|[^\w\s]+"), 0))


# ---------------------------------------------------------------- quality


def quality_features(df, text_col: str = "text"):
    """Length / punctuation / stopword-ratio quality signals (pure JVM).

    Adds: n_chars_m (measured), n_tokens, punct_ratio, stopword_ratio,
    mean_token_len, quality_score in [0,1].
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count_col(t)
    punct = n_chars - F.length(F.regexp_replace(t, r"[.!?,;:]", ""))
    stop_hits = F.size(
        F.filter(
            F.split(F.lower(F.trim(t)), r"\s+"),
            lambda w: w.isin("the", "a", "of", "and", "to", "in", "is"),
        )
    )
    out = (
        df.withColumn("n_chars_m", n_chars)
        .withColumn("n_tokens", n_tokens)
        .withColumn(
            "punct_ratio",
            F.round(punct / F.greatest(n_chars, F.lit(1)), 6),
        )
        .withColumn(
            "stopword_ratio",
            F.round(stop_hits / F.greatest(n_tokens, F.lit(1)), 6),
        )
        .withColumn(
            "mean_token_len",
            F.round(n_chars / F.greatest(n_tokens, F.lit(1)), 6),
        )
    )
    # simple interpretable score: long enough, some stopwords, sane tokens.
    # NOT rounded: rounding a value composed from already-rounded ratios
    # lands on exact .5e-6 lattice points where engines' round() implementations
    # disagree; the raw double is bit-deterministic (fixed IEEE op order).
    score = (
        F.least(F.col("n_tokens") / F.lit(50.0), F.lit(1.0)) * 0.4
        + F.least(F.col("stopword_ratio") * F.lit(5.0), F.lit(1.0)) * 0.3
        + F.when(
            (F.col("mean_token_len") >= 3) & (F.col("mean_token_len") <= 10),
            F.lit(1.0),
        ).otherwise(F.lit(0.0))
        * 0.3
    )
    return out.withColumn("quality_score", score)


# ---------------------------------------------------------------- lang id

# tiny per-language stopword profiles (n-gram heuristic; deterministic)
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "is", "in", "that", "it"},
    "es": {"el", "la", "de", "que", "y", "los", "en", "un"},
    "fr": {"le", "la", "de", "et", "les", "des", "un", "une"},
    "de": {"der", "die", "und", "das", "ist", "ein", "nicht", "mit"},
    "zh": set(),  # CJK handled by script detection below
}


@F.pandas_udf(StringType())
def lang_id(texts: pd.Series) -> pd.Series:
    """Heuristic language ID: CJK script share, else stopword-profile vote.
    Arrow-batched and fully vectorized: ONE explode of the batch's tokens,
    one ``isin`` per language profile, segment sums via ``np.add.at`` —
    no per-row Python loop. Returns 'und' when no profile scores."""
    import numpy as np

    s = texts.fillna("")
    # CJK: any char in the unified ideograph block
    cjk = s.str.contains(r"[一-鿿]", regex=True).to_numpy()
    exploded = s.str.lower().str.split().explode()
    exploded = exploded[exploded.notna()]
    langs = [(lang, m) for lang, m in _LANG_MARKERS.items() if m]
    hits = np.zeros((len(s), len(langs)), dtype=np.int64)
    if len(exploded):
        row_pos = pd.Series(np.arange(len(s)), index=s.index)
        rows = row_pos[exploded.index].to_numpy(dtype=np.int64)
        toks = exploded.reset_index(drop=True)
        for li, (_, markers) in enumerate(langs):
            m = toks.isin(list(markers)).to_numpy()
            np.add.at(hits[:, li], rows[m], 1)
    # first language with the strictly-highest hit count wins; zero -> 'und'
    best = hits.argmax(axis=1)
    names = np.array([lang for lang, _ in langs])
    out = np.where(hits.max(axis=1) > 0, names[best], "und")
    out[cjk] = "zh"
    return pd.Series(out)


# ------------------------------------------------------------- fingerprint


def bow_fingerprint_col(text: Column) -> Column:
    """Order-insensitive content fingerprint: md5 over the sorted distinct
    token bag. Pure JVM (split + array ops + md5) — SQL-oracle-able."""
    words = F.array_sort(F.array_distinct(F.split(F.lower(F.trim(text)), r"\s+")))
    return F.md5(F.array_join(words, " "))


def rolling_fingerprint_col(text: Column, window: int = 4, keep: int = 8) -> Column:
    """Winnowing-style fingerprint: xxhash64 each ``window``-gram of tokens,
    keep the ``keep`` smallest hashes, md5 the joined result.  Shift-robust
    (unlike the bag fingerprint) yet still one JVM expression: sliding
    n-grams via transform over index array, no explode, no Python."""
    words = F.split(F.lower(F.trim(text)), r"\s+")
    n = F.greatest(F.size(words) - F.lit(window - 1), F.lit(1))
    idx = F.sequence(F.lit(0), n - 1)
    grams = F.transform(
        idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(words, i + 1, window)))
    )
    kept = F.slice(F.array_sort(grams), 1, keep)
    return F.md5(F.array_join(F.transform(kept, lambda h: h.cast("string")), ","))


# ------------------------------------------------- unicode normalization


@F.pandas_udf(StringType())
def nfc_normalize_pd(texts: pd.Series) -> pd.Series:
    """Unicode NFC normalization, Arrow-batched (``Series.str.normalize`` —
    pandas' C-loop, no per-row Python): composes decomposed sequences
    (``e`` + U+0301 -> ``é``) so byte-level dedup/digesting sees one
    representation per grapheme. NFC (not NFKC) deliberately: canonical
    composition is lossless, compatibility folding is not — a corpus
    pipeline must not silently rewrite ``²`` to ``2``."""
    return texts.str.normalize("NFC")


#: C0/C1 control characters except \t \n \r — standard corpus scrub set
_CONTROL_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"


def clean_text_col(text: Column) -> Column:
    """Normalization pipeline for raw fetched text: NFC-compose (Arrow
    pandas UDF — Spark SQL has no ICU normalizer), then strip C0 control
    characters (JVM regexp; \\t/\\n/\\r kept — they are document
    structure), then collapse \\r\\n to \\n. Order pinned: composing
    first means the control scrub sees final codepoints."""
    composed = nfc_normalize_pd(text)
    no_ctl = F.regexp_replace(composed, _CONTROL_RE, "")
    return F.regexp_replace(no_ctl, r"\r\n?", "\n")


# ---------------------------------------------------------- gopher rules

_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    df,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_stop_hits: int = 2,
):
    """Gopher-style composite document-quality rules (Rae et al. 2021,
    Appendix A): word-count bounds, mean-word-length bounds, symbol-to-word
    ratio, bullet/ellipsis line fractions, alphabetic-word fraction, and a
    minimum distinct-stop-word count, combined into one ``passed`` flag.

    Distinct from ``quality_features`` (a continuous score): this is the
    published RULE SET, each metric exposed so downstream filters can relax
    individual thresholds. Every expression is JVM (whole-stage codegen) —
    higher-order array functions over the token/line splits, zero Python
    and zero shuffles; at 100 TB this is a narrow map over the scan.

    Adds: n_words, mean_word_len, symbol_ratio, bullet_line_frac,
    ellipsis_line_frac, alpha_word_frac, n_stop_hits, passed (0/1).
    Default thresholds are the published Gopher values: 50 <= n_words <=
    100000, 3 <= mean_word_len <= 10, symbol_ratio <= 0.1, bullet <= 0.9,
    ellipsis <= 0.3, alpha >= 0.8, stops >= 2; the word-count bounds and
    stop-word floor are parameters because real pipelines tune them per
    corpus/language (a stop list is language-bound by nature). The pass
    flag is computed from the UNROUNDED metrics; the exposed columns are
    rounded to 6.
    """
    t = F.col(text_col)
    ws = F.split(F.lower(F.trim(t)), r"\s+")
    lines = F.split(t, "\n")
    n_words = F.size(ws)
    dw = F.greatest(n_words, F.lit(1))
    total_chars = F.aggregate(ws, F.lit(0).cast("long"), lambda a, w: a + F.length(w))
    mwl = total_chars / dw
    hashes = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    ellipses = F.floor((F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / 3)
    symbol_ratio = (hashes + ellipses) / dw
    dl = F.greatest(F.size(lines), F.lit(1))
    bullet_frac = F.size(
        F.filter(
            lines,
            lambda l: F.startswith(F.ltrim(l), F.lit("-"))
            | F.startswith(F.ltrim(l), F.lit("*"))
            | F.startswith(F.ltrim(l), F.lit("•")),
        )
    ) / dl
    ellipsis_frac = F.size(
        F.filter(lines, lambda l: F.endswith(F.rtrim(l), F.lit("...")))
    ) / dl
    alpha_frac = F.size(F.filter(ws, lambda w: w.rlike("[a-z]"))) / dw
    n_stop = F.size(F.array_intersect(ws, F.array(*[F.lit(s) for s in _GOPHER_STOPS])))
    passed = (
        (n_words >= min_words) & (n_words <= max_words)
        & (mwl >= 3) & (mwl <= 10)
        & (symbol_ratio <= 0.1)
        & (bullet_frac <= 0.9)
        & (ellipsis_frac <= 0.3)
        & (alpha_frac >= 0.8)
        & (n_stop >= min_stop_hits)
    )
    return (
        df.withColumn("n_words", n_words.cast("long"))
        .withColumn("mean_word_len", F.round(mwl, 6))
        .withColumn("symbol_ratio", F.round(symbol_ratio, 6))
        .withColumn("bullet_line_frac", F.round(bullet_frac, 6))
        .withColumn("ellipsis_line_frac", F.round(ellipsis_frac, 6))
        .withColumn("alpha_word_frac", F.round(alpha_frac, 6))
        .withColumn("n_stop_hits", n_stop.cast("long"))
        .withColumn("passed", passed.cast("long"))
    )


def winnow_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram: int = 4,
    win: int = 4,
) -> DataFrame:
    """True winnowing (Schleimer, Wilkerson & Aiken, SIGMOD'03): hash
    every ``gram``-word shingle, then in every window of ``win``
    consecutive shingle hashes select the minimum (leftmost on ties) —
    the positional fingerprint set with the paper's guarantee: any two
    documents sharing a run of at least ``win + gram − 1`` words share
    at least one selected fingerprint. Unlike the global bottom-k
    (``rolling_fingerprint_col``) the density is uniform ACROSS the
    document, so local plagiarism/quotation is caught anywhere, not just
    where the globally-smallest hashes happen to fall.

    Engine-portable trick: the shingle hash is the first 16 hex chars of
    md5, and (hash, pos) is encoded as ``hash@pos6`` so a plain
    ``array_min`` IS the window argmin with the leftmost tie-break —
    identical lexicographic semantics in any engine.

    Output: exploded ``(doc_id, pos, fp)`` — one row per selected
    fingerprint (distinct per doc). All in-cell JVM expressions until
    the final explode; cost O(words × win) per doc.
    """
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    ng = F.greatest(F.size(words) - F.lit(gram - 1), F.lit(1))
    enc = F.transform(
        F.sequence(F.lit(0), ng - 1),
        lambda i: F.concat(
            F.substring(F.md5(F.concat_ws(" ", F.slice(words, i + 1, gram))), 1, 16),
            F.lit("@"),
            F.lpad(i.cast("string"), 6, "0"),
        ),
    )
    nw = F.greatest(F.size(enc) - F.lit(win - 1), F.lit(1))
    sels = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), nw - 1),
            lambda j: F.array_min(F.slice(enc, j + 1, win)),
        )
    )
    ex = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(sels).alias("sel")
    )
    return ex.select(
        "doc_id",
        F.split(F.col("sel"), "@")[1].cast("bigint").alias("pos"),
        F.split(F.col("sel"), "@")[0].alias("fp"),
    )


def char_entropy_col(text: Column) -> Column:
    """Shannon entropy (bits/char) of the document's character
    distribution — the gibberish/binary-blob detector every public
    corpus filter chain carries (randomly generated or encrypted
    payloads sit near log2(alphabet), templated junk near 0; natural
    language ~3.5–4.5 bits/char): entropy = log2(n) − (Σ c·log2(c))/n
    over per-character counts c.

    Pure JVM, zero shuffle, zero explode: per-distinct-char counts via
    in-cell filter/size over the char array (O(len × alphabet) per row
    inside codegen — alphabet is small for text; an Arrow histogram is
    the drop-in fast path if a corpus carries huge alphabets). Composes
    into the quality projection like the Gopher rules. Empty/null text
    → 0.0."""
    chars = F.filter(F.split(text, ""), lambda c: c != "")
    n = F.size(chars)
    counts = F.transform(
        F.array_distinct(chars),
        lambda d: F.size(F.filter(chars, lambda c: c == d)).cast("double"),
    )
    # canonical (sorted) fold order: engine-exact regardless of each
    # engine's distinct-ordering
    sum_clog = F.aggregate(
        F.array_sort(counts), F.lit(0.0), lambda a, v: a + v * F.log2(v)
    )
    ent = F.log2(n.cast("double")) - sum_clog / n.cast("double")
    return F.when(n > 0, F.round(ent, 6)).otherwise(F.lit(0.0))


def readability_cols(text: Column) -> dict[str, Column]:
    """Flesch reading-ease / Flesch–Kincaid grade (Kincaid 1975, public
    formulae) with a fully deterministic, engine-portable syllable
    heuristic: a word's syllables = max(1, count of maximal [aeiouy]+
    runs) over its letters-only lowercase form. Sentences = maximal
    [.!?]+ runs (min 1 so fragments still score). The heuristic is the
    standard regex approximation every corpus-quality stack uses when a
    dictionary is out of reach — and, unlike dictionary lookups, it is
    exactly replicable in an ANSI-SQL oracle.

    Returns {n_words, n_sentences, n_syllables, flesch, fk_grade}; the
    two scores are NULL when the text has no letter-bearing words. Pure
    JVM (split + regexp_count inside higher-order folds, whole-stage
    codegen) — zero shuffle, zero Python.
    """
    toks = F.filter(
        F.transform(
            F.split(F.lower(text), r"\s+"),
            lambda w: F.regexp_replace(w, "[^a-z]", ""),
        ),
        lambda w: w != "",
    )
    n_words = F.size(toks).cast("bigint")
    n_sent = F.greatest(
        F.regexp_count(text, F.lit(r"[.!?]+")), F.lit(1)
    ).cast("bigint")
    n_syll = F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda a, w: a
        + F.greatest(F.regexp_count(w, F.lit("[aeiouy]+")), F.lit(1)).cast("bigint"),
    )
    wps = n_words.cast("double") / n_sent.cast("double")
    spw = n_syll.cast("double") / n_words.cast("double")
    has = n_words > 0
    flesch = F.when(
        has, F.round(F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw, 6)
    )
    fk = F.when(
        has, F.round(F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59), 6)
    )
    return {
        "n_words": n_words,
        "n_sentences": n_sent,
        "n_syllables": F.when(has, n_syll).otherwise(F.lit(0)).cast("bigint"),
        "flesch": flesch,
        "fk_grade": fk,
    }


def code_detect_cols(text: Column) -> dict[str, Column]:
    """Code-vs-prose detector — the cheap structural heuristic training
    pipelines use to route documents to a code-specific pipeline (The
    Stack / StarCoder-style corpora separate code before quality
    filtering, Kocetkov 2022): three orthogonal signals, each a pure
    JVM regexp scan, combined into a 0..3 vote.

    - ``sym_ratio``: structural-symbol chars ``{}[]();=<>`` / non-space
      chars (prose sits near 0, code 0.05+);
    - ``kw_hits``: count of word-bounded programming keywords
      (def/class/return/import/function/var/const/void/int/include);
    - ``indent_ratio``: lines starting with 2+ spaces or a tab / lines
      (block indentation survives HTML stripping when prose wrapping
      does not).

    Returns {sym_ratio, kw_hits, indent_ratio, code_votes, is_code}:
    a vote per signal over its threshold (0.05 / 3 hits / 0.3), and
    ``is_code`` at >= 2 votes. Ratios rounded to 6 (house convention).
    """
    nonspace = F.length(F.regexp_replace(text, r"\s", ""))
    syms = F.length(F.regexp_replace(text, r"[^{}\[\]();=<>]", ""))
    sym_ratio = F.when(
        nonspace > 0, F.round(syms.cast("double") / nonspace.cast("double"), 6)
    ).otherwise(F.lit(0.0))
    kw_hits = F.regexp_count(
        text,
        F.lit(r"\b(def|class|return|import|function|var|const|void|int|include)\b"),
    ).cast("bigint")
    lines = F.filter(F.split(text, r"\n"), lambda l: F.length(F.trim(l)) > 0)
    n_lines = F.size(lines)
    n_indented = F.size(
        F.filter(lines, lambda l: l.rlike(r"^(\t|  )"))
    )
    indent_ratio = F.when(
        n_lines > 0,
        F.round(n_indented.cast("double") / n_lines.cast("double"), 6),
    ).otherwise(F.lit(0.0))
    votes = (
        (sym_ratio >= 0.05).cast("int")
        + (kw_hits >= 3).cast("int")
        + (indent_ratio >= 0.3).cast("int")
    ).cast("bigint")
    return {
        "sym_ratio": sym_ratio,
        "kw_hits": kw_hits,
        "indent_ratio": indent_ratio,
        "code_votes": votes,
        "is_code": votes >= 2,
    }


def script_profile_cols(text: Column) -> dict[str, Column]:
    """Unicode script mix — the orthographic complement to the n-gram
    language-ID (a doc can be 'en' by trigrams yet 40% CJK glyphs — a
    boilerplate-stripping bug or a mixed-script spam signal): per-doc
    shares of Latin / Cyrillic / CJK / Arabic / Greek letters over all
    letter-ish characters, plus the dominant script label.

    Counts are ``length(regexp_replace(...))`` complements per script
    range — pure JVM regexp over literal class ranges (RE2-compatible,
    mirrored in SQL oracles), zero shuffle. Shares rounded 6; dominant
    label ties break by the fixed evaluation order (latin first).
    Empty / letterless text profiles as 'none' with zero shares."""
    ranges = {
        "latin": r"A-Za-zÀ-ɏ",
        "cyrillic": r"Ѐ-ӿ",
        "cjk": r"぀-ヿ㐀-䶿一-鿿가-힯",
        "arabic": r"؀-ۿ",
        "greek": r"Ͱ-Ͽ",
    }
    counts = {
        name: F.length(F.regexp_replace(text, f"[^{rng}]", ""))
        for name, rng in ranges.items()
    }
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    out: dict[str, Column] = {}
    shares = {}
    for name, c in counts.items():
        shares[name] = F.when(
            total > 0, F.round(c.cast("double") / total.cast("double"), 6)
        ).otherwise(F.lit(0.0))
        out[f"{name}_share"] = shares[name]
    dom = F.lit("none")
    best = F.lit(0.0)
    for name in ranges:  # fixed order: first max wins
        cond = shares[name] > best
        dom = F.when(cond, F.lit(name)).otherwise(dom)
        best = F.when(cond, shares[name]).otherwise(best)
    out["n_script_chars"] = total.cast("bigint")
    out["dominant_script"] = dom
    return out


def lexical_diversity_cols(
    text: Column, window: int = 50
) -> dict[str, Column]:
    """Lexical diversity: type-token ratio and its moving-average form
    (MATTR, Covington & McFall 2010) — raw TTR collapses as documents
    grow (types saturate), so corpus quality gates use the windowed mean
    which is length-stable; template spam and keyword stuffing sit far
    below natural prose on both.

    ``ttr`` = distinct tokens / tokens; ``mattr`` = mean over every
    length-``window`` token window of its own TTR (documents shorter
    than the window fall back to plain TTR — the reference behavior).
    All in-cell array ops (transform over window starts + array_distinct
    — O(tokens × window) per row inside codegen, no shuffle, no
    Python); ratios rounded 6. Empty text → 0 tokens and NULL ratios."""
    toks = F.filter(
        F.split(F.lower(F.trim(text)), r"\s+"), lambda t: t != ""
    )
    n = F.size(toks)
    ttr = F.when(
        n > 0,
        F.round(
            F.size(F.array_distinct(toks)).cast("double") / n.cast("double"), 6
        ),
    )
    nw = n - F.lit(window - 1)
    win_ttrs = F.transform(
        F.sequence(F.lit(1), nw),
        lambda i: F.size(F.array_distinct(F.slice(toks, i, window))).cast(
            "double"
        )
        / F.lit(float(window)),
    )
    mattr = F.when(n >= window, F.round(
        F.aggregate(win_ttrs, F.lit(0.0), lambda a, v: a + v)
        / nw.cast("double"), 6)
    ).otherwise(ttr)
    return {"n_tokens": n.cast("bigint"), "ttr": ttr, "mattr": mattr}


def compression_ratio_udf(level: int = 6):
    """Deflate compressibility — the redundancy signal quality stacks use
    beside entropy (templated/repetitive spam compresses far below
    natural prose; random blobs sit near 1.0): per doc,
    ``len(zlib.compress(utf8)) / len(utf8)``.

    zlib with a pinned level is fully deterministic for a given input
    across platforms (the DEFLATE stream for one compressor version +
    level is a pure function of the bytes), so the expected-parquet
    oracle recomputes it with the same stdlib. Arrow-batched pandas UDF
    (one C call per row — no JVM equivalent exists); ratios rounded 6,
    empty text → NULL."""
    import zlib

    @F.pandas_udf("double")
    def ratio(texts: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return None
            b = str(t).encode("utf-8")
            if not b:
                return None
            return round(len(zlib.compress(b, level)) / len(b), 6)

        return texts.map(one)

    return ratio


def url_density_cols(text: Column) -> dict[str, Column]:
    """Link-density spam signal: embedded URL mentions per 100 words —
    link farms and SEO listicles carry an order of magnitude more
    in-text URLs than prose (the Gopher-family companion the symbol
    ratio misses when the URLs are plain http strings rather than
    markup). Counts ``http(s)://`` mentions and bare ``www.`` hosts via
    one anchored JVM regexp each; density = mentions / words × 100,
    rounded 6, NULL when wordless."""
    words = F.filter(
        F.split(F.lower(F.trim(text)), r"\s+"), lambda t: t != ""
    )
    n = F.size(words)
    n_urls = (
        F.regexp_count(text, F.lit(r"https?://[^\s]+"))
        + F.regexp_count(text, F.lit(r"(^|\s)www\.[^\s]+"))
    ).cast("bigint")
    dens = F.when(
        n > 0,
        F.round(n_urls.cast("double") / n.cast("double") * F.lit(100.0), 6),
    )
    return {
        "n_words": n.cast("bigint"),
        "n_url_mentions": n_urls,
        "url_density": dens,
        "linkfarm_flag": F.coalesce(dens >= 20.0, F.lit(False)),
    }
