"""Bigram-LM perplexity scoring (operators/lm.py): hand-computed smoothed
probabilities, train/score separation, degenerate inputs, plan shape."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from delphi_crawler_spark.operators.lm import bigram_perplexity


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bigram_perplexity_hand_values(spark):
    # train slice = doc 0 only: "a b a b" -> bigrams (a,b)x2, (b,a)x1
    # vocab V = {a, b} = 2; contexts c1(a)=2, c1(b)=1
    docs = _docs(spark, [(0, "a b a b"), (1, "a b"), (2, "b c")])
    out = bigram_perplexity(docs, train_pred=F.col("doc_id") == 0)
    got = {r["doc_id"]: r for r in out.collect()}

    # doc 1: one bigram (a,b): -ln((2+1)/(2+2)) = -ln(3/4)
    exp1 = -math.log(3 / 4)
    assert got[1]["n_bigrams"] == 1
    assert abs(got[1]["avg_nll"] - round(exp1, 6)) < 1e-9
    assert abs(got[1]["ppl"] - round(math.exp(exp1), 3)) < 1e-9

    # doc 2: one bigram (b,c) unseen: -ln((0+1)/(1+2)) = ln(3)
    exp2 = math.log(3)
    assert abs(got[2]["avg_nll"] - round(exp2, 6)) < 1e-9

    # doc 0 scores itself: bigrams (a,b),(b,a),(a,b)
    exp0 = -(2 * math.log(3 / 4) + math.log(2 / 3)) / 3
    assert got[0]["n_bigrams"] == 3
    assert abs(got[0]["avg_nll"] - round(exp0, 6)) < 1e-9


def test_bigram_perplexity_short_and_empty_docs(spark):
    # single-token and empty-text docs have no bigrams -> no output row
    docs = _docs(spark, [(0, "a b c a b"), (1, "solo"), (2, "")])
    out = bigram_perplexity(docs, train_pred=F.col("doc_id") == 0)
    ids = {r["doc_id"] for r in out.collect()}
    assert ids == {0}


def test_bigram_perplexity_empty_train_slice(spark):
    docs = _docs(spark, [(0, "a b c"), (1, "d e")])
    out = bigram_perplexity(docs, train_pred=F.lit(False))
    assert out.count() == 0
    assert out.columns == ["doc_id", "n_bigrams", "avg_nll", "ppl"]


def test_bigram_emission_is_shuffle_free(spark):
    # the tokenize -> zip_with -> explode stage must plan without Exchange
    from delphi_crawler_spark.operators.lm import _bigrams, _token_arrays

    docs = _docs(spark, [(0, "a b c")])
    plan = _bigrams(_token_arrays(docs, "doc_id", "text"), "doc_id")
    txt = plan._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in txt


# ---------------------------------------------------------- gopher rules


def test_gopher_rules_hand_values(spark):
    from delphi_crawler_spark.functions.textfns import gopher_rules

    good = " ".join(
        ["the quick brown fox jumps over the lazy dog and that have with be to of"] * 5
    )  # 16 words x 5 = 80 words, all alpha, plenty of stops
    bullets = "- one\n- two\n* three\n• four\nplain line"
    dots = "end... " * 4 + "we the of and go"  # ellipsis symbols
    short = "too few words here"
    df = spark.createDataFrame(
        [(0, good), (1, bullets), (2, dots), (3, short), (4, ".....")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in gopher_rules(df).collect()}

    assert got[0]["passed"] == 1
    assert got[0]["n_words"] == 80
    assert got[0]["n_stop_hits"] == 8

    # 4 of 5 lines are bullets
    assert abs(got[1]["bullet_line_frac"] - 0.8) < 1e-9
    assert got[1]["passed"] == 0  # word-count floor

    # 4 '...' in 9 words -> symbol ratio > 0.1
    assert got[2]["symbol_ratio"] > 0.1
    assert got[2]["passed"] == 0

    assert got[3]["passed"] == 0  # < 50 words

    # '.....' = one non-overlapping '...' occurrence, one word, no alpha
    assert got[4]["symbol_ratio"] == 1.0
    assert got[4]["alpha_word_frac"] == 0.0


def test_gopher_rules_is_narrow_jvm(spark):
    from delphi_crawler_spark.functions.textfns import gopher_rules

    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    txt = gopher_rules(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in txt
    assert "BatchEvalPython" not in txt and "ArrowEvalPython" not in txt


def test_kneser_ney_hand_values(spark):
    """Tiny corpus where every KN quantity is countable by hand: train
    'a b a b a c' gives c2={ab:2, ba:2, ac:1}, D = n1/(n1+2 n2) = 0.2,
    T=3 types, V=3; the scored doc 'a b c' mixes a seen bigram, a
    backed-off bigram, and continuation mass."""
    import math

    from delphi_crawler_spark.operators.lm import kneser_ney_perplexity

    docs = spark.createDataFrame(
        [(0, "a b a b a c"), (1, "a b c")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r
        for r in kneser_ney_perplexity(
            docs, train_pred=F.col("doc_id") == 0
        ).collect()
    }
    d, t_types, v = 0.2, 3, 3
    pcont = lambda tc: (tc + 1.0) / (t_types + v + 1)  # noqa: E731
    # ab: c2=2 c1=3 t1=2 tc(b)=1 ; bc: c2=0 c1(b)=2 t1=1 tc(c)=1
    p_ab = (2 - d) / 3 + d * 2 / 3 * pcont(1)
    p_bc = max(0 - d, 0.0) / 2 + d * 1 / 2 * pcont(1)
    exp_nll = (-math.log(p_ab) - math.log(p_bc)) / 2
    got = out[1]
    assert got["n_bigrams"] == 2
    assert abs(got["avg_nll"] - round(exp_nll, 6)) < 1e-9
    assert abs(got["ppl"] - round(math.exp(exp_nll), 3)) < 1e-9
    # the training doc scores itself fluently: lower NLL than the probe
    assert out[0]["avg_nll"] < out[1]["avg_nll"]
    # pinned discount overrides the estimate
    out75 = {
        r["doc_id"]: r
        for r in kneser_ney_perplexity(
            docs, train_pred=F.col("doc_id") == 0, discount=0.75
        ).collect()
    }
    assert out75[1]["avg_nll"] != got["avg_nll"]


def test_kneser_ney_empty_train_slice(spark):
    from delphi_crawler_spark.operators.lm import kneser_ney_perplexity

    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    out = kneser_ney_perplexity(docs, train_pred=F.lit(False))
    assert out.count() == 0
    assert set(out.columns) == {"doc_id", "n_bigrams", "avg_nll", "ppl"}
