"""Scrub operators: HTML strip, PII redaction, decontamination — edge-case
units the SQL oracle fixture can't reach, plus plan audits (all-JVM
projection, broadcast decontamination join)."""

from __future__ import annotations

from pyspark.sql import functions as F

from delphi_crawler_spark.operators.scrub import (
    decontaminate,
    html_strip_col,
    pii_scrub,
)


def _strip_one(spark, html: str) -> str:
    return (
        spark.createDataFrame([(html,)], "h: string")
        .select(html_strip_col("h").alias("t"))
        .collect()[0]["t"]
    )


def test_html_strip_drops_script_and_style_subtrees(spark):
    out = _strip_one(
        spark,
        '<p>keep</p><script>var s = "<b>not text</b>";</script>'
        "<style>p {color: red}</style><p>also</p>",
    )
    assert out == "keep also"


def test_html_strip_entities_and_case_insensitive_tags(spark):
    out = _strip_one(
        spark, "<SCRIPT>x</SCRIPT><DIV>a &amp; b &#65; &unknownent; c</DIV>"
    )
    assert out == "a b c"


def test_html_strip_multiline_script(spark):
    out = _strip_one(spark, "<script>\nline1\nline2\n</script>after")
    assert out == "after"


def test_html_strip_plain_text_passthrough(spark):
    assert _strip_one(spark, "  no  markup\there ") == "no markup here"


def test_pii_scrub_order_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b-c_1@ex-a.co.uk and ip 192.168.0.1 and +44 20 7946 0958 end"),
            (2, "no pii at all"),
            (3, "digits 12345678901 only"),
        ],
        "id: long, text: string",
    )
    rows = {r["id"]: r for r in pii_scrub(df).collect()}
    assert (
        rows[1]["text_scrubbed"]
        == "mail <EMAIL> and ip <IP> and <PHONE> end"
    )
    assert (rows[1]["n_emails"], rows[1]["n_ips"], rows[1]["n_phones"]) == (1, 1, 1)
    assert rows[2]["text_scrubbed"] == "no pii at all"
    # a bare long digit run is phone-like by design (redaction errs safe)
    assert rows[3]["n_phones"] == 1 and "<PHONE>" in rows[3]["text_scrubbed"]
    # the email's local digits must NOT be double-redacted as a phone
    assert rows[1]["n_phones"] == 1


def test_decontaminate_counts_and_threshold(spark):
    corpus = spark.createDataFrame(
        [
            (1, "a b c d e f"),  # shares both 5-grams with the benchmark
            (2, "a b c d e zz"),  # shares one
            (3, "totally different words here now ok"),
        ],
        "doc_id: long, text: string",
    )
    bench = spark.createDataFrame([(9, "a b c d e f g")], "doc_id: long, text: string")
    rows = {
        r["doc_id"]: (r["n_shingles"], r["n_hits"], r["contaminated"])
        for r in decontaminate(corpus, bench, shingle_n=5, min_hits=2).collect()
    }
    assert rows[1] == (2, 2, 1)
    assert rows[2] == (2, 1, 0)
    assert rows[3] == (2, 0, 0)


def test_decontaminate_short_doc_whole_text_shingle(spark):
    corpus = spark.createDataFrame([(1, "tiny doc")], "doc_id: long, text: string")
    bench = spark.createDataFrame([(2, "tiny doc")], "doc_id: long, text: string")
    (row,) = decontaminate(corpus, bench, shingle_n=13, min_hits=1).collect()
    assert (row["n_shingles"], row["n_hits"], row["contaminated"]) == (1, 1, 1)


def test_scrub_plans(spark):
    """html_strip/pii_scrub must stay whole-stage-codegen JVM projections
    (no Python eval); decontaminate must broadcast the benchmark side and
    never fall into a cartesian."""
    docs = spark.createDataFrame(
        [(i, f"w{i} x y z q r s t u v") for i in range(50)], "doc_id: long, text: string"
    )
    plan = (
        pii_scrub(docs.select("doc_id", html_strip_col("text").alias("text")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan  # neither Batch- nor ArrowEvalPython
    assert "*(1) Project" in plan  # '*' = whole-stage-codegen'd stage

    dplan = (
        decontaminate(docs, docs.where(F.col("doc_id") % 7 == 0), shingle_n=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in dplan
    assert "CartesianProduct" not in dplan


def test_boilerplate_strip_line_heuristics(spark):
    """Line survival: content lines pass; nav bars (symbol-heavy), short
    footers, datelines (digit-heavy / few words), and empty lines fail;
    counts are exact and content preserves line order."""
    from delphi_crawler_spark.operators.scrub import boilerplate_strip

    good1 = "this is a perfectly normal sentence with many plain words"
    good2 = "another long readable line of ordinary prose for the corpus"
    page = "\n".join(
        [
            good1,
            "Home | About | Contact | Login",
            "(c) 2024 example.com",
            "Published 2024-01-05",
            "",
            good2,
        ]
    )
    df = spark.createDataFrame([(1, page)], "doc_id long, text string")
    r = boilerplate_strip(df).collect()[0]
    assert r["content"] == good1 + "\n" + good2
    assert r["n_lines_kept"] == 2 and r["n_lines_total"] == 6
