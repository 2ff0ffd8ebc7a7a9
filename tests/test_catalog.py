"""SQL catalog surface: views over the dataset tables + the spans view,
with pushdown intact through the view boundary."""

from __future__ import annotations


def test_register_tables_and_query(spark):
    from delphi_crawler_spark.catalog import register_spans_view, register_tables

    views = register_tables(spark, "/root/testdata/sf0.001")
    assert "documents" in views and "lineitem" in views
    n = spark.sql("SELECT COUNT(*) AS n FROM documents").collect()[0]["n"]
    assert n > 0
    # a filtered projection through the view still pushes to the scan
    plan = (
        spark.sql("SELECT doc_id FROM documents WHERE lang = 'en'")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "lang" in plan
    assert "ReadSchema" in plan

    sv = register_spans_view(spark)
    rows = spark.sql(
        f"SELECT doc_id, size(spans) AS ns FROM {sv} ORDER BY doc_id LIMIT 3"
    ).collect()
    assert len(rows) == 3 and all(r["ns"] >= 1 for r in rows)
    kinds = spark.sql(
        f"SELECT DISTINCT s.kind FROM {sv} LATERAL VIEW explode(spans) t AS s"
    ).collect()
    assert {r["kind"] for r in kinds} <= {"text", "link", "media"}


def test_register_tables_skips_missing(spark, tmp_path):
    from delphi_crawler_spark.catalog import register_tables

    got = register_tables(spark, str(tmp_path))
    assert got == []
