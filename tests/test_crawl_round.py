"""End-to-end crawl-round gates (SURVEY.md §5): exact emitted ordering +
URL-seen-set equality vs the independent pure-Python oracle, resume
equivalence after a mid-round kill, and parallelism invariance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delphi_crawler_spark.datagen import (
    docs_df,
    gen_docs,
    gen_politeness,
    gen_robots_rules,
    gen_seed_urls,
    politeness_df,
    robots_df,
    seed_urls_df,
)
from delphi_crawler_spark.plans.crawl_round import CrawlConfig, CrawlEngine
from delphi_crawler_spark.plans.oracle import run_oracle

N_SEEDS = 2500
N_DOCS = 400
N_ROUNDS = 3
ROUND_MS = 3000


def _oracle_inputs():
    seeds = gen_seed_urls(n=N_SEEDS)
    seed_rows = [
        {
            "url": r.url,
            "priority": int(r.priority),
            "discovery_ts": r.discovery_ts,
            "seq": int(r.seq),
        }
        for r in seeds.itertuples()
    ]
    pol = {
        r.host: (float(r.rate_per_sec), int(r.max_burst))
        for r in gen_politeness().itertuples()
    }
    robots_rows = gen_robots_rules().to_dict("records")
    docs = gen_docs(n=N_DOCS)
    docs_links = {
        row.doc_id: [s["text"] for s in row.spans if s["kind"] == "link"]
        for row in docs.itertuples()
    }
    return seed_rows, pol, robots_rows, docs_links


@pytest.fixture(scope="module")
def oracle_result():
    seed_rows, pol, robots_rows, docs_links = _oracle_inputs()
    return run_oracle(
        seed_rows, pol, robots_rows, docs_links,
        n_rounds=N_ROUNDS, round_ms=ROUND_MS, n_docs=N_DOCS,
    )


def _run_engine(spark, root, n_rounds=N_ROUNDS) -> CrawlEngine:
    eng = CrawlEngine(
        spark,
        str(root),
        politeness=politeness_df(spark),
        robots=robots_df(spark),
        config=CrawlConfig(round_ms=ROUND_MS, n_docs=N_DOCS),
    )
    eng.bootstrap(seed_urls_df(spark, n=N_SEEDS))
    docs = docs_df(spark, n=N_DOCS)
    for rnd in range(n_rounds):
        eng.run_round(rnd, docs=docs)
    return eng


def test_ordering_and_seen_match_oracle(spark, tmp_path, oracle_result):
    eng = _run_engine(spark, tmp_path / "store")
    got = eng.schedule_rows()
    assert got == oracle_result.schedule, (
        f"first diff at {next(i for i, (a, b) in enumerate(zip(got, oracle_result.schedule)) if a != b) if got != oracle_result.schedule and len(got) == len(oracle_result.schedule) else 'len'}: "
        f"engine {len(got)} rows vs oracle {len(oracle_result.schedule)}"
    )
    assert eng.seen_set() == oracle_result.seen


def test_parallelism_invariance(spark, tmp_path, oracle_result):
    """Same bytes at different shuffle parallelism (the in-process proxy for
    the N vs 4N cluster-size criterion; bench.py does real local[8] vs
    local[32] in separate processes)."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        eng = _run_engine(spark, tmp_path / "store_p3")
        assert eng.schedule_rows() == oracle_result.schedule
        assert eng.seen_set() == oracle_result.seen
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_resume_equivalence_mid_round_kill(spark, tmp_path, oracle_result):
    """Kill after the schedule append + frontier mutation of round 1 but
    before its checkpoint; a fresh engine must resume and produce tables
    byte-equal to the uninterrupted run (SURVEY.md §5d)."""
    root = tmp_path / "store_kill"
    eng = CrawlEngine(
        spark, str(root),
        politeness=politeness_df(spark), robots=robots_df(spark),
        config=CrawlConfig(round_ms=ROUND_MS, n_docs=N_DOCS),
    )
    eng.bootstrap(seed_urls_df(spark, n=N_SEEDS))
    docs = docs_df(spark, n=N_DOCS)
    eng.run_round(0, docs=docs)

    # simulate the kill: round 1 dies right before its checkpoint write,
    # with every table mutation already committed
    real_checkpoint = eng.store.checkpoint
    def boom(round_no, payload):
        raise RuntimeError("killed before checkpoint")
    eng.store.checkpoint = boom
    with pytest.raises(RuntimeError):
        eng.run_round(1, docs=docs)
    eng.store.checkpoint = real_checkpoint

    # fresh engine on the same store resumes
    eng2 = CrawlEngine(
        spark, str(root),
        politeness=politeness_df(spark), robots=robots_df(spark),
        config=CrawlConfig(round_ms=ROUND_MS, n_docs=N_DOCS),
    )
    for rnd in range(1, N_ROUNDS):
        eng2.run_round(rnd, docs=docs)

    assert eng2.schedule_rows() == oracle_result.schedule
    assert eng2.seen_set() == oracle_result.seen
    # full frontier content equality with an uninterrupted run
    clean = _run_engine(spark, tmp_path / "store_clean")
    cols = ["url", "priority", "seq", "state", "round"]
    killed_rows = sorted(map(tuple, eng2.store.read("frontier").select(cols).collect()))
    clean_rows = sorted(map(tuple, clean.store.read("frontier").select(cols).collect()))
    assert killed_rows == clean_rows


def test_rounds_are_idempotent(spark, tmp_path):
    root = tmp_path / "store_idem"
    eng = _run_engine(spark, root, n_rounds=2)
    before = eng.schedule_rows()
    # re-running completed rounds is a no-op (checkpoint guard)
    assert eng.run_round(0)["skipped"] is True
    assert eng.run_round(1)["skipped"] is True
    assert eng.schedule_rows() == before
