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
    # full frontier content equality with an uninterrupted run (merge-on-read
    # view: append-only frontier ∪ fetched log)
    clean = _run_engine(spark, tmp_path / "store_clean")
    cols = ["url", "priority", "seq", "state", "round"]
    killed_rows = sorted(map(tuple, eng2.frontier_view().select(cols).collect()))
    clean_rows = sorted(map(tuple, clean.frontier_view().select(cols).collect()))
    assert killed_rows == clean_rows
    # the scale-path check: the O(1)-result digest agrees without collecting
    from delphi_crawler_spark.functions.digest import frames_equal

    assert frames_equal(
        eng2.frontier_view().select(cols), clean.frontier_view().select(cols)
    )


def test_rounds_are_idempotent(spark, tmp_path):
    root = tmp_path / "store_idem"
    eng = _run_engine(spark, root, n_rounds=2)
    before = eng.schedule_rows()
    # re-running completed rounds is a no-op (checkpoint guard)
    assert eng.run_round(0)["skipped"] is True
    assert eng.run_round(1)["skipped"] is True
    assert eng.schedule_rows() == before


def test_round_write_volume_independent_of_round(spark, tmp_path):
    """Scale invariant (round-1 scale-killer #1): round k writes O(round k)
    — earlier rounds' part files are NEVER rewritten, the frontier part for
    round k holds exactly that round's new links, and the fetched log part
    holds exactly that round's emissions."""
    import os

    root = tmp_path / "store_vol"
    eng = CrawlEngine(
        spark, str(root),
        politeness=politeness_df(spark), robots=robots_df(spark),
        config=CrawlConfig(round_ms=ROUND_MS, n_docs=N_DOCS),
    )
    eng.bootstrap(seed_urls_df(spark, n=N_SEEDS))
    docs = docs_df(spark, n=N_DOCS)

    def part_files(table):
        out = {}
        tdir = os.path.join(str(root), table)
        for p in eng.store.parts(table):
            d = os.path.join(tdir, p["path"])
            for f in os.listdir(d):
                if f.endswith(".parquet"):
                    fp = os.path.join(d, f)
                    out[fp] = os.path.getmtime(fp)
        return out

    stats0 = eng.run_round(0, docs=docs)
    frontier_files_r0 = part_files("frontier")
    fetched_files_r0 = part_files("fetched")
    stats1 = eng.run_round(1, docs=docs)

    # no rewrite: every round-0 data file still exists with the same mtime
    frontier_after = part_files("frontier")
    fetched_after = part_files("fetched")
    for fp, mt in frontier_files_r0.items():
        assert frontier_after.get(fp) == mt, f"rewritten: {fp}"
    for fp, mt in fetched_files_r0.items():
        assert fetched_after.get(fp) == mt, f"rewritten: {fp}"

    # the appended parts hold exactly the round's rows (O(round) volume)
    for rnd, stats in ((0, stats0), (1, stats1)):
        assert eng.store.read_parts("frontier", rnd).count() == stats["new_links"]
        assert eng.store.read_parts("fetched", rnd).count() == stats["emitted"]


def test_write_volume_flat_over_many_rounds(spark, tmp_path):
    """The O(round) claim at a larger k, with compaction in the loop and
    FRESH docs per round (so discovery keeps appending): per-round frontier
    parts hold exactly that round's links at every k, no data file is ever
    rewritten between maintenance runs, and the part + manifest counts stay
    bounded by compact_every instead of growing one-per-round."""
    import os

    n_rounds, compact_every = 12, 3
    root = tmp_path / "store_soak"
    eng = CrawlEngine(
        spark, str(root),
        politeness=politeness_df(spark), robots=robots_df(spark),
        config=CrawlConfig(round_ms=ROUND_MS, n_docs=N_DOCS),
    )
    eng.bootstrap(seed_urls_df(spark, n=N_SEEDS))

    def store_bytes() -> int:
        total = 0
        for dirpath, _d, files in os.walk(root):
            total += sum(os.path.getsize(os.path.join(dirpath, f)) for f in files)
        return total

    stats = []
    bytes_per_row = []
    prev_bytes = store_bytes()
    for rnd in range(n_rounds):
        docs = docs_df(spark, n=N_DOCS, seed=500 + rnd)
        stats.append(eng.run_round(rnd, docs=docs))
        # every round's parts hold exactly that round's rows — O(round)
        assert eng.store.read_parts("frontier", rnd).count() == stats[-1]["new_links"]
        assert eng.store.read_parts("fetched", rnd).count() == stats[-1]["emitted"]
        # write-BYTE independence of round number: bytes appended this round
        # per row written must not trend up as the table grows (measured
        # between maintenance runs; compaction rewrites are off-path)
        now = store_bytes()
        rows = stats[-1]["new_links"] + stats[-1]["emitted"]
        bytes_per_row.append((now - prev_bytes) / max(rows, 1))
        if (rnd + 1) % compact_every == 0:
            eng.maintain()
        prev_bytes = store_bytes()
        n_parts = len(eng.store.parts("frontier"))
        n_manifests = len(
            [f for f in os.listdir(eng.store._tdir("frontier")) if f.startswith("mani-")]
        )
        # bounded: at most compact_every uncompacted round parts on top of
        # the compacted base; manifests bounded by the retention window
        assert n_parts <= compact_every + 2, f"round {rnd}: {n_parts} parts"
        assert n_manifests <= compact_every + 4, f"round {rnd}: {n_manifests} manifests"
    # rounds kept doing real work the whole way (fresh docs -> new links)
    assert all(s["new_links"] > 0 for s in stats)
    assert all(s["emitted"] > 0 for s in stats)
    # last-third vs first-third per-row write cost: flat (2x headroom for
    # parquet footer/metadata granularity on tiny test rounds), while the
    # table itself grew ~n_rounds x — the O(round) byte claim at larger k
    third = n_rounds // 3
    early = sum(bytes_per_row[:third]) / third
    late = sum(bytes_per_row[-third:]) / third
    assert late < 2.0 * early, (early, late, bytes_per_row)


def test_bloom_is_maintained_incrementally(spark, tmp_path):
    """Scale invariant (round-1 scale-killer #3): the bloom's item count
    tracks the frontier exactly via OR-merged per-round segments — no
    full-table rebuild below capacity — and the anti-join result still
    equals the bloomless exact path (fail-open property)."""
    root = tmp_path / "store_bloom"
    eng = CrawlEngine(
        spark, str(root),
        politeness=politeness_df(spark), robots=robots_df(spark),
        config=CrawlConfig(round_ms=ROUND_MS, n_docs=N_DOCS),
    )
    eng.bootstrap(seed_urls_df(spark, n=N_SEEDS))
    docs = docs_df(spark, n=N_DOCS)
    blobs = []
    for rnd in range(N_ROUNDS):
        stats = eng.run_round(rnd, docs=docs)
        meta = stats["bloom"]
        assert meta["items"] == eng.store.read("frontier").count()
        assert meta["round"] == rnd  # logical coverage advances every round
        blobs.append(meta["blob"])
    # same geometry across rounds (pure OR-merge, no rebuild under capacity)
    metas = [eng.store.last_checkpoint()["bloom"]]
    assert metas[0]["m"] > 0
    # O(round) write volume: under the default flush cadence the bootstrap
    # blob CARRIES across these rounds — per-round disk cost is the tiny
    # checkpoint meta, never an O(m_bits) bitset rewrite
    assert len(set(blobs)) == 1
    assert metas[0]["blob_round"] == -1

    # bloomless engine produces the identical schedule + seen set
    eng2 = CrawlEngine(
        spark, str(tmp_path / "store_nobloom"),
        politeness=politeness_df(spark), robots=robots_df(spark),
        config=CrawlConfig(round_ms=ROUND_MS, n_docs=N_DOCS, use_bloom=False),
    )
    eng2.bootstrap(seed_urls_df(spark, n=N_SEEDS))
    for rnd in range(N_ROUNDS):
        eng2.run_round(rnd, docs=docs)
    assert eng2.schedule_rows() == eng.schedule_rows()
    assert eng2.seen_set() == eng.seen_set()


def test_bloom_blob_amortized_and_resume_exact(spark, tmp_path):
    """The merged bloom bitset is O(m_bits) — tens of GB at 10^10-URL
    geometry — so persisting it per round would make per-round write volume
    scale with the FRONTIER (the sf1 soak measured ~57 MB/round of blob at
    a 20M-seed frontier). Blob writes must amortize to the flush cadence;
    between flushes the checkpoint advances only meta, and a fresh process
    rebuilds the tail from the round-tagged frontier parts. The rebuilt
    bloom must be BYTE-IDENTICAL to the continuously-carried one, and
    maintenance must flush the tail before compaction can merge the parts
    the rebuild would prune to."""
    import os

    def mkcfg():
        return CrawlConfig(round_ms=ROUND_MS, n_docs=N_DOCS, bloom_blob_every=2)

    n_rounds = 5

    def blob_files(root):
        d = os.path.join(str(root), "blobs")
        return sorted(f for f in os.listdir(d)) if os.path.isdir(d) else []

    # continuous run: blob written at bootstrap then only at cadence hits
    root_a = tmp_path / "store_amort_a"
    eng_a = CrawlEngine(
        spark, str(root_a),
        politeness=politeness_df(spark), robots=robots_df(spark), config=mkcfg(),
    )
    eng_a.bootstrap(seed_urls_df(spark, n=N_SEEDS))
    # fresh (deterministic) docs per round so every round appends new links
    # and the coverage round advances — the soak's shape
    def round_docs(rnd):
        return docs_df(spark, n=N_DOCS, seed=700 + rnd)

    for rnd in range(n_rounds):
        eng_a.run_round(rnd, docs=round_docs(rnd))
    # flushes: bootstrap (blob_round -1), round 1, round 3 — rounds 0/2/4 carry
    assert len(blob_files(root_a)) == 3, blob_files(root_a)
    meta_a = eng_a.store.last_checkpoint()["bloom"]
    assert meta_a["blob_round"] == 3 and meta_a["round"] == 4

    # kill-and-resume run: round 3 onward in a FRESH engine (cold cache =
    # new process) whose first act is the blob + tail-part rebuild
    root_b = tmp_path / "store_amort_b"
    eng_b1 = CrawlEngine(
        spark, str(root_b),
        politeness=politeness_df(spark), robots=robots_df(spark), config=mkcfg(),
    )
    eng_b1.bootstrap(seed_urls_df(spark, n=N_SEEDS))
    for rnd in range(3):
        eng_b1.run_round(rnd, docs=round_docs(rnd))
    eng_b2 = CrawlEngine(
        spark, str(root_b),
        politeness=politeness_df(spark), robots=robots_df(spark), config=mkcfg(),
    )
    for rnd in range(3, n_rounds):
        eng_b2.run_round(rnd, docs=round_docs(rnd))
    assert eng_b2.schedule_rows() == eng_a.schedule_rows()

    # byte-identical logical blooms, loaded through the cold-cache path on
    # BOTH stores (blob + tail rebuild, no in-memory carry)
    meta_b = eng_b2.store.last_checkpoint()["bloom"]
    cold_a = CrawlEngine(
        spark, str(root_a),
        politeness=politeness_df(spark), robots=robots_df(spark), config=mkcfg(),
    )
    cold_b = CrawlEngine(
        spark, str(root_b),
        politeness=politeness_df(spark), robots=robots_df(spark), config=mkcfg(),
    )
    bloom_a = cold_a._load_bloom(meta_a)
    bloom_b = cold_b._load_bloom(meta_b)
    assert (bloom_a.m_bits, bloom_a.k) == (bloom_b.m_bits, bloom_b.k)
    assert bloom_a.words.tobytes() == bloom_b.words.tobytes()
    # and equal to the carried in-memory bloom of the continuous run
    carried = eng_a._load_bloom(meta_a)
    assert carried.words.tobytes() == bloom_a.words.tobytes()

    # maintenance flushes the tail (blob covers every checkpointed round)
    # BEFORE compaction, and the flushed bitset is unchanged
    eng_a.maintain()
    meta_m = eng_a.store.last_checkpoint()["bloom"]
    assert meta_m["blob_round"] == meta_m["round"] == 4
    cold_m = CrawlEngine(
        spark, str(root_a),
        politeness=politeness_df(spark), robots=robots_df(spark), config=mkcfg(),
    )
    assert cold_m._load_bloom(meta_m).words.tobytes() == bloom_a.words.tobytes()
    # resume AFTER maintenance (tail parts possibly compacted away) works
    # from the flushed blob alone
    eng_a2 = CrawlEngine(
        spark, str(root_a),
        politeness=politeness_df(spark), robots=robots_df(spark), config=mkcfg(),
    )
    stats = eng_a2.run_round(n_rounds, docs=round_docs(n_rounds))
    assert stats["new_links"] >= 0
