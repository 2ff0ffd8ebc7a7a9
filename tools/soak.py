"""Multi-round soak: the O(round) claim measured, not asserted.

Runs the CrawlEngine round loop for N rounds with ``compact_every`` on and
records, per round: wall time, rows appended, store disk bytes, and
part/manifest counts per table. The scale invariants this evidences:

- round wall time has ~zero slope in the round number (no O(table) work
  inside a round);
- appended rows/bytes per round are flat (no rewrite amplification);
- part and manifest counts stay BOUNDED under compaction + expiry instead
  of growing one-per-round.

Usage: python tools/soak.py [n_rounds] [seeds] [docs] [compact_every]
Prints one JSON line per round, then a summary JSON line, then a markdown
table ready for BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def store_stats(eng) -> dict:
    import os as _os

    root = eng.store.root
    total = 0
    n_files = 0
    for dirpath, _dirnames, filenames in _os.walk(root):
        for f in filenames:
            total += _os.path.getsize(_os.path.join(dirpath, f))
            n_files += 1
    out = {"disk_bytes": total, "n_files": n_files}
    for tbl in ("frontier", "fetched", "schedule", "metrics"):
        if eng.store.exists(tbl):
            out[f"parts_{tbl}"] = len(eng.store.parts(tbl))
            tdir = eng.store._tdir(tbl)
            out[f"manifests_{tbl}"] = len(
                [f for f in _os.listdir(tdir) if f.startswith("mani-")]
            )
    return out


def main() -> None:
    import shutil
    import tempfile

    from delphi_crawler_spark.datagen import (
        docs_df,
        politeness_df,
        robots_df,
        seed_urls_df,
    )
    from delphi_crawler_spark.plans.crawl_round import CrawlConfig, CrawlEngine
    from delphi_crawler_spark.session import get_spark

    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    n_seeds = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    n_docs = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000
    compact_every = int(sys.argv[4]) if len(sys.argv) > 4 else 10
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    spark = get_spark("soak", cores=cores)
    root = tempfile.mkdtemp(prefix="soak-", dir="/dev/shm")
    try:
        eng = CrawlEngine(
            spark,
            root,
            politeness=politeness_df(spark),
            robots=robots_df(spark),
            config=CrawlConfig(
                round_ms=10_000,
                n_docs=n_docs,
                compact_every=0,  # driven manually so maintain() is timed apart
            ),
        )
        eng.bootstrap(seed_urls_df(spark, n=n_seeds))

        rows = []
        prev_bytes = store_stats(eng)["disk_bytes"]
        for rnd in range(n_rounds):
            # fresh docs per round (generated OUTSIDE the timed region) so
            # discovery keeps producing new links and every round does
            # steady work — a fixed corpus dries up after a few rounds and
            # would mask O(table) growth behind shrinking rounds
            docs = docs_df(spark, n=n_docs, seed=1000 + rnd).persist()
            docs.count()
            t0 = time.time()
            stats = eng.run_round(rnd, docs=docs)
            round_s = time.time() - t0
            maintain_s = 0.0
            if compact_every and (rnd + 1) % compact_every == 0:
                t1 = time.time()
                eng.maintain()
                maintain_s = time.time() - t1
            st = store_stats(eng)
            rec = {
                "round": rnd,
                "round_s": round(round_s, 3),
                "maintain_s": round(maintain_s, 3),
                "emitted": stats["emitted"],
                "new_links": stats["new_links"],
                "bytes_delta": st["disk_bytes"] - prev_bytes,
                **st,
            }
            prev_bytes = st["disk_bytes"]
            rows.append(rec)
            docs.unpersist()
            print(json.dumps(rec), flush=True)

        # summary: slope of round_s vs round (least squares), part bounds
        import numpy as np

        xs = np.array([r["round"] for r in rows], dtype=float)
        ys = np.array([r["round_s"] for r in rows], dtype=float)
        slope = float(np.polyfit(xs, ys, 1)[0])
        med = float(np.median(ys))
        halves = (float(np.median(ys[: len(ys) // 2])), float(np.median(ys[len(ys) // 2 :])))
        summary = {
            "n_rounds": n_rounds,
            "seeds": n_seeds,
            "docs": n_docs,
            "compact_every": compact_every,
            "round_s_median": round(med, 3),
            "round_s_slope_per_round": round(slope, 5),
            "round_s_median_first_half": round(halves[0], 3),
            "round_s_median_second_half": round(halves[1], 3),
            "max_parts_frontier": max(r.get("parts_frontier", 0) for r in rows),
            "max_manifests_frontier": max(r.get("manifests_frontier", 0) for r in rows),
            "final_disk_mb": round(rows[-1]["disk_bytes"] / 2**20, 1),
        }
        print(json.dumps({"summary": summary}), flush=True)
        # markdown table (every 5th round) for BENCH.md
        print("| round | round_s | maintain_s | emitted | new_links | parts(frontier) | manifests(frontier) | disk MB |")
        print("|---|---|---|---|---|---|---|---|")
        for r in rows:
            if r["round"] % 5 == 0 or r["round"] == n_rounds - 1:
                print(
                    f"| {r['round']} | {r['round_s']} | {r['maintain_s']} | "
                    f"{r['emitted']} | {r['new_links']} | {r.get('parts_frontier')} | "
                    f"{r.get('manifests_frontier')} | {round(r['disk_bytes']/2**20, 1)} |"
                )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
