"""Two-cluster-size scaling evidence (north rule): run the SAME frontier
job at local[N] and local[4N] on the SAME input, report throughput at both
plus scaling efficiency = (t_N / t_4N) / 4.

The sandbox has no multi-executor cluster; per the task protocol,
parallelism levels stand in for cluster sizes. Each level runs in a fresh
JVM (subprocess of bench.py); ``reps`` runs per level, best-of taken (the
box is a noisy shared host — min is the least contaminated estimate).

Usage: python tools/scaling_report.py [reps] [frontier_n]
Writes BENCH.md and prints the table.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, frontier_n: int, queries: str) -> dict:
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_FRONTIER_N=str(frontier_n),
        SPARK_GRAFT_BENCH_ONLY=queries,
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    for line in out.stdout.splitlines():
        line = line.strip().lstrip("\r")
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON line from bench (cpus={cpus}):\n{out.stderr[-2000:]}")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    frontier_n = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    queries = "crawl_schedule"
    levels = (8, 32)
    best: dict[int, dict] = {}
    # interleave levels across reps so shared-host contention spikes hit
    # both levels with equal probability
    for r in range(reps):
        for cpus in levels:
            res = run_bench(cpus, frontier_n, queries)
            t = res["queries"]["crawl_schedule"]
            print(f"[scaling] cpus={cpus} rep={r}: {t}s "
                  f"({res['frontier_urls_per_sec']} URLs/s)", flush=True)
            if cpus not in best or t < best[cpus]["queries"]["crawl_schedule"]:
                best[cpus] = res
    t8 = best[8]["queries"]["crawl_schedule"]
    t32 = best[32]["queries"]["crawl_schedule"]
    speedup = t8 / t32
    eff = speedup / (levels[1] / levels[0])
    tp8 = frontier_n / t8
    tp32 = frontier_n / t32
    table = f"""# BENCH — frontier throughput & scaling efficiency

Job: `bench.py crawl_schedule` — the full scheduling core (canonicalize →
key derivation → F1 dedup → bloom-prefiltered seen anti-join → politeness
token-bucket slots → exact emission order) over a {frontier_n:,}-URL
deterministic synthetic frontier (~70% clean / 20% junk / 10% dup, skewed
hosts). Same input at both parallelism levels; best of {reps} runs per
level (fresh JVM each); sandbox protocol: `local[8]` vs `local[32]` stands
in for N vs 4N executors.

| parallelism | wall (s) | throughput (URLs/s) |
|---|---|---|
| local[8]  (N)  | {t8:.1f} | {tp8:,.0f} |
| local[32] (4N) | {t32:.1f} | {tp32:,.0f} |

**Speedup 8→32:** {speedup:.2f}× of 4× ideal → **scaling efficiency {eff:.2f}**
(target ≥ 0.8 per BASELINE.json).

Raw JSON: best-of runs

```json
{json.dumps(best[8])}
{json.dumps(best[32])}
```
"""
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(table)
    print(table)


if __name__ == "__main__":
    main()
