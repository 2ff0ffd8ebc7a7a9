"""MinHash scaling-probe breakdown (VERDICT r02 'what's wrong #1').

Three measurements that together explain the 0.47 efficiency the r02 probe
recorded for the Spark minhash job while the register-only `spin` control
showed 0.87:

  kernel <procs> <docs_per_proc> <reps>
      the EXACT `_minhash` UDF body (shingle hash + blocked universal-hash
      min-reduce) run under multiprocessing with NO Spark — the honest
      host ceiling for a memory-streaming numpy workload (the `spin`
      control only measures register arithmetic, which the shared VM
      scales much better than memory traffic).
  gen <cores> <n>
      the probe's synthetic input generation + repartition ONLY (what the
      r02 probe measured inside the timed region alongside the UDF).
  udf <cores> <n>
      the UDF stage ONLY: input pre-materialized (persisted + counted)
      before the timer starts.

Each invocation is one fresh process/JVM; print one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def _make_texts(n_docs: int, seed: int) -> pd.Series:
    rng = np.random.default_rng(seed)
    toks = rng.integers(0, 5000, size=(n_docs, 60))
    return pd.Series([" ".join(f"tok{t}" for t in row) for row in toks])


def _kernel_once(texts: pd.Series) -> None:
    from delphi_crawler_spark.operators.dedup_fuzzy import (
        _GRAM_BLOCK,
        MERSENNE_P,
        _shingle_hash_groups,
    )

    num_hashes = 64
    rng = np.random.default_rng(42)
    a = rng.integers(1, MERSENNE_P, size=num_hashes, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, MERSENNE_P, size=num_hashes, dtype=np.uint64)
    rows, grams, n_rows = _shingle_hash_groups(texts, 3)
    sigs = np.full((n_rows, num_hashes), np.iinfo(np.uint64).max, dtype=np.uint64)
    for lo in range(0, len(rows), _GRAM_BLOCK):
        r = rows[lo : lo + _GRAM_BLOCK]
        g = grams[lo : lo + _GRAM_BLOCK]
        v = a[:, None] * g[None, :] + b[:, None]
        starts = np.flatnonzero(np.diff(r, prepend=r[0] - 1))
        mins = np.minimum.reduceat(v, starts, axis=1)
        pr = r[starts]
        sigs[pr, :] = np.minimum(sigs[pr, :], mins.T)


def _kernel_worker(args) -> float:
    wid, n_docs, reps = args
    texts = _make_texts(n_docs, seed=100 + wid)
    _kernel_once(texts)  # warm
    best = None
    for _ in range(reps):
        t0 = time.time()
        _kernel_once(texts)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def run_kernel(procs: int, docs_per_proc: int, reps: int) -> None:
    import multiprocessing as mp

    with mp.Pool(procs) as p:
        times = p.map(_kernel_worker, [(i, docs_per_proc, reps) for i in range(procs)])
    wall = max(times)  # all workers run concurrently; slowest binds
    total = procs * docs_per_proc
    print(
        json.dumps(
            {
                "job": "kernel",
                "procs": procs,
                "docs": total,
                "best_sec": round(wall, 3),
                "per_sec": round(total / wall, 1),
            }
        )
    )


def _probe_docs(spark, cores: int, n: int):
    from pyspark.sql import functions as F

    return (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.array(
                    *[
                        F.concat(F.lit("tok"), F.pmod(F.col("id") * F.lit(97 + i), F.lit(5000)))
                        for i in range(60)
                    ]
                ),
            ).alias("text"),
        )
        .repartition(cores * 2)
    )


def run_spark(job: str, cores: int, n: int, reps: int) -> None:
    import bench
    from delphi_crawler_spark.operators.dedup_fuzzy import minhash_signatures
    from delphi_crawler_spark.session import get_spark

    spark = get_spark(f"mh-{job}-{cores}", cores=cores)
    bench.warmup(spark)
    best = None
    if job == "gen":
        for _ in range(reps):
            t0 = time.time()
            bench.force(_probe_docs(spark, cores, n))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
    else:  # udf: pre-materialize the input outside the timer
        docs = _probe_docs(spark, cores, n).persist()
        docs.count()
        for _ in range(reps):
            t0 = time.time()
            bench.force(minhash_signatures(docs, "text"))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        docs.unpersist()
    spark.stop()
    print(
        json.dumps(
            {
                "job": job,
                "cores": cores,
                "docs": n,
                "best_sec": round(best, 3),
                "per_sec": round(n / best, 1),
            }
        )
    )


if __name__ == "__main__":
    job = sys.argv[1]
    if job == "kernel":
        run_kernel(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
    else:
        run_spark(job, int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
