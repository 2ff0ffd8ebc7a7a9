"""Canonicalizer fast-path microbench: composed JVM-split expression vs
UDF-only path over the bench synth frontier mix (~70% already-canonical —
the steady-state shape; steady frontier re-entries are ~100% canonical).

`python tools/_canon_probe.py <cores> <n> <reps>` → one JSON line per mode.
Fresh process per invocation; run on a calm host (see BENCH_probes.md
protocol).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from pyspark.sql import functions as F

    import bench
    from delphi_crawler_spark.functions.canonicalize import (
        _canonicalize_url_udf, canonicalize_url)
    from delphi_crawler_spark.session import get_spark

    spark = get_spark("canon-probe", cores=cores)
    bench.warmup(spark)
    raw = bench.synth_frontier(spark, n).select("url").persist()
    raw.count()

    modes = {
        "udf_only": lambda df: df.select(_canonicalize_url_udf("url").alias("c")),
        "jvm_split": lambda df: df.select(canonicalize_url("url").alias("c")),
    }
    out = {}
    for name, fn in modes.items():
        best = None
        times = []
        for _ in range(reps):
            t0 = time.time()
            fn(raw).selectExpr("count(c) as n", "sum(length(c)) as b").collect()
            dt = time.time() - t0
            times.append(round(dt, 3))
            best = dt if best is None else min(best, dt)
        out[name] = {"best_sec": round(best, 3), "reps": times,
                     "urls_per_sec": round(n / best, 1)}
        print(json.dumps({"mode": name, "cores": cores, "n": n, **out[name]}),
              flush=True)
    # equivalence spot check rides along: both modes must agree on count+bytes
    a = modes["udf_only"](raw).selectExpr("count(c)", "sum(length(c))").collect()
    b = modes["jvm_split"](raw).selectExpr("count(c)", "sum(length(c))").collect()
    print(json.dumps({"equiv": a == b}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
