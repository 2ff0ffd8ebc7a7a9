"""Heavy hitters (frequent items) over a key column, exactly — via a
bounded-memory two-pass: per-partition Misra–Gries summaries propose a
candidate superset, then one cheap exact pass verifies.

Why not ``groupBy(key).count()`` alone: at web scale the key space (hosts,
URL patterns, shingles) can be ~row-sized, so the full hash-agg shuffles a
table as large as the input to answer "which few keys dominate". The
two-pass shape shuffles only candidate rows:

1. **Candidates** — each partition summarizes its rows with a Misra–Gries
   summary of ``k`` counters (Misra & Gries 1982; merge rule per Agarwal et
   al. 2012 "Mergeable Summaries": add counts, then subtract the (k+1)-th
   largest and drop non-positive). An item with partition frequency
   > n_p/(k+1) is guaranteed present; any key with GLOBAL frequency
   ≥ n/k has, by pigeonhole, ≥ 1/k of some partition, so the UNION of
   per-partition summaries is a superset of the global heavy hitters. The
   union is ≤ k × partitions keys — broadcastable.
2. **Verify** — a broadcast left-semi join keeps only candidate rows, and
   the exact count of those few keys partial-aggregates map-side; the
   shuffle is candidate-sized, not keyspace-sized. Keys with
   ``count * k >= n`` (exact integer compare, no float division) are the
   answer — identical to the full-shuffle SQL, which is the oracle.

State per task is O(k) regardless of input size (Arrow batches are
summarized with a vectorized value_counts, then folded into the bounded
summary), so the candidate pass survives any skew.

Reference parity: the reference has no frequency sketch; this extends the
sketch family (bloom ``operators/seen.py``, cuckoo ``operators/cuckoo.py``)
with the frequency dimension a crawl scheduler needs for hot-host detection
(feeding ``operators/salting.py``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _mg_fold(summary: dict, batch_counts: pd.Series, k: int) -> dict:
    """Merge exact batch counts into a Misra–Gries summary, keeping at most
    ``k`` counters (mergeable-summaries rule)."""
    for key, cnt in batch_counts.items():
        summary[key] = summary.get(key, 0) + int(cnt)
    if len(summary) > k:
        # subtract the (k+1)-th largest count from everyone; drop <= 0
        cut = sorted(summary.values(), reverse=True)[k]
        summary = {key: c - cut for key, c in summary.items() if c - cut > 0}
    return summary


def mg_candidates(df: DataFrame, key_col: str | Column, k: int) -> DataFrame:
    """Per-partition Misra–Gries candidate keys (column ``key``), at most
    ``k`` per partition. Superset of every key with global frequency
    ≥ n/k (see module docstring for the pigeonhole argument)."""
    keyed = df.select(
        (F.col(key_col) if isinstance(key_col, str) else key_col)
        .cast("string")
        .alias("key")
    )

    def summarize(batches):
        summary: dict = {}
        for pdf in batches:
            summary = _mg_fold(summary, pdf["key"].value_counts(), k)
        if summary:
            yield pd.DataFrame({"key": list(summary.keys())})

    return keyed.mapInPandas(summarize, schema="key string").dropDuplicates(["key"])


def heavy_hitters(df: DataFrame, key_col: str | Column, k: int) -> DataFrame:
    """Exact heavy hitters: every key whose frequency is ≥ n/k (i.e.
    ``cnt * k >= n``), with its exact count. Returns (key, cnt) —
    identical to the full-shuffle ``GROUP BY … HAVING`` SQL over the
    NON-NULL keys, computed with a candidate-sized shuffle.

    Null keys are excluded from both the candidate stream and ``n``:
    pandas ``value_counts`` drops NaN inside the sketch, so counting nulls
    in ``n`` (but never proposing NULL as a candidate) would silently skew
    the threshold and could drop a genuinely-heavy NULL group. Filtering
    nulls on both sides keeps the "identical to the SQL" guarantee exact —
    the matching SQL is ``WHERE key IS NOT NULL GROUP BY key HAVING
    count(*) * k >= (SELECT count(*) ... WHERE key IS NOT NULL)``."""
    key = (F.col(key_col) if isinstance(key_col, str) else key_col).cast("string")
    keyed = df.select(key.alias("key")).filter(F.col("key").isNotNull())
    n = keyed.count()
    cand = mg_candidates(keyed, "key", k)
    counts = (
        keyed.join(F.broadcast(cand), "key", "left_semi")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return counts.filter(F.col("cnt") * k >= F.lit(n)).select("key", "cnt")
