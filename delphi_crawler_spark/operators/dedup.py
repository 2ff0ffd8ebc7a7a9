"""First-occurrence dedup (reference parity: F1).

The reference keeps a ``mutable.HashSet`` seen-cache and keeps an identifier
iff not seen, adding on first sight (MavenDiscoveryProcess.scala:57,71-75;
MavenCrawlActor.scala:33,45-49). In a stream, *first occurrence wins* — so
plain ``dropDuplicates`` is NOT a faithful translation (under shuffle it
keeps an arbitrary row). We window on the explicit arrival order ``seq``:

    row_number() OVER (PARTITION BY key ORDER BY seq) == 1

which is deterministic at every parallelism level (the two-cluster-size
equivalence criterion) and lets Catalyst run it as a partial-aggregating
shuffle on the key.

Scale note (100 TB): this is one hash shuffle on the dedup key.  The window
uses only ``row_number`` with a bounded frame, so Spark evaluates it
streaming per key group — no buffering beyond the sorter, spill-capable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def first_occurrence_dedup(
    df: DataFrame,
    key: str | list[str] = "url",
    order: list[str] | None = None,
) -> DataFrame:
    """Keep the first-arriving row per key (order = ``seq`` by default)."""
    keys = [key] if isinstance(key, str) else list(key)
    order = order or ["seq"]
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).asc() for c in order])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
