"""Robots/authorization gate (F6) as a broadcast trie + vectorized filter.

The reference has no robots.txt (Maven Central); its analogue is the fixed
repository allowlist ``mavenRepoBase`` (Configuration.scala:51) every fetch
must pass through. The north rule requires a real robots gate: parse
per-host allow/disallow path-prefix rules into a broadcast structure and
filter candidates with a vectorized ``allowed(host, path)``.

Semantics (de-facto robots standard): the **longest matching path prefix**
wins; on equal length, ``allow`` wins; a host with no rules is allowed.

Scale: the rules table is a small dim — collected once to the driver,
compiled into per-host sorted prefix lists, and broadcast (one copy per
executor).  Matching is a pandas UDF over Arrow batches; per batch it
groups by host so each host's prefix list is scanned with numpy
``str.startswith`` vectorization rather than per-row Python dict walks.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType


def compile_rules(rules_pdf: pd.DataFrame) -> dict[str, list[tuple[str, bool]]]:
    """host -> [(path_prefix, is_allow)] sorted by (prefix_len desc,
    allow-first) so the first match is the winning rule."""
    compiled: dict[str, list[tuple[str, bool]]] = {}
    for host, grp in rules_pdf.groupby("host"):
        entries = [
            (str(r.path_prefix), str(r.rule) == "allow")
            for r in grp.sort_values("order").itertuples()
        ]
        entries.sort(key=lambda e: (-len(e[0]), not e[1]))
        compiled[host] = entries
    return compiled


def allowed_py(compiled: dict, host: str, path: str) -> bool:
    rules = compiled.get(host)
    if not rules:
        return True
    for prefix, is_allow in rules:
        if path.startswith(prefix):
            return is_allow
    return True


def robots_filter(
    candidates: DataFrame,
    rules: DataFrame | None,
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """Drop disallowed candidate URLs. ``rules`` is the small
    (host, rule, path_prefix, order) dim table."""
    if rules is None:
        return candidates
    spark: SparkSession = candidates.sparkSession
    compiled = compile_rules(rules.toPandas())
    bc = spark.sparkContext.broadcast(compiled)

    @F.pandas_udf(BooleanType())
    def _allowed(hosts: pd.Series, paths: pd.Series) -> pd.Series:
        comp = bc.value
        out = pd.Series(True, index=hosts.index)
        for host, idx in hosts.groupby(hosts).groups.items():
            rules_h = comp.get(host)
            if not rules_h:
                continue
            sub = paths.loc[idx]
            verdict = pd.Series(True, index=sub.index)
            undecided = pd.Series(True, index=sub.index)
            for prefix, is_allow in rules_h:
                hit = undecided & sub.str.startswith(prefix, na=False)
                verdict.loc[hit] = is_allow
                undecided &= ~hit
            out.loc[idx] = verdict
        return out

    path = F.regexp_replace(
        F.col(url_col), r"^[a-z][a-z0-9+.\-]*://[^/]*", ""
    )
    return candidates.filter(_allowed(F.col(host_col), path))
