"""Version-order sort key (reference parity: C6).

The reference resolves dependency version ranges with Maven's
``ComparableVersion`` total order (MavenDependencyActor.scala:76-82).  We
re-express that order as a **sort-key string**: once each version maps to a
key whose lexicographic order equals the version order, plain JVM-side
``orderBy`` / ``min`` / window-rank implement the resolution join (J5) with
no comparator UDF in the hot path.

Key construction (pandas UDF, Arrow-batched): split on ``.`` / ``-``, trim
trailing numeric zeros (Maven: 1.0 == 1), then prefix-code each token so a
single lexicographic compare reproduces ComparableVersion order:

  pre-release qualifiers  "1<rank>"   (alpha < beta < milestone < rc < snap)
  end-of-version marker   "3"         (the release point)
  post-release qualifiers "4<rank>"   (sp, then unknown qualifiers by name)
  numeric extensions      "5<padded>"

so ``1.0-alpha < 1.0 < 1.0-sp < 1.0.1 < 1.2 < 1.10``.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

_PRE_RANK = {
    "alpha": "0", "a": "0",
    "beta": "1", "b": "1",
    "milestone": "2", "m": "2",
    "rc": "3", "cr": "3",
    "snapshot": "4",
}
_RELEASE_SYNONYMS = {"", "ga", "final", "release"}
_SPLIT_RE = re.compile(r"[.\-]")


def version_sort_key_py(v: str | None) -> str | None:
    if v is None:
        return None
    parts = _SPLIT_RE.split(v.strip().lower())
    out: list[str] = []

    def _trim_zero_run() -> None:
        # Maven normalization: zero numerics are trimmed before any
        # qualifier and at the end (1.0.0 == 1; 1.0-alpha == 1-alpha)
        while out and out[-1] == "5" + "0".zfill(10):
            out.pop()

    for p in parts:
        if p.isdigit():
            out.append("5" + p.zfill(10))
        elif p in _RELEASE_SYNONYMS:
            continue
        elif p in _PRE_RANK:
            _trim_zero_run()
            out.append("1" + _PRE_RANK[p])
        elif p == "sp":
            _trim_zero_run()
            out.append("40")
        else:
            _trim_zero_run()
            out.append("41" + p)  # unknown qualifiers: post-release, by name
    _trim_zero_run()
    return "".join(out) + "3"


@F.pandas_udf(StringType())
def version_sort_key(versions: pd.Series) -> pd.Series:
    """Arrow-vectorized version sort key (C6)."""
    return versions.map(version_sort_key_py)
