"""Deterministic synthetic fixtures (FIXTURES.md; no external data).

Mirrors the reference's fixture-driven test strategy (fixed fixture ->
exact structural counts, ClassStreamReaderTest.scala:47-103) mapped onto
the engine's input shape from BASELINE.json ``input_hint``:

- ``docs``        interleaved text+media documents:
                  (doc_id, spans array<struct<kind,text,media_ref,offset>>)
- ``seed_urls``   raw frontier bootstrap (url, priority, discovery_ts, seq)
- ``robots_rules``(host, rule, path_prefix, order)
- ``politeness``  (host, rate_per_sec, max_burst) — the reference's
                  5 elem/s / burst 5 shaping budget (Configuration.scala:80)

Everything is seeded numpy; the same (seed, size) always yields the same
bytes. Hosts follow a heavy-hitter skew (top hosts own ~40% of links) to
exercise skew salting.
"""

from __future__ import annotations

from datetime import datetime, timezone

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

BASE_TS = datetime(2024, 1, 1, tzinfo=timezone.utc)

SPAN_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("kind", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("media_ref", T.StringType()),
            T.StructField("offset", T.IntegerType()),
        ]
    )
)

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", SPAN_SCHEMA),
    ]
)

SEED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("priority", T.IntegerType()),
        T.StructField("discovery_ts", T.TimestampType()),
        T.StructField("seq", T.LongType(), False),
    ]
)


def _hosts(n_hosts: int, rng: np.random.Generator) -> list[str]:
    tlds = ["com", "org", "net", "io", "dev"]
    return [
        f"host{i:03d}.example-{tlds[i % len(tlds)]}.{tlds[(i * 7) % len(tlds)]}"
        for i in range(n_hosts)
    ]


def _skewed_host_idx(n: int, n_hosts: int, rng: np.random.Generator) -> np.ndarray:
    """Heavy-hitter skew: zipf-ish, top-3 hosts own ~40% of draws."""
    raw = rng.zipf(1.35, size=n)
    return (raw - 1) % n_hosts


_JUNK_PATH_BITS = [
    "page",
    "a/./b",
    "a/b/../c",
    "item name",  # space -> %20
    "${var}",  # -> %24%7Bvar%7D
    "Data/%2f",
    "x/y/z",
    "idx.html",
]


def _raw_url(host: str, scheme: str, port_junk: bool, case_junk: bool, path_bits: list[str]) -> str:
    h = host.upper() if case_junk else host
    port = ":443" if (port_junk and scheme == "https") else (":80" if port_junk else "")
    return f"{scheme}://{h}{port}/" + "/".join(path_bits)


def gen_seed_urls(n: int = 50_000, n_hosts: int = 200, seed: int = 42) -> pd.DataFrame:
    """Raw seed list with ~8% post-canonicalization duplicates
    (case/port/dot-segment variants of earlier rows) — exercises
    first-occurrence dedup (reference MavenDiscoveryProcess.scala:57,71-75).
    """
    rng = np.random.default_rng(seed)
    hosts = _hosts(n_hosts, rng)
    hidx = _skewed_host_idx(n, n_hosts, rng)
    schemes = np.where(rng.random(n) < 0.8, "https", "http")
    n_bits = rng.integers(1, 4, size=n)
    bit_idx = rng.integers(0, len(_JUNK_PATH_BITS), size=(n, 3))
    urls = []
    for i in range(n):
        bits = [_JUNK_PATH_BITS[bit_idx[i, j]] for j in range(n_bits[i])] + [f"p{i}"]
        urls.append(_raw_url(hosts[hidx[i]], str(schemes[i]), False, False, bits))
    # duplicate variants: rewrite ~8% of rows as junk-variants of earlier rows
    n_dup = int(n * 0.08)
    dup_pos = rng.choice(np.arange(n // 10, n), size=n_dup, replace=False)
    for p in dup_pos:
        src = int(rng.integers(0, p))
        base = urls[src]
        scheme, rest = base.split("://", 1)
        hostpart, path = rest.split("/", 1)
        variant = int(rng.integers(0, 3))
        if variant == 0:
            urls[p] = f"{scheme}://{hostpart.upper()}/{path}"
        elif variant == 1:
            port = ":443" if scheme == "https" else ":80"
            urls[p] = f"{scheme}://{hostpart}{port}/{path}"
        else:
            urls[p] = f"{scheme}://{hostpart}/./{path}"
    prio = rng.integers(0, 10, size=n).astype("int32")
    seq = np.arange(n, dtype="int64")
    ts = pd.Timestamp(BASE_TS).tz_convert(None) + pd.to_timedelta(seq, unit="s")
    return pd.DataFrame(
        {"url": urls, "priority": prio, "discovery_ts": ts, "seq": seq}
    )


def gen_docs(n: int = 10_000, n_hosts: int = 200, seed: int = 42) -> pd.DataFrame:
    """Interleaved text+media docs per ``input_hint``; 1-40 spans per doc,
    kinds interleaved, offsets strictly increasing; ``link`` spans carry raw
    un-normalized URLs (the POM-dependency analogue,
    reference MavenDependencyActor.scala:93-99)."""
    rng = np.random.default_rng(seed + 1)
    hosts = _hosts(n_hosts, rng)
    rows = []
    for d in range(n):
        n_spans = 1 + min(39, int(rng.zipf(1.6)) - 1 + int(rng.integers(0, 6)))
        spans = []
        off = 0
        for s in range(n_spans):
            r = rng.random()
            if r < 0.55:
                kind, text, media = "text", f"lorem ipsum doc{d} span{s} " * int(rng.integers(1, 4)), None
            elif r < 0.85:
                h = hosts[int(_skewed_host_idx(1, n_hosts, rng)[0])]
                bits = [_JUNK_PATH_BITS[int(rng.integers(0, len(_JUNK_PATH_BITS)))], f"d{d}s{s}"]
                kind, text, media = (
                    "link",
                    _raw_url(h, "https" if rng.random() < 0.8 else "http",
                             rng.random() < 0.2, rng.random() < 0.2, bits),
                    None,
                )
            else:
                kind, text, media = "media", "", f"media://blob/{d}/{s}"
            spans.append({"kind": kind, "text": text, "media_ref": media, "offset": off})
            off += max(1, len(text)) + int(rng.integers(1, 10))
        rows.append({"doc_id": f"doc-{d:08d}", "spans": spans})
    return pd.DataFrame(rows)


def gen_robots_rules(n_hosts: int = 200, seed: int = 42) -> pd.DataFrame:
    """~500 allow/disallow prefix rules; a few hosts fully disallowed (F6)."""
    rng = np.random.default_rng(seed + 2)
    hosts = _hosts(n_hosts, rng)
    rows = []
    for i, h in enumerate(hosts):
        if i % 37 == 0:  # fully disallowed hosts
            rows.append({"host": h, "rule": "disallow", "path_prefix": "/", "order": 0})
            continue
        k = int(rng.integers(0, 4))
        for j in range(k):
            rows.append(
                {
                    "host": h,
                    "rule": "disallow" if rng.random() < 0.6 else "allow",
                    "path_prefix": "/" + _JUNK_PATH_BITS[int(rng.integers(0, len(_JUNK_PATH_BITS)))].split("/")[0],
                    "order": j,
                }
            )
    return pd.DataFrame(rows)


def gen_politeness(n_hosts: int = 200, seed: int = 42,
                   default_rate: float = 5.0, default_burst: int = 5) -> pd.DataFrame:
    """Per-host budget table; defaults = the reference throttle
    (5 elem/s, burst 5, Configuration.scala:80,101)."""
    rng = np.random.default_rng(seed + 3)
    hosts = _hosts(n_hosts, rng)
    rate = np.where(rng.random(len(hosts)) < 0.9, default_rate,
                    rng.choice([1.0, 2.0, 10.0], size=len(hosts)))
    burst = np.where(rate == default_rate, default_burst, np.maximum(1, rate.astype(int)))
    return pd.DataFrame(
        {"host": hosts, "rate_per_sec": rate.astype(float), "max_burst": burst.astype("int32")}
    )


# ------------------------------------------------------------- Spark loaders


def docs_df(spark: SparkSession, n: int = 10_000, seed: int = 42) -> DataFrame:
    pdf = gen_docs(n=n, seed=seed)
    data = [(r.doc_id, [tuple(s.values()) for s in r.spans]) for r in pdf.itertuples()]
    return spark.createDataFrame(data, schema=DOCS_SCHEMA)


def seed_urls_df(spark: SparkSession, n: int = 50_000, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(gen_seed_urls(n=n, seed=seed), schema=SEED_SCHEMA)


def robots_df(spark: SparkSession, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(gen_robots_rules(seed=seed))


def politeness_df(spark: SparkSession, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(gen_politeness(seed=seed))
