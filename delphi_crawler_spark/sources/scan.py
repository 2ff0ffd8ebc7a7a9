"""Frontier/source scans (reference parity: S1, C4, F5, S11).

The reference unfolds the remote Maven index into an **ordered** identifier
stream and parses each record's ``u`` field by splitting on ``|``, skipping
malformed records with a warning (IndexProcessing.scala:45-48,76-99). Our
sources are table scans; order is never implicit — it is an explicit ``seq``
column (monotonic discovery sequence), because Spark scans have no row
order guarantee across partitions.

Scale discipline: pass ``columns`` so column pruning reaches the parquet
footer, and ``predicate`` (a Column) so the filter pushes into the scan —
check with ``df.explain`` that ``PushedFilters``/``ReadSchema`` shrink.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def scan_parquet(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    predicate: Column | None = None,
) -> DataFrame:
    """Pruned + pushed-down parquet scan (S1's static analogue)."""
    df = spark.read.parquet(path)
    if predicate is not None:
        df = df.filter(predicate)  # before select: pushes into the scan
    if columns:
        df = df.select(*columns)
    return df


def attach_seq(df: DataFrame, order: list[str]) -> DataFrame:
    """Attach the explicit monotonic ``seq`` over a total order key.

    Delegates to ``operators.ordering.attach_global_seq`` (range partition +
    partition-local sort + driver prefix-sum offsets) — the exact global
    rank with NO single-task global sort, safe on unbounded tables. The
    total ``order`` key makes the result parallelism-independent. The cached
    intermediate is released by Spark's ContextCleaner on GC; callers inside
    a tight loop should use ``attach_global_seq`` directly and call its
    ``release()``.
    """
    from delphi_crawler_spark.operators.ordering import attach_global_seq

    out, _release = attach_global_seq(df, order)
    return out


def parse_index_records(
    records: DataFrame, field: str = "u", sep: str = r"\|", min_parts: int = 3
) -> DataFrame:
    """S1/C4/F5: split the index record field, skip malformed rows (the
    reference logs-and-drops, IndexProcessing.scala:78-99). Adds
    ``grp/art/ver`` columns; rows with fewer than ``min_parts`` fields drop.
    """
    parts = F.split(F.col(field), sep)
    return (
        records.withColumn("__p", parts)
        .filter(F.size("__p") >= min_parts)
        .withColumn("grp", F.element_at("__p", 1))
        .withColumn("art", F.element_at("__p", 2))
        .withColumn("ver", F.element_at("__p", 3))
        .drop("__p")
    )


def preflight(spark: SparkSession, paths: list[str]) -> None:
    """S11: reachability/preflight — verify every source path scans (schema
    read only, no data pass) and the session computes; abort before any
    round starts otherwise (reference Startup.scala:31-44,
    ElasticReachablePreflightCheck.scala:42-61)."""
    spark.sql("SELECT 1").collect()
    for p in paths:
        spark.read.parquet(p).schema  # raises on missing/corrupt


def parse_json_records(
    df: DataFrame,
    json_col: str,
    schema: str,
    required: str,
    keep: list[str] | None = None,
) -> DataFrame:
    """Semi-structured ingestion: parse a JSON-string column into typed
    fields with explicit malformed-record semantics — the JSON twin of
    ``parse_index_records`` (reference skips malformed ``|``-records with
    a warning, IndexProcessing.scala:45-48; a web-tier crawler ingests
    JSON API feeds / JSON-LD the same way: typed on success, flagged and
    quarantined on failure, never dropped silently).

    ``schema`` is a DDL string (e.g. ``"id BIGINT, lang STRING"``).
    Semantics pinned by the oracle + tests:
    - malformed JSON → every parsed field null, ``is_valid`` false;
    - well-formed JSON missing a field → that field null, row still valid;
    - validity = the ``required`` field parsed non-null (Spark's
      PERMISSIVE ``from_json`` returns an all-null struct for corrupt
      input, so a contractually-always-present field is the validity
      probe — the same trick the reference's ``u``-field split relies on).

    Scale shape: ``from_json`` is a JVM expression (Jackson inside
    whole-stage codegen) — no Python, no shuffle; the scan's column
    pruning reaches the raw string column only. ``keep`` carries
    pass-through columns (defaults to all non-JSON columns).
    """
    parsed = F.from_json(F.col(json_col), schema)
    carry = keep if keep is not None else [c for c in df.columns if c != json_col]
    out = df.select(*carry, parsed.alias("_p"))
    field_names = [f.strip().split()[0] for f in schema.split(",")]
    if required not in field_names:
        raise ValueError(f"required field {required!r} not in schema {schema!r}")
    return out.select(
        *carry,
        *[F.col(f"_p.{name}").alias(name) for name in field_names],
        F.col(f"_p.{required}").isNotNull().alias("is_valid"),
    )


def parse_wet_records(
    blobs: DataFrame,
    file_col: str = "file_id",
    content_col: str = "content",
    version_line: str = "WARC/1.0",
) -> DataFrame:
    """WET/WARC-conversion-style record extraction from concatenated text
    blobs — the interchange format crawl corpora ship in (header block,
    blank line, payload, records separated by the version line). Emits
    one row per record: (file_id, record_idx, target_uri, content_length,
    body, malformed) — a record with no WARC-Target-URI header is
    quarantined via ``malformed`` (F5 discipline: flagged, not dropped,
    never poisoning the well-formed rows).

    In-cell JVM: one split on the version line per blob, then per-record
    regexp header pulls and one split on the first blank line — zero
    Python, and the blob never shuffles (explode happens after the
    in-cell split, body stays with its record row).

    Reference parity: the reference's index-record parse is S1/C4
    (``IndexProcessing.scala:53``); this is the web-tier record format
    of the same source stage.
    """
    recs = F.filter(
        F.split(F.col(content_col), version_line.replace(".", r"\.")),
        lambda r: F.trim(r) != "",
    )
    ex = blobs.select(
        F.col(file_col).alias("file_id"),
        F.posexplode(recs).alias("record_idx", "raw"),
    )
    uri = F.regexp_extract(F.col("raw"), r"WARC-Target-URI:\s*(\S+)", 1)
    clen = F.regexp_extract(F.col("raw"), r"Content-Length:\s*(\d+)", 1)
    # payload = everything after the first blank line (header terminator)
    body = F.when(
        F.col("raw").contains("\n\n"),
        F.expr("substring(raw, instr(raw, '\n\n') + 2)"),
    ).otherwise(F.lit(""))
    return ex.select(
        "file_id",
        F.col("record_idx").cast("bigint").alias("record_idx"),
        F.when(uri != "", uri).alias("target_uri"),
        F.when(clen != "", clen.cast("bigint")).alias("content_length"),
        F.trim(body).alias("body"),
        (uri == "").alias("malformed"),
    )


def parse_git_identifiers(df: DataFrame, ident_col: str = "ident") -> DataFrame:
    """Git source-identifier parse — the reference's second discovery
    source kind (``discovery/git/GitIdentifier.scala:24``: a bare
    ``(repoUrl, commitId)`` pair, unused by its pipeline): realize it as
    a typed parse of ``<repoUrl>@<commitId>`` identifier strings with
    the validation the stub leaves implicit.

    - split on the LAST ``@`` (repo URLs may carry userinfo);
    - ``commit_id``: lowercased, valid iff 7-40 hex chars (git
      short/full object names);
    - ``repo_url``: scheme+host lowercased, trailing ``/`` and ``.git``
      stripped (the canonical-remote convention);
    - ``repo_key``: host-reversed registrable ordering + path (the C2
      key rule applied to the repo remote) — NULL for invalid rows;
    - rows failing either part carry ``valid = false`` and keep the raw
      identifier for quarantine (the F5 malformed-skip convention).

    Pure JVM regexp projection, zero shuffle."""
    raw = F.col(ident_col)
    has_at = raw.contains("@")
    repo_raw = F.when(has_at, F.expr(f"substring({ident_col}, 1, length({ident_col}) - position('@' in reverse({ident_col})))"))
    commit_raw = F.when(has_at, F.expr(f"substring({ident_col}, length({ident_col}) - position('@' in reverse({ident_col})) + 2)"))
    commit = F.lower(commit_raw)
    commit_ok = commit.rlike("^[0-9a-f]{7,40}$")
    scheme = F.lower(F.regexp_extract(repo_raw, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(repo_raw, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    host = F.lower(F.regexp_extract(rest, r"^([^/]+)", 1))
    path = F.regexp_extract(rest, r"^[^/]*(/.*)?$", 1)
    path_norm = F.regexp_replace(
        F.regexp_replace(path, r"\.git$", ""), r"/$", ""
    )
    repo_ok = (scheme != "") & (host != "") & (path_norm != "")
    repo_url = F.when(repo_ok, F.concat(scheme, F.lit("://"), host, path_norm))
    host_rev = F.array_join(F.reverse(F.split(host, r"\.")), ".")
    valid = has_at & commit_ok & repo_ok
    return df.select(
        "*",
        F.when(valid, repo_url).alias("repo_url"),
        F.when(valid, commit).alias("commit_id"),
        F.when(valid, F.concat(host_rev, path_norm)).alias("repo_key"),
        valid.alias("valid"),
    )
