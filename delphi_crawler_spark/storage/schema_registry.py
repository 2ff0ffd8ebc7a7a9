"""Declared feature-schema registry + version migration (S10 parity).

The reference declares its entire feature space up-front as typed mapping
fields — ≈250 named integer fields plus one double — and creates the index
schema at bootstrap if absent (ElasticFeatureListMapping.scala:33-426,
ElasticIndexMaintenance.scala:30-77). It also carries a schema-version
check with a migrate-if-older hook (ElasticIndexMaintenance.scala:79-85 —
a stub in the reference too).

Spark-first realization: the registry is a typed catalog of every feature
column the engine can emit (Spark DDL types), persisted as a JSON blob in
the TableStore at bootstrap. ``ensure_registry`` is idempotent
create-if-absent; ``migrate_if_needed`` compares the stored version with
the engine's and records a migration event (additive column evolution is a
no-op on parquet/Iceberg — readers see NULL for new columns; that is the
migration the reference stubs out).
"""

from __future__ import annotations

import json

from delphi_crawler_spark.storage.tablestore import TableStore

SCHEMA_VERSION = 5  # bumped when the declared feature space changes
# v4: widened with the per-kind × per-metric cross product of
# operators/links.py span_stats_wide (WIDE_INT_FEATURES +
# WIDE_DOUBLE_FEATURES) — the span-domain analogue of the reference's
# ~250-field breadth; exercises migrate_if_needed on a real widening.
# v5: second widening pass (links.py V5_* blocks) — positional stats,
# character-class totals, 10-bucket length histograms, run/gap structure,
# and the 3×3 kind-transition matrix; declared space reaches 217 fields
# vs the reference's ≈250 (ElasticFeatureListMapping.scala:33-426).

# The engine's declared feature space: every analytics column any operator
# emits, with its Spark DDL type (the reference's fixed typed field list).
# The span-derived block mirrors operators/links.py SPAN_INT_FEATURES +
# SPAN_OTHER_FEATURES exactly — declared AND computed (asserted in tests).
FEATURE_FIELDS: dict[str, str] = {
    # span-derived document features (operators/links.py A4/A2)
    "n_spans": "int",
    "n_text": "int",
    "n_link": "int",
    "n_media": "int",
    "n_media_refs": "int",
    "n_empty_text": "int",
    "n_kind_switches": "int",
    "n_distinct_kinds": "int",
    "total_text_len": "int",
    "text_len_text": "int",
    "text_len_link": "int",
    "text_len_media": "int",
    "min_text_len": "int",
    "max_text_len": "int",
    "min_offset": "int",
    "max_offset": "int",
    "mean_text_len": "double",
    "link_density": "double",
    "media_density": "double",
    "first_kind": "string",
    "last_kind": "string",
    # text quality (functions/textfns.py)
    "n_chars_m": "bigint",
    "n_tokens": "bigint",
    "punct_ratio": "double",
    "stopword_ratio": "double",
    "mean_token_len": "double",
    "quality_score": "double",
    # token budgets
    "ws_tokens": "bigint",
    "bpe_tokens": "bigint",
    # language / fingerprints
    "lang_pred": "string",
    "fp_bow": "string",
    "fp_rolling": "string",
    # sketches
    "simhash": "bigint",
    "minhash": "array<bigint>",
    # multimodal (operators/multimodal.py)
    "media_kind": "string",
    "payload_bytes": "bigint",
    "payload_sha256": "string",
    "media_feat": "array<float>",
    "frame_ts": "bigint",
    # frontier keys (functions/canonicalize.py)
    "url_hash": "int",
    "url_hash64": "bigint",
    "host_rev": "string",
}


def _wide_fields() -> dict[str, str]:
    """The v4 per-kind × per-metric block, derived from the SAME name lists
    the operator emits (declared AND computed stays assertable)."""
    from delphi_crawler_spark.operators.links import (
        WIDE_DOUBLE_FEATURES,
        WIDE_INT_FEATURES,
    )

    out = {name: "int" for name in WIDE_INT_FEATURES}
    out.update({name: "double" for name in WIDE_DOUBLE_FEATURES})
    return out


FEATURE_FIELDS.update(_wide_fields())

REGISTRY_TABLE = "feature_registry"


def ensure_registry(store: TableStore) -> dict:
    """Create-if-absent (reference preflight + index creation). Returns the
    live registry dict. Idempotent."""
    existing = load_registry(store)
    if existing is not None:
        return existing
    reg = {"schema_version": SCHEMA_VERSION, "fields": FEATURE_FIELDS, "migrations": []}
    _write(store, reg)
    return reg


def load_registry(store: TableStore) -> dict | None:
    import os

    path = os.path.join(store.root, REGISTRY_TABLE + ".json")
    try:
        with open(path) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def _write(store: TableStore, reg: dict) -> None:
    import os
    import uuid

    os.makedirs(store.root, exist_ok=True)
    path = os.path.join(store.root, REGISTRY_TABLE + ".json")
    tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(reg, f, indent=1)
    os.replace(tmp, path)


def migrate_if_needed(store: TableStore) -> dict:
    """Version check + migrate-if-older (ElasticIndexMaintenance.scala:79-85).

    Additive field evolution is the only migration parquet/Iceberg needs
    (new columns read as NULL from old files); the registry records the
    event so operators can assert the fields they emit are declared."""
    reg = ensure_registry(store)
    if reg["schema_version"] < SCHEMA_VERSION:
        added = sorted(set(FEATURE_FIELDS) - set(reg["fields"]))
        removed = sorted(set(reg["fields"]) - set(FEATURE_FIELDS))
        reg["migrations"].append(
            {
                "from": reg["schema_version"],
                "to": SCHEMA_VERSION,
                "added": added,
                "removed": removed,
            }
        )
        reg["fields"] = {**reg["fields"], **FEATURE_FIELDS}
        reg["schema_version"] = SCHEMA_VERSION
        _write(store, reg)
    return reg


def check_fields_declared(columns: list[str]) -> list[str]:
    """The undeclared columns in ``columns`` (empty = all declared)."""
    return [c for c in columns if c not in FEATURE_FIELDS]
