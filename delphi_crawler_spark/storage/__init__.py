"""Persistent state: snapshot-atomic keyed tables (the reference's
Elasticsearch document store re-expressed as lakehouse tables)."""
