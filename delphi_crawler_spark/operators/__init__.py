"""Dataflow operators (SURVEY.md §2): dedup, seen-set, politeness,
robots, link extraction, ordered joins, aggregations, fuzzy dedup,
similarity search."""
