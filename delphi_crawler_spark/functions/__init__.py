"""Scalar function library (SURVEY.md §2.7): canonicalization, keys,
hashing, version sort keys, text analytics."""
