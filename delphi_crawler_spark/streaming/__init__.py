"""Structured Streaming façade over the iterated-batch engine (§2.8)."""
