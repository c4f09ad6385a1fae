"""Streaming & incremental processing: release-grain incremental batch
(the reference's model, ST1-ST6) plus true Structured Streaming operators
(windowed/session aggregation, idempotent foreachBatch upsert)."""
