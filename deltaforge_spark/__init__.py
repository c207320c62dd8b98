"""deltaforge_spark — a PySpark-native change-data / data-pipeline engine.

A from-scratch re-expression of the capabilities of the reference CDC
engine (vnvo/deltaforge, Rust — see /root/repo/SURVEY.md) on idiomatic
PySpark: DataFrame/SQL for all transforms, Structured Streaming for the
streaming path, `foreachBatch` orchestration for delivery semantics.

Layout:
- ``envelope``     — the change-event envelope schema + constructors
- ``sources``      — snapshot readers, deterministic change feeds, streams
- ``operators``    — filter / flatten / outbox / routing / envelopes /
                     dedup / similarity / text analysis / multimodal
- ``functions``    — scalar helpers (idempotency key, uuid7, hashes)
- ``sinks``        — lake writer, kafka builder, foreachBatch fan-out, DLQ
- ``schema``       — registry, sensing (inference + fingerprints), drift
- ``plans``        — YAML pipeline spec -> DataFrame program compiler
- ``streaming``    — readStream orchestration and stateful helpers

Everything is a pure ``DataFrame -> DataFrame`` function so the same
operator chain runs in batch (correctness oracles) and streaming
(production) mode.
"""

__version__ = "0.1.0"
