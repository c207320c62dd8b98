"""Pipeline control plane: lifecycle + inspection over StreamingQuery
handles.

Re-expresses the reference's REST control plane (reference:
crates/rest-api/src/pipelines.rs:1-640 — POST /pipelines create,
GET list/status, PATCH merge-and-restart, POST pause|resume|stop,
DELETE; crates/runner/src/pipeline_manager.rs:702-931 — the
PipelineController methods those routes call; schema/DLQ inspection
endpoints runner/src/schema_api.rs, dlq peek/ack/purge) as a plain
Python manager — SURVEY §3.2's stated reduction: the HTTP layer is a
thin shell (FastAPI/Flask/CLI) over these exact methods, so the
contract lives here and stays testable without a server.

Semantics mirrored:
- PATCH deep-merges the JSON patch into the stored spec and restarts
  the pipeline (README.md:306-317).
- pause = stop the query, keep the checkpoint; resume = rebuild from
  the same spec + checkpoint (coordinator.rs watch-channel pause
  reduced to Spark's stop/restart-from-checkpoint, SURVEY §2.3-9).
- per-pipeline DLQ + schema registry inspection.

Scale: the manager holds control-plane state only (specs + query
handles); all data-plane state lives in Spark checkpoints and the
OffsetStore, so a manager restart recovers by re-creating pipelines
from their specs — the same recovery story as the reference's
pipeline_manager rebuilding from stored PipelineSpecs.
"""

from __future__ import annotations

import copy
import json
import os
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from .plans.compiler import PipelineSpec, compile_pipeline
from .sinks.dlq import DlqStore
from .streaming.pipeline import StreamingPipeline, file_change_source



def _injected_repr(obj) -> str:
    """Specs may carry injected live objects (SR transport, test
    brokers); persist a placeholder — the in-memory handle keeps the
    real object, and a restart-from-disk legitimately requires
    re-injection (same as the reference's secret references)."""
    return f"<injected:{type(obj).__name__}>"

def deep_merge(base: dict, patch: dict) -> dict:
    """JSON-merge semantics of the reference's PATCH: objects merge
    recursively, everything else (lists, scalars) replaces."""
    out = copy.deepcopy(base)
    for k, v in patch.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = deep_merge(out[k], v)
        elif v is None:
            out.pop(k, None)  # JSON merge-patch: null deletes the key
        else:
            out[k] = copy.deepcopy(v)
    return out


@dataclass
class PipelineHandle:
    name: str
    spec: dict
    status: str = "created"  # created|running|paused|stopped|failed
    query: Any = None
    error: str | None = None
    streaming: bool = False


class PipelineManager:
    """The PipelineController surface (pipeline_manager.rs:702-931)."""

    def __init__(self, spark: SparkSession, state_dir: str, *, catalog_execute=None):
        self.spark = spark
        self.state_dir = state_dir
        self._handles: dict[str, PipelineHandle] = {}
        self._drift: dict[str, dict[str, dict]] = {}
        # the JDBC catalog seam (schema/catalog.py Execute): when wired,
        # POST .../schemas/reload re-bootstraps the registry from
        # INFORMATION_SCHEMA (reference schema_api.rs reload); absent,
        # reload stays owned by the DDL-capture path
        self.catalog_execute = catalog_execute
        os.makedirs(state_dir, exist_ok=True)

    def reload_schemas(self, name: str, *, db: str | None = None, table: str | None = None) -> dict:
        """Live-catalog reload through the injected JDBC seam: expand
        the pipeline's table patterns (or the single db.table asked
        for), fetch current schemas, register changed ones (fingerprint
        dedupe makes unchanged tables no-ops)."""
        if self.catalog_execute is None:
            raise NotImplementedError("no catalog connection configured")
        self.status(name)  # 404 for unknown pipeline
        from .schema.catalog import bootstrap_registry, load_catalog

        spec = json.load(open(self._spec_path(name)))
        if db and table:
            patterns = [f"{db}.{table}"]
        else:
            patterns = (
                spec.get("spec", {}).get("source", {}).get("config", {}).get("tables")
                or ["*.*"]
            )
        src_type = spec.get("spec", {}).get("source", {}).get("type", "mysql")
        # non-DB sources (stream_parquet etc.) still allow catalog
        # bootstrap when a seam is wired; default to MySQL pattern rules
        dialect = src_type if src_type in ("mysql", "postgres") else "mysql"
        cat = load_catalog(self.catalog_execute, patterns, dialect)
        n = bootstrap_registry(self.schemas(name), cat)
        return {"reloaded": n, "tables": [f"{t.db}.{t.table}" for t in cat]}

    # -- paths ------------------------------------------------------------

    def _pipeline_dir(self, name: str) -> str:
        return os.path.join(self.state_dir, name)

    def _spec_path(self, name: str) -> str:
        return os.path.join(self._pipeline_dir(name), "spec.json")

    # -- lifecycle --------------------------------------------------------

    def create(self, spec: dict, *, start: bool = True) -> dict:
        """POST /pipelines: register (persist spec) and optionally start."""
        ps = PipelineSpec.from_dict(spec)
        if ps.name in self._handles and self._handles[ps.name].status == "running":
            raise ValueError(f"pipeline {ps.name!r} already running")
        os.makedirs(self._pipeline_dir(ps.name), exist_ok=True)
        with open(self._spec_path(ps.name), "w") as f:
            json.dump(spec, f, default=_injected_repr)
        h = PipelineHandle(name=ps.name, spec=spec)
        self._handles[ps.name] = h
        if start:
            self._start(h)
        return self.status(ps.name)

    def _start(self, h: PipelineHandle) -> None:
        spec_src = h.spec.get("spec", h.spec).get("source", {})
        ps = PipelineSpec.from_dict(h.spec)
        program, sinks, policy = compile_pipeline(ps)
        try:
            if spec_src.get("type") == "stream_parquet":
                # streaming source: file-backed change feed (the
                # Kafka/Debezium-front stand-in, SURVEY §7.2)
                path = spec_src["path"]
                schema = self.spark.read.parquet(path).schema
                transforms = _spec_transforms(ps)
                pipeline = StreamingPipeline(
                    name=h.name,
                    source=file_change_source(
                        path, schema,
                        max_files_per_trigger=spec_src.get("max_files_per_trigger", 10),
                    ),
                    transforms=transforms,
                    sinks=sinks,
                    policy=policy,
                    checkpoint_dir=os.path.join(self._pipeline_dir(h.name), "checkpoint"),
                    offsets_path=os.path.join(self._pipeline_dir(h.name), "offsets.json"),
                )
                h.query = pipeline.start(self.spark, trigger_available_now=True)
                h.streaming = True
            else:
                # batch program (snapshot/changefeed/parquet sources):
                # one-shot run through the same fan-out/commit machinery
                from .sinks.foreach import fan_out_batch

                df = program(self.spark, spec_src.get("sf_dir", ""))
                fan_out_batch(df, 0, sinks, policy=policy)
                h.streaming = False
            h.status = "running"
            h.error = None
        except Exception as e:  # noqa: BLE001 — surface as pipeline status
            h.status = "failed"
            h.error = str(e)
            raise

    def pause(self, name: str) -> dict:
        """POST /pipelines/{name}/pause: stop the query, keep the
        checkpoint (restart picks up exactly where it left off)."""
        h = self._require(name)
        if h.query is not None:
            h.query.stop()
            h.query.awaitTermination(30)
            h.query = None
        h.status = "paused"
        from .metrics import get_registry

        get_registry().inc("deltaforge_pipeline_pauses_total", pipeline=name)
        return self.status(name)

    def resume(self, name: str) -> dict:
        """POST /pipelines/{name}/resume: rebuild from spec + checkpoint."""
        h = self._require(name)
        if h.status == "running" and h.query is not None:
            return self.status(name)
        self._start(h)
        from .metrics import get_registry

        get_registry().inc("deltaforge_pipeline_resumes_total", pipeline=name)
        return self.status(name)

    def stop(self, name: str) -> dict:
        h = self._require(name)
        if h.query is not None:
            h.query.stop()
            h.query.awaitTermination(30)
            h.query = None
        h.status = "stopped"
        return self.status(name)

    def patch(self, name: str, patch: dict) -> dict:
        """PATCH /pipelines/{name}: deep-merge into the stored spec and
        restart (README.md:306-317)."""
        h = self._require(name)
        was_running = h.status == "running"
        if h.query is not None:
            h.query.stop()
            h.query.awaitTermination(30)
            h.query = None
        h.spec = deep_merge(h.spec, patch)
        with open(self._spec_path(name), "w") as f:
            json.dump(h.spec, f, default=_injected_repr)
        if was_running:
            self._start(h)
        return self.status(name)

    def delete(self, name: str) -> None:
        """DELETE /pipelines/{name}: stop and forget (state dir kept —
        the reference keeps checkpoints for re-create)."""
        h = self._require(name)
        if h.query is not None:
            h.query.stop()
            h.query.awaitTermination(30)
        del self._handles[name]

    # -- inspection -------------------------------------------------------

    def status(self, name: str) -> dict:
        h = self._require(name)
        active = h.query is not None and h.query.isActive
        if h.streaming and h.status == "running" and not active:
            # availableNow triggers terminate on their own when drained
            h.status = "finished" if h.query is None or h.query.exception() is None else "failed"
        progress = None
        if h.query is not None and h.query.lastProgress:
            lp = h.query.lastProgress
            progress = {"batchId": lp.get("batchId"), "numInputRows": lp.get("numInputRows")}
        from .metrics import get_registry

        # reference gauge encoding: 1 running, 0 paused/stopped/finished
        get_registry().set(
            "deltaforge_pipeline_status", 1.0 if h.status == "running" else 0.0, pipeline=name
        )
        get_registry().set("deltaforge_pipelines_total", len(self._handles))
        return {
            "name": h.name,
            "status": h.status,
            "active": active,
            "error": h.error,
            "lastProgress": progress,
        }

    def list(self) -> list[dict]:
        return [self.status(n) for n in sorted(self._handles)]

    def await_drained(self, name: str, timeout: int = 120) -> None:
        """Wait for an availableNow run to finish its backlog."""
        h = self._require(name)
        if h.query is not None:
            h.query.awaitTermination(timeout)

    def dlq(self, name: str, **kw) -> DlqStore:
        """Per-pipeline DLQ inspection (peek/ack/purge endpoints)."""
        return DlqStore(
            self.spark,
            os.path.join(self._pipeline_dir(name), "dlq"),
            pipeline=name,
            **kw,
        )

    def schemas(self, name: str):
        """Per-pipeline DB-catalog schema registry (the schema_api.rs
        inspection surface)."""
        from .schema.registry import SchemaRegistry

        return SchemaRegistry(self.spark, os.path.join(self._pipeline_dir(name), "schemas"))

    def sensed(self, name: str):
        """Per-pipeline inferred-schema store (sensing_api.rs surface):
        the sensing step registers inferred payload schemas here, keyed
        db='__sensed'."""
        from .schema.registry import SchemaRegistry

        return SchemaRegistry(self.spark, os.path.join(self._pipeline_dir(name), "sensing"))

    def checkpoints(self, name: str) -> list[dict]:
        """GET /pipelines/{name}/checkpoints (apireference.md "Checkpoint
        Inspection"): per-sink committed positions + staleness. The
        reference reports binlog file/pos; here the committed unit is
        the micro-batch id (the same MIN-resume contract,
        sinks/foreach.py OffsetStore)."""
        import time

        self._require(name)
        path = os.path.join(self._pipeline_dir(name), "offsets.json")
        if not os.path.exists(path):
            return []
        age = round(max(0.0, time.time() - os.path.getmtime(path)), 3)
        with open(path) as f:
            state = json.load(f)
        return [
            {"sink_id": s, "position": {"batch_id": b}, "age_seconds": age}
            for s, b in sorted(state.items())
        ]

    def record_drift(self, name: str, reports: list[dict]) -> None:
        """Pipelines publish per-table drift reports here (the
        foreachBatch drift step calls this with driftstats output —
        runner/src/drift_detector.rs accumulates the same way)."""
        self._require(name)
        self._drift[name] = {r["table"]: r for r in reports}

    def drift(self, name: str, table: str | None = None):
        """GET /pipelines/{name}/drift[/{table}] (apireference.md
        "Drift Detection")."""
        self._require(name)
        reports = self._drift.get(name, {})
        if table is None:
            return [reports[t] for t in sorted(reports)]
        if table not in reports:
            raise KeyError(f"no drift data for table {table!r}")
        return reports[table]

    def sensing_stats(self, name: str) -> dict:
        """GET /pipelines/{name}/sensing/stats. The reference counts
        runtime cache hits/misses on its streaming structure cache; the
        batch re-expression's cache IS a groupBy on the structure
        fingerprint (schema/sensing.py), so the honest analog is the
        registered structure count per table."""
        reg = self.sensed(name)
        tables = []
        total = 0
        for entry in reg.list_tables():
            t = entry["table"]
            n = len(reg.versions("__sensed", t))
            total += n
            tables.append({"table": t, "cached_structures": n, "max_cache_size": 100})
        return {"tables": tables, "total_structures": total}

    def _require(self, name: str) -> PipelineHandle:
        if name not in self._handles:
            raise KeyError(f"no such pipeline: {name}")
        return self._handles[name]


def _spec_transforms(ps: PipelineSpec) -> list[Callable[[DataFrame], DataFrame]]:
    from .plans.compiler import _build_processor

    return [_build_processor(p) for p in ps.processors]
