"""Confluent Schema Registry HTTP client — the live half of the Avro
wire format (reference avro.rs:100-250 uses schema_registry_converter
over HTTP; runner/tests/avro_e2e_tests.rs round-trips against a real
registry). Stdlib-only (urllib), speaking the public Confluent REST
protocol:

- ``POST /subjects/{subject}/versions``  → {"id": N}   (register)
- ``GET  /schemas/ids/{id}``             → {"schema": "..."}
- ``GET  /subjects/{subject}/versions/latest`` → {id, version, schema}
- ``POST /compatibility/subjects/{s}/versions/latest`` → {"is_compatible": b}

Caching matches real clients: subject→id after one register, id→schema
after one fetch — the encode/decode hot paths never re-dial. Errors
surface the registry's ``error_code`` (40401 subject not found, 40403
schema not found, 409 incompatible) as ``SchemaRegistryError`` instead
of bare HTTP failures.

Duck-type compatible with ``avro_schema.SchemaRegistryClient`` where it
matters: ``register(subject, schema) -> id``, so
``plan_avro_encoding`` accepts either.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request
from typing import Any

CONTENT_TYPE = "application/vnd.schemaregistry.v1+json"


class SchemaRegistryError(RuntimeError):
    def __init__(self, message: str, *, error_code: int | None = None, http_status: int | None = None):
        super().__init__(message)
        self.error_code = error_code
        self.http_status = http_status


class HttpSchemaRegistry:
    def __init__(
        self,
        base_url: str,
        *,
        timeout: float = 10.0,
        auth: tuple[str, str] | None = None,
        max_retries: int = 3,
        backoff_s: float = 0.05,
    ):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        self._auth = auth
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self._id_by_subject: dict[str, int] = {}  # latest id per subject
        self._id_by_schema: dict[tuple[str, str], int] = {}
        self._schema_by_id: dict[int, str] = {}

    # ----------------------------------------------------------- http

    def _call(self, method: str, path: str, body: dict | None = None) -> dict[str, Any]:
        """5xx and connection failures retry with backoff (the
        sr_outage contract: a registry blip must not fail a batch whose
        only registry need is an id lookup); 4xx are semantic and raise
        immediately."""
        import time

        last: Exception | None = None
        for attempt in range(self.max_retries + 1):
            if attempt:
                time.sleep(self.backoff_s * (2 ** (attempt - 1)))
            req = urllib.request.Request(
                self.base_url + path,
                data=None if body is None else json.dumps(body).encode(),
                method=method,
                headers={"Content-Type": CONTENT_TYPE, "Accept": CONTENT_TYPE},
            )
            if self._auth:
                import base64

                tok = base64.b64encode(f"{self._auth[0]}:{self._auth[1]}".encode()).decode()
                req.add_header("Authorization", f"Basic {tok}")
            try:
                with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                    return json.loads(resp.read().decode() or "{}")
            except urllib.error.HTTPError as e:
                raw = e.read().decode(errors="replace")
                if e.code >= 500:
                    last = SchemaRegistryError(raw or str(e), http_status=e.code)
                    continue  # transient server side: retry
                try:
                    err = json.loads(raw)
                    raise SchemaRegistryError(
                        err.get("message", raw), error_code=err.get("error_code"),
                        http_status=e.code,
                    ) from e
                except (ValueError, KeyError):
                    raise SchemaRegistryError(raw or str(e), http_status=e.code) from e
            except urllib.error.URLError as e:
                last = SchemaRegistryError(f"registry unreachable: {e.reason}")
                continue
        raise SchemaRegistryError(
            f"registry still failing after {self.max_retries} retries: {last}"
        ) from last

    # ------------------------------------------------------------- api

    def register(self, subject: str, schema: dict | str) -> int:
        """Register (idempotent server-side: identical text returns the
        existing global id). The cache is keyed on (subject, schema
        text) like Confluent clients — a subject-only key would hand
        back the STALE id after in-process schema evolution, framing
        payloads with the wrong schema id."""
        schema_str = schema if isinstance(schema, str) else json.dumps(schema)
        hit = self._id_by_schema.get((subject, schema_str))
        if hit is not None:
            return hit
        out = self._call("POST", f"/subjects/{subject}/versions", {"schema": schema_str})
        schema_id = int(out["id"])
        self._id_by_schema[(subject, schema_str)] = schema_id
        self._id_by_subject[subject] = schema_id  # latest per subject
        self._schema_by_id[schema_id] = schema_str
        return schema_id

    def get_schema(self, schema_id: int) -> str:
        """Consumer path: resolve the 5-byte frame's id to schema text."""
        if schema_id in self._schema_by_id:
            return self._schema_by_id[schema_id]
        out = self._call("GET", f"/schemas/ids/{schema_id}")
        self._schema_by_id[schema_id] = out["schema"]
        return out["schema"]

    def latest(self, subject: str) -> dict[str, Any]:
        return self._call("GET", f"/subjects/{subject}/versions/latest")

    def subjects(self) -> list[str]:
        out = self._call("GET", "/subjects")
        return list(out) if isinstance(out, list) else out  # plain array

    def is_compatible(self, subject: str, schema: dict | str) -> bool:
        schema_str = schema if isinstance(schema, str) else json.dumps(schema)
        out = self._call(
            "POST", f"/compatibility/subjects/{subject}/versions/latest",
            {"schema": schema_str},
        )
        return bool(out.get("is_compatible"))

    def cached(self, subject: str) -> tuple[int, str] | None:
        sid = self._id_by_subject.get(subject)
        if sid is None:
            return None
        return sid, self._schema_by_id.get(sid, "")
