"""Partition-local client sinks: Redis Streams, NATS JetStream, HTTP.

Re-expresses the reference's client sinks
(reference: crates/sinks/src/redis.rs — XADD with df-key/df-headers/
idempotency_key fields; nats.rs — Nats-Msg-Id dedup header; http.rs —
URL templates, batch mode, retry on 5xx) as ``foreachPartition``
writers: one client per partition, pipelined sends, per-row dynamic
destinations from the ``routing`` struct.

The container has no redis/nats servers and no client libs, so the
transport is injected: ``client_factory() -> send(dest, fields) +
flush() + close()``. Tests inject a collector; production injects e.g.
``redis.Redis(...).pipeline()`` wrappers. The Spark-side contract —
partition iteration, routing resolution, idempotency fields, batch
chunking, retry/DLQ split — is the part that matters at scale and is
fully exercised.

Scale note: each partition holds ONE connection and pipelines rows;
executor-side fan-out means no driver bottleneck and no per-row
connection churn. Skewed routing keys only skew the *destination*
server, not the Spark stage.
"""

from __future__ import annotations

import json
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..envelope import idempotency_key


def _routed_payload(df: DataFrame, *, default_dest: str, value_col: str | None) -> DataFrame:
    value = (
        F.col(value_col)
        if value_col and value_col in df.columns
        else F.to_json(F.struct(*[F.col(c) for c in df.columns if c != "routing"]))
    )
    event_id = (
        F.col("event_id").cast("string")
        if "event_id" in df.columns
        else F.lit(None).cast("string")
    )
    return df.select(
        F.coalesce(F.col("routing.topic"), F.lit(default_dest)).alias("dest"),
        F.coalesce(F.col("routing.key"), idempotency_key()).alias("key"),
        value.alias("value"),
        idempotency_key().alias("idem"),
        F.to_json(F.col("routing.headers")).alias("headers_json"),
        event_id.alias("event_id"),
        F.col("routing.key").alias("routing_key"),
    )


def redis_xadd_fields(row) -> dict:
    """The reference's exact XADD field map (redis.rs:439-479):
    ``event_id`` + ``idempotency_key`` + ``df-event`` payload always;
    ``df-key`` only when non-empty; routing headers as ``df-headers``
    JSON when present."""
    fields = {
        "event_id": row["event_id"] or "",
        "idempotency_key": row["idem"],
        "df-event": row["value"],
    }
    # key cascade ends at event_id (redis.rs resolve_key), df-key only
    # when the result is non-empty
    key = row["routing_key"] or row["event_id"]
    if key:
        fields["df-key"] = key
    if row["headers_json"] and row["headers_json"] != "null":
        fields["df-headers"] = row["headers_json"]
    return fields


def _generic_fields(row) -> dict:
    return {
        "df-key": row["key"],
        "df-headers": row["headers_json"] or "{}",
        "idempotency_key": row["idem"],
        "payload": row["value"],
    }


def write_client_sink(
    df: DataFrame,
    client_factory: Callable[[], object],
    *,
    default_dest: str,
    value_col: str | None = "value",
    batch_size: int = 500,
    fields_fn: Callable[[object], dict] | None = None,
) -> None:
    """Generic partition-local writer. ``client_factory`` builds, per
    partition, an object with ``send(dest, fields: dict)``, ``flush()``,
    ``close()`` (the redis XADD / nats publish / http POST adapter).
    ``fields_fn`` picks the wire field layout (default: generic;
    ``redis_xadd_fields`` for reference-exact XADD parity)."""
    payload = _routed_payload(df, default_dest=default_dest, value_col=value_col)
    layout = fields_fn or _generic_fields

    def run(rows) -> None:
        client = client_factory()
        n = 0
        try:
            for row in rows:
                client.send(row["dest"], layout(row))
                n += 1
                if n % batch_size == 0:
                    client.flush()
            client.flush()
        finally:
            client.close()

    payload.foreachPartition(run)


def redis_stream_sink(df: DataFrame, *, url: str, stream_template: str = "deltaforge") -> None:
    """XADD to Redis Streams (requires redis-py at runtime). Field
    layout is reference-exact (``redis_xadd_fields``); sends pipeline
    per partition like the reference's execute_pipeline batch path."""

    def factory():
        import redis  # gated: not installed in this container

        conn = redis.Redis.from_url(url)
        pipe = conn.pipeline(transaction=False)

        class _C:
            def send(self, dest, fields):
                pipe.xadd(dest, fields)

            def flush(self):
                pipe.execute()

            def close(self):
                conn.close()

        return _C()

    write_client_sink(df, factory, default_dest=stream_template, fields_fn=redis_xadd_fields)


# ------------------------------------------------------------------ NATS


NATS_INVALID_SUBJECT = r"(^$)|[ *>]"


def invalid_nats_subject(col) -> "F.Column":
    """Column predicate mirroring nats.rs validate_nats_subject: empty
    or containing space / ``*`` / ``>`` wildcards is a routing error."""
    return col.isNull() | col.rlike(NATS_INVALID_SUBJECT)


def nats_jetstream_sink(
    df: DataFrame,
    client_factory: Callable[[], object],
    *,
    default_subject: str,
    value_col: str | None = "value",
    batch_size: int = 500,
    strict: bool = True,
) -> DataFrame | None:
    """JetStream publish with the reference's header contract
    (nats.rs:248-311): every message carries ``Nats-Msg-Id`` = the
    idempotency key (server-side dedup inside duplicate_window →
    effectively-once on replay), ``df-key`` only when a routing key
    resolved, plus routing headers verbatim. Subjects are validated
    before publish; ``strict=False`` returns the invalid-subject rows
    for DLQ handling instead of failing the batch.

    ``client_factory() -> send(subject, fields)`` receives
    ``{"headers": dict, "payload": str}``.
    """
    import re as _re

    subject = F.coalesce(F.col("routing.topic"), F.lit(default_subject))
    invalid_re = _re.compile(NATS_INVALID_SUBJECT)

    def nats_fields(row) -> dict:
        dest = row["dest"]
        if strict and (not dest or invalid_re.search(dest)):
            # send-time check, same point as nats.rs publish_single —
            # one pass over the data, no pre-validation job
            raise ValueError(f"invalid NATS subject {dest!r} (space/*/> or empty)")
        headers = {"Nats-Msg-Id": row["idem"]}
        # NATS has no native key — df-key header only when a routing key
        # actually resolved (nats.rs resolve_key returns None otherwise)
        if row["routing_key"]:
            headers["df-key"] = row["routing_key"]
        if row["headers_json"] and row["headers_json"] != "null":
            headers.update(json.loads(row["headers_json"]))
        return {"headers": headers, "payload": row["value"]}

    ok = df if strict else df.filter(~invalid_nats_subject(subject))
    write_client_sink(
        ok,
        client_factory,
        default_dest=default_subject,
        value_col=value_col,
        batch_size=batch_size,
        fields_fn=nats_fields,
    )
    return None if strict else df.filter(invalid_nats_subject(subject))


def http_webhook_sink(
    df: DataFrame,
    *,
    url_template: str,
    method: str = "POST",
    max_retries: int = 3,
    batch_mode: bool = False,
    batch_size: int = 500,
    session_factory=None,
) -> None:
    """HTTP sink (reference http.rs): per-event POST, or ``batch_mode``
    combining the chunk's payloads into ONE JSON-array request per
    resolved URL (http.rs:424-445) — the shape that matters at scale,
    since per-event HTTP round-trips cap throughput at connection
    latency. Dynamic URLs resolve from the routing template upstream
    (``routing.topic`` carries the resolved destination). 5xx/network
    errors retry with exponential backoff; 4xx raise immediately
    (non-retryable, DLQ-eligible upstream). ``session_factory`` injects
    the transport (tests: a recording fake; production: requests)."""

    def default_session():
        import requests  # gated: not in this container

        return requests.Session()

    mk_session = session_factory or default_session

    def factory():
        import json as _json

        from ..retry import Exhausted, RetryPolicy, retry_call

        sess = mk_session()
        # executor-side policy (retry.py mirrors common/retry.rs): 5xx is
        # transient → backoff; the policy object is per-client so backoff
        # state never leaks across partitions
        policy = RetryPolicy(
            initial=0.1, max=5.0, jitter=0.1, max_retries=max_retries + 1
        )

        def _request_with_retry(dest: str, body: str) -> None:
            def attempt_once(attempt: int):
                resp = sess.request(method, dest or url_template, data=body)
                if resp.status_code >= 500:
                    raise ConnectionError(f"server error {resp.status_code}")
                resp.raise_for_status()  # 4xx: non-retryable, DLQ upstream

            policy.reset()
            try:
                retry_call(
                    attempt_once,
                    is_retryable=lambda e: isinstance(e, ConnectionError),
                    policy=policy,
                    label="http_webhook",
                )
            except Exhausted as e:
                raise IOError(f"HTTP sink exhausted retries: {e.last_error}") from e

        class _C:
            def __init__(self):
                self.buf: dict[str, list[str]] = {}

            def send(self, dest, fields):
                if batch_mode:
                    self.buf.setdefault(dest, []).append(fields["payload"])
                else:
                    _request_with_retry(dest, fields["payload"])

            def flush(self):
                for dest, payloads in self.buf.items():
                    docs = []
                    for p in payloads:
                        try:
                            docs.append(_json.loads(p))
                        except ValueError:
                            docs.append(p)
                    _request_with_retry(dest, _json.dumps(docs))
                self.buf = {}

            def close(self):
                self.flush()
                sess.close()

        return _C()

    write_client_sink(df, factory, default_dest=url_template, batch_size=batch_size)


def urllib_session_factory():
    """Stdlib session for the HTTP sink (requests-shaped: ``request()``
    returning an object with ``status_code`` + ``raise_for_status``) —
    the default transport when the requests library is absent."""

    def factory():
        import urllib.error
        import urllib.request

        class _Resp:
            def __init__(self, status: int):
                self.status_code = status

            def raise_for_status(self):
                if self.status_code >= 400:
                    raise IOError(f"http {self.status_code}")

        class _Sess:
            def request(self, method, dest, data=None):
                req = urllib.request.Request(
                    dest,
                    data=data.encode() if isinstance(data, str) else data,
                    method=method,
                )
                try:
                    with urllib.request.urlopen(req, timeout=30) as r:
                        return _Resp(r.status)
                except urllib.error.HTTPError as e:
                    return _Resp(e.code)

            def close(self):
                pass

        return _Sess()

    return factory


def spool_sink_factory(spool_dir: str):
    """Test double standing in for a broker: each partition-local client
    appends ndjson lines to its own spool file (python workers are
    separate processes even in local mode, so a shared list would not
    survive the boundary — the filesystem does)."""

    def factory():
        import os
        import uuid

        os.makedirs(spool_dir, exist_ok=True)
        path = os.path.join(spool_dir, f"{os.getpid()}-{uuid.uuid4().hex}.ndjson")
        fh = open(path, "a")

        class _C:
            def send(self, dest, fields):
                fh.write(json.dumps({"dest": dest, **fields}) + "\n")

            def flush(self):
                fh.flush()

            def close(self):
                fh.close()

        return _C()

    return factory


def read_spool(spool_dir: str) -> list[dict]:
    import glob

    out = []
    for p in sorted(glob.glob(f"{spool_dir}/*.ndjson")):
        with open(p) as f:
            out.extend(json.loads(line) for line in f if line.strip())
    return out
