"""Wire-transport resolution for reference specs: a user's YAML names
its broker endpoints (``brokers:``, ``url:``, ``servers:``); this
module turns those into the REAL protocol clients
(sinks/resp.py, sinks/natsclient.py, sinks/clickhouse.py HTTP,
sinks/kafkawire.py) so ``compile_reference_pipeline(ref,
transports=resolve_transports(ref))`` runs a reference pipeline
against live services with no injected fakes — the last mile of "a
reference user switches repos and runs the same spec".

Explicitly resolved per sink id; sinks whose config carries no
endpoint are left for the caller to inject (the test-double path
stays available).
"""

from __future__ import annotations

import json
import urllib.parse
from typing import Any


def _host_port(url: str, default_port: int) -> tuple[str, int]:
    if "//" not in url:
        url = "//" + url
    p = urllib.parse.urlparse(url)
    return p.hostname or "127.0.0.1", p.port or default_port


def _nats_adapter_factory(host: str, port: int):
    """Adapts the generic field layout the spec compiler emits
    (df-key / df-headers / idempotency_key / payload) onto the NATS
    header contract (Nats-Msg-Id etc.) over the wire client."""
    from ..sinks.natsclient import nats_hpub_client_factory

    base = nats_hpub_client_factory(host, port)

    def factory():
        inner = base()

        class _C:
            def send(self, dest, fields):
                if "headers" in fields:  # already nats-shaped
                    inner.send(dest, fields)
                    return
                headers = {"Nats-Msg-Id": fields["idempotency_key"]}
                if fields.get("df-key"):
                    headers["df-key"] = fields["df-key"]
                hj = fields.get("df-headers")
                if hj and hj not in ("{}", "null"):
                    try:
                        headers.update(json.loads(hj))
                    except ValueError:
                        pass
                inner.send(dest, {"headers": headers, "payload": fields["payload"]})

            def flush(self):
                inner.flush()

            def close(self):
                inner.close()

        return _C()

    return factory


def resolve_transports(ref) -> dict[str, Any]:
    """RefPipeline → {sink_id: transport} for every sink whose config
    names an endpoint. Kafka EOS resolves inside the compiler (the
    ``transport: wire`` + ``bootstrap`` config path); everything here
    covers the injected-transport sinks."""
    out: dict[str, Any] = {}
    for rs in ref.sinks:
        cfg = rs.config or {}
        if rs.kind == "redis" and cfg.get("url"):
            from ..sinks.resp import resp_xadd_client_factory

            host, port = _host_port(str(cfg["url"]), 6379)
            out[rs.id] = resp_xadd_client_factory(host, port)
        elif rs.kind == "nats" and (cfg.get("servers") or cfg.get("url")):
            url = cfg.get("servers") or cfg.get("url")
            if isinstance(url, list):
                url = url[0]
            host, port = _host_port(str(url), 4222)
            out[rs.id] = _nats_adapter_factory(host, port)
        elif rs.kind == "clickhouse" and cfg.get("url"):
            from ..sinks.clickhouse import http_ch_transport_factory

            out[rs.id] = http_ch_transport_factory(
                str(cfg["url"]),
                user=cfg.get("user"),
                password=cfg.get("password"),
                # reference ChTls (sinks_cfg.rs:308-317): {enabled,
                # ca_file, insecure_skip_verify} for https:// endpoints
                tls=cfg.get("tls"),
            )
        elif rs.kind == "http":
            from ..sinks.clients import urllib_session_factory

            out[rs.id] = urllib_session_factory()
        elif rs.kind == "kafka" and cfg.get("spool_dir"):
            # brokerless file-spool delivery: the transport IS the
            # spool path (compiler.py `spool_dir` → file_broker
            # producers) — lets a YAML spec run the full EOS path
            # where no broker exists
            out[rs.id] = str(cfg["spool_dir"])
    return out
