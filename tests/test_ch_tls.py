"""ClickHouse sink TLS option (reference ChTls, sinks_cfg.rs:308-317):
an HTTPS loopback server with a self-signed cert, inserts through
``http_ch_transport_factory(tls=...)`` — ca_file pinning, skip-verify,
and the untrusted-by-default failure mode."""

import json
import ssl
import threading
from datetime import datetime, timedelta, timezone

import pytest

cryptography = pytest.importorskip("cryptography")


@pytest.fixture(scope="module")
def certpair(tmp_path_factory):
    """Self-signed localhost cert + key (ephemeral, test-only)."""
    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, "localhost")])
    now = datetime.now(timezone.utc)
    cert = (
        x509.CertificateBuilder()
        .subject_name(name)
        .issuer_name(name)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now - timedelta(minutes=5))
        .not_valid_after(now + timedelta(hours=1))
        .add_extension(
            x509.SubjectAlternativeName(
                [x509.DNSName("localhost"), x509.DNSName("127.0.0.1")]
            ),
            critical=False,
        )
        .sign(key, hashes.SHA256())
    )
    d = tmp_path_factory.mktemp("chtls")
    cert_path = d / "cert.pem"
    key_path = d / "key.pem"
    cert_path.write_bytes(cert.public_bytes(serialization.Encoding.PEM))
    key_path.write_bytes(
        key.private_bytes(
            serialization.Encoding.PEM,
            serialization.PrivateFormat.TraditionalOpenSSL,
            serialization.NoEncryption(),
        )
    )
    return str(cert_path), str(key_path)


@pytest.fixture()
def https_ch_server(certpair):
    from http.server import BaseHTTPRequestHandler, HTTPServer

    cert_path, key_path = certpair
    state = {"ddl": [], "rows": [], "tokens": set()}
    lock = threading.Lock()

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n).decode()
            from urllib.parse import parse_qs, urlparse

            qs = parse_qs(urlparse(self.path).query)
            with lock:
                if "query" not in qs:
                    state["ddl"].append(body)
                else:
                    token = qs["insert_deduplication_token"][0]
                    if token not in state["tokens"]:
                        state["tokens"].add(token)
                        state["rows"].extend(
                            json.loads(l) for l in body.splitlines() if l.strip()
                        )
            self.send_response(200)
            self.send_header("Content-Length", "0")
            self.end_headers()

    srv = HTTPServer(("127.0.0.1", 0), H)
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(cert_path, key_path)
    srv.socket = ctx.wrap_socket(srv.socket, server_side=True)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield srv, state, cert_path
    srv.shutdown()


def _feed(spark):
    rows = [("c", 1000, None, (1, "a@x")), ("c", 1500, None, (2, "b@x"))]
    schema = (
        "op string, ts_ms long, before struct<id:long,email:string>, "
        "after struct<id:long,email:string>"
    )
    return spark.createDataFrame(rows, schema)


class TestChTls:
    def test_ca_file_pinned_insert(self, spark, https_ch_server):
        from deltaforge_spark.sinks.clickhouse import (
            clickhouse_rows,
            http_ch_transport_factory,
            write_clickhouse,
        )

        srv, state, cert_path = https_ch_server
        # hostname must match the cert SAN (localhost)
        url = f"https://localhost:{srv.server_port}"
        write_clickhouse(
            clickhouse_rows(_feed(spark), ["id", "email"]).coalesce(1),
            http_ch_transport_factory(url, tls={"ca_file": cert_path}),
            database="dl",
            table="users",
            mode="changelog",
            pk=["id"],
        )
        assert len(state["rows"]) == 2
        assert state["ddl"] and "`dl`.`users`" in state["ddl"][0]

    def test_insecure_skip_verify(self, spark, https_ch_server):
        from deltaforge_spark.sinks.clickhouse import (
            clickhouse_rows,
            http_ch_transport_factory,
            write_clickhouse,
        )

        srv, state, _ = https_ch_server
        url = f"https://127.0.0.1:{srv.server_port}"
        write_clickhouse(
            clickhouse_rows(_feed(spark), ["id", "email"]).coalesce(1),
            http_ch_transport_factory(url, tls={"insecure_skip_verify": True}),
            database="dl",
            table="users",
            mode="changelog",
            pk=["id"],
            auto_create=False,
        )
        assert len(state["rows"]) == 2

    def test_untrusted_cert_fails_loudly_without_tls_options(
        self, spark, https_ch_server
    ):
        """A self-signed endpoint with no ca_file/skip-verify must fail
        the job (never silently drop the batch)."""
        from deltaforge_spark.sinks.clickhouse import (
            clickhouse_rows,
            http_ch_transport_factory,
            write_clickhouse,
        )

        srv, _, _ = https_ch_server
        url = f"https://localhost:{srv.server_port}"
        with pytest.raises(Exception, match="(?i)certificate|ssl"):
            write_clickhouse(
                clickhouse_rows(_feed(spark), ["id", "email"]).coalesce(1),
                http_ch_transport_factory(url, tls={"enabled": True}),
                database="dl",
                table="users",
                mode="changelog",
                pk=["id"],
            )

    def test_spec_tls_block_reaches_transport(self):
        """YAML spec `tls:` block round-trips into resolve_transports
        (sinks_cfg.rs:339-341 parity)."""
        from deltaforge_spark.plans.refspec import parse_reference_spec
        from deltaforge_spark.plans.wiring import resolve_transports

        spec = {
            "metadata": {"name": "p"},
            "spec": {
                "source": {"type": "mysql", "config": {"tables": ["db.t"]}},
                "sinks": [
                    {
                        "type": "clickhouse",
                        "config": {
                            "id": "ch",
                            "url": "https://ch.example:8443",
                            "database": "dl",
                            "table": "t",
                            "tls": {
                                "enabled": True,
                                "ca_file": "/etc/ssl/private-ca.pem",
                                "insecure_skip_verify": False,
                            },
                        },
                    }
                ],
            },
        }
        ref = parse_reference_spec(spec)
        transports = resolve_transports(ref)
        assert "ch" in transports  # factory built without error
