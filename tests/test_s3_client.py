"""S3 client over a REAL loopback HTTP object store (sinks/s3client.py):
the server RE-DERIVES the SigV4 canonical request from the raw bytes on
the wire and recomputes the signature with the shared secret — mutual
verification that the canonicalization is right, not just
self-consistent. Multipart semantics enforced: parts invisible until
Complete (atomic visibility), Abort discards, replayed upload of the
same key overwrites idempotently (the lake's at-least-once
file-granularity contract on a real object store).
"""

import hashlib
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

import deltaforge_spark.sinks.s3client as s3

ACCESS, SECRET, REGION = "AKIDEXAMPLE", "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY", "us-east-1"


class S3State:
    def __init__(self):
        self.objects = {}     # (bucket, key) -> bytes
        self.uploads = {}     # upload_id -> {(part_no): bytes}
        self.upload_keys = {} # upload_id -> (bucket, key)
        self.next_upload = 0
        self.auth_failures = 0
        self.lock = threading.Lock()


def _make_handler(state: S3State):
    class H(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):
            pass

        def _verify_sig(self, body: bytes) -> bool:
            """Server-side SigV4: rebuild the canonical request from the
            RAW request line + headers, derive the key from the shared
            secret, compare signatures."""
            auth = self.headers.get("Authorization", "")
            if not auth.startswith("AWS4-HMAC-SHA256 "):
                return False
            fields = dict(
                kv.strip().split("=", 1) for kv in auth[17:].split(",")
            )
            cred = fields["Credential"].split("/")
            access, date, region = cred[0], cred[1], cred[2]
            if access != ACCESS:
                return False
            signed_headers = fields["SignedHeaders"].split(";")
            parsed = urllib.parse.urlparse(self.path)
            query = urllib.parse.parse_qsl(parsed.query, keep_blank_values=True)
            cq = "&".join(
                f"{urllib.parse.quote(k, safe='-_.~')}={urllib.parse.quote(v, safe='-_.~')}"
                for k, v in sorted(query)
            )
            lower = {}
            for name in signed_headers:
                v = self.headers.get(name)
                if v is None:
                    return False
                lower[name] = " ".join(v.split())
            ch = "".join(f"{k}:{lower[k]}\n" for k in sorted(lower))
            payload_hash = self.headers.get("x-amz-content-sha256", "")
            if hashlib.sha256(body).hexdigest() != payload_hash:
                return False
            cr = "\n".join([
                self.command,
                urllib.parse.quote(urllib.parse.unquote(parsed.path), safe="/-_.~"),
                cq, ch, ";".join(sorted(lower)), payload_hash,
            ])
            amz_date = self.headers["x-amz-date"]
            scope = f"{date}/{region}/s3/aws4_request"
            sts = "\n".join([
                "AWS4-HMAC-SHA256", amz_date, scope,
                hashlib.sha256(cr.encode()).hexdigest(),
            ])
            import hmac as _hmac

            expect = _hmac.new(
                s3.signing_key(SECRET, date, region), sts.encode(), hashlib.sha256
            ).hexdigest()
            return expect == fields["Signature"]

    # ------------------------------------------------------- routing

        def _respond(self, code, body=b"", headers=None):
            self.send_response(code)
            for k, v in (headers or {}).items():
                self.send_header(k, v)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _handle(self):
            n = int(self.headers.get("Content-Length", 0) or 0)
            body = self.rfile.read(n)
            if not self._verify_sig(body):
                with state.lock:
                    state.auth_failures += 1
                self._respond(403, b"<Error><Code>SignatureDoesNotMatch</Code></Error>")
                return
            parsed = urllib.parse.urlparse(self.path)
            qs = dict(urllib.parse.parse_qsl(parsed.query, keep_blank_values=True))
            # real S3 derives bucket/key from the DECODED path (the
            # client percent-encodes segments; 'tbl%3Da' names 'tbl=a')
            parts = urllib.parse.unquote(parsed.path).lstrip("/").split("/", 1)
            bucket = parts[0]
            key = parts[1] if len(parts) > 1 else ""
            with state.lock:
                if self.command == "PUT" and "partNumber" in qs:
                    uid = qs["uploadId"]
                    state.uploads[uid][int(qs["partNumber"])] = body
                    etag = hashlib.md5(body).hexdigest()
                    self._respond(200, headers={"ETag": f'"{etag}"'})
                elif self.command == "PUT":
                    state.objects[(bucket, key)] = body
                    self._respond(200, headers={"ETag": f'"{hashlib.md5(body).hexdigest()}"'})
                elif self.command == "POST" and "uploads" in qs:
                    state.next_upload += 1
                    uid = f"up-{state.next_upload}"
                    state.uploads[uid] = {}
                    state.upload_keys[uid] = (bucket, key)
                    self._respond(
                        200,
                        f"<InitiateMultipartUploadResult><UploadId>{uid}</UploadId>"
                        f"</InitiateMultipartUploadResult>".encode(),
                    )
                elif self.command == "POST" and "uploadId" in qs:
                    uid = qs["uploadId"]
                    if uid not in state.uploads:
                        self._respond(404, b"<Error><Code>NoSuchUpload</Code></Error>")
                        return
                    buf = b"".join(
                        state.uploads[uid][k] for k in sorted(state.uploads[uid])
                    )
                    state.objects[state.upload_keys[uid]] = buf
                    del state.uploads[uid]
                    self._respond(200, b"<CompleteMultipartUploadResult/>")
                elif self.command == "DELETE" and "uploadId" in qs:
                    state.uploads.pop(qs["uploadId"], None)
                    self._respond(204)
                elif self.command == "DELETE":
                    state.objects.pop((bucket, key), None)
                    self._respond(204)
                elif self.command == "GET" and key == "" and "list-type" in qs:
                    prefix = qs.get("prefix", "")
                    keys = sorted(
                        k for (b, k) in state.objects
                        if b == bucket and k.startswith(prefix)
                    )
                    xml = "<ListBucketResult>" + "".join(
                        f"<Contents><Key>{k}</Key></Contents>" for k in keys
                    ) + "</ListBucketResult>"
                    self._respond(200, xml.encode())
                elif self.command == "GET":
                    data = state.objects.get((bucket, key))
                    if data is None:
                        self._respond(404, b"<Error><Code>NoSuchKey</Code></Error>")
                    else:
                        self._respond(200, data)
                else:
                    self._respond(400, b"<Error><Code>BadRequest</Code></Error>")

        do_GET = do_PUT = do_POST = do_DELETE = _handle

    return H


@pytest.fixture()
def s3_server():
    state = S3State()
    srv = HTTPServer(("127.0.0.1", 0), _make_handler(state))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_port}", state
    srv.shutdown()


def _client(url):
    return s3.S3Client(url, access_key=ACCESS, secret_key=SECRET, region=REGION)


class TestSigV4:
    def test_put_get_round_trip_with_server_side_verification(self, s3_server):
        url, state = s3_server
        c = _client(url)
        etag = c.put_object("lake", "data/t=a/f1.parquet", b"hello parquet")
        assert etag == hashlib.md5(b"hello parquet").hexdigest()
        assert c.get_object("lake", "data/t=a/f1.parquet") == b"hello parquet"
        assert state.auth_failures == 0

    def test_wrong_secret_is_rejected(self, s3_server):
        url, state = s3_server
        bad = s3.S3Client(url, access_key=ACCESS, secret_key="WRONG", region=REGION)
        with pytest.raises(s3.S3Error) as ei:
            bad.put_object("lake", "k", b"x")
        assert ei.value.code == "SignatureDoesNotMatch"
        assert state.auth_failures == 1

    def test_tampered_payload_fails_content_hash(self, s3_server):
        # payload hash is signed: server recomputes sha256(body)
        url, state = s3_server
        c = _client(url)
        real_call = c._call

        def tamper(method, path, query=None, body=b"", headers=None):
            if method == "PUT" and body:
                # sign for one body, send another
                import urllib.error
                import urllib.request as ur

                host = urllib.parse.urlparse(c.endpoint).netloc
                hdrs = {"host": host}
                signed = s3.sign_request(
                    method, path, query or {}, hdrs, body,
                    access_key=ACCESS, secret_key=SECRET, region=REGION,
                    amz_date=c._amz_date(),
                )
                req = ur.Request(c.endpoint + path, data=body + b"!", method=method)
                for k, v in signed.items():
                    if k.lower() != "host":
                        req.add_header(k, v)
                with pytest.raises(urllib.error.HTTPError) as ei:
                    ur.urlopen(req, timeout=5)
                assert ei.value.code == 403
                return 403, {}, b""
            return real_call(method, path, query, body, headers)

        c._call = tamper
        c.put_object("lake", "k", b"payload")
        assert state.auth_failures == 1

    def test_query_params_are_signed(self, s3_server):
        url, _ = s3_server
        c = _client(url)
        c.put_object("lake", "a/1", b"x")
        c.put_object("lake", "a/2", b"y")
        c.put_object("lake", "b/1", b"z")
        assert c.list_keys("lake", prefix="a/") == ["a/1", "a/2"]


class TestMultipart:
    def test_parts_invisible_until_complete(self, s3_server):
        url, state = s3_server
        c = _client(url)
        uid = c.create_multipart("lake", "big.parquet")
        e1 = c.upload_part("lake", "big.parquet", uid, 1, b"A" * 100)
        e2 = c.upload_part("lake", "big.parquet", uid, 2, b"B" * 50)
        assert ("lake", "big.parquet") not in state.objects  # invisible
        c.complete_multipart("lake", "big.parquet", uid, [(1, e1), (2, e2)])
        assert c.get_object("lake", "big.parquet") == b"A" * 100 + b"B" * 50

    def test_abort_discards_parts(self, s3_server):
        url, state = s3_server
        c = _client(url)
        uid = c.create_multipart("lake", "dead.parquet")
        c.upload_part("lake", "dead.parquet", uid, 1, b"junk")
        c.abort_multipart("lake", "dead.parquet", uid)
        assert state.objects == {}
        assert state.uploads == {}

    def test_upload_file_multipart_and_replay_idempotence(self, s3_server, tmp_path):
        url, state = s3_server
        c = _client(url)
        p = tmp_path / "roll.parquet"
        blob = bytes(range(256)) * 2000  # 512 KB
        p.write_bytes(blob)
        c.upload_file(str(p), "lake", "data/t=a/f00001.parquet", part_size=100_000)
        assert c.get_object("lake", "data/t=a/f00001.parquet") == blob
        # crash-replay: the SAME deterministic key re-uploads → one object
        c.upload_file(str(p), "lake", "data/t=a/f00001.parquet", part_size=100_000)
        assert len(state.objects) == 1
        assert c.get_object("lake", "data/t=a/f00001.parquet") == blob

    def test_rolling_pool_ships_to_object_store(self, s3_server, tmp_path, spark):
        """The composed lake path: rolling pool writes atomic local
        files → each manifest entry ships to S3 under its own key →
        list_keys mirrors the manifest exactly (the reference's
        S3 sink shape, with the rename contract mapped to multipart
        Complete)."""
        url, state = s3_server
        from deltaforge_spark.sinks.rolling import RollingConfig, RollingLakeSink

        sink = RollingLakeSink(
            spark, str(tmp_path / "lake"), ["tbl"],
            cfg=RollingConfig(max_events=2, max_bytes=1 << 40,
                              max_age_ms=1 << 40, idle_age_ms=1 << 40),
            clock="event", ts_col="ts",
        )
        batch = spark.createDataFrame(
            [(i, "a" if i < 2 else "b", i) for i in range(4)], ["id", "tbl", "ts"]
        )
        sink.process_batch(batch, 0)
        assert len(sink.manifest) == 2
        c = _client(url)
        for m in sink.manifest:
            c.upload_file(f"{tmp_path}/lake/{m['file']}", "lake", m["file"])
        keys = c.list_keys("lake", prefix="data/")
        assert sorted(keys) == sorted(m["file"] for m in sink.manifest)
        # shipped bytes are the real parquet files
        for m in sink.manifest:
            local = open(f"{tmp_path}/lake/{m['file']}", "rb").read()
            assert c.get_object("lake", m["file"]) == local

    def test_failed_part_aborts_cleanly(self, s3_server, tmp_path):
        url, state = s3_server
        c = _client(url)
        p = tmp_path / "x.bin"
        p.write_bytes(b"Z" * 300_000)
        real = c.upload_part
        calls = {"n": 0}

        def flaky(bucket, key, uid, n, data):
            calls["n"] += 1
            if calls["n"] == 2:
                raise s3.S3Error("injected outage", status=500)
            return real(bucket, key, uid, n, data)

        c.upload_part = flaky
        with pytest.raises(s3.S3Error, match="outage"):
            c.upload_file(str(p), "lake", "x.bin", part_size=100_000)
        assert state.objects == {}   # nothing visible
        assert state.uploads == {}   # upload aborted, parts gone


class TestRollingSinkObjectStoreBackend:
    """VERDICT r5 #4: the S3 client COMPOSED under the rolling pool via
    the injectable object_store backend — rolls publish by
    multipart-upload→Complete instead of local rename, and the crash
    window between upload and manifest persist replays idempotently
    (deterministic keys: re-upload overwrites, never duplicates)."""

    def _sink(self, spark, tmp_path, url, store=None):
        from deltaforge_spark.checkpoints import MemCheckpointStore
        from deltaforge_spark.sinks.rolling import RollingConfig, RollingLakeSink
        from deltaforge_spark.sinks.s3client import S3LakeBackend

        backend = S3LakeBackend(_client(url), "lake", prefix="warehouse")
        sink = RollingLakeSink(
            spark, str(tmp_path / "scratch"), ["tbl"],
            cfg=RollingConfig(max_events=2, max_bytes=1 << 40,
                              max_age_ms=1 << 40, idle_age_ms=1 << 40),
            clock="event", ts_col="ts",
            store=store or MemCheckpointStore(),
            object_store=backend,
        )
        return sink, backend

    def test_rolls_publish_through_backend(self, s3_server, tmp_path, spark):
        url, state = s3_server
        sink, backend = self._sink(spark, tmp_path, url)
        batch = spark.createDataFrame(
            [(i, "a" if i < 2 else "b", i) for i in range(4)], ["id", "tbl", "ts"]
        )
        sink.process_batch(batch, 0)
        assert len(sink.manifest) == 2
        keys = backend.list("data/")
        assert sorted(keys) == sorted(m["file"] for m in sink.manifest)
        # no data files on the local path — scratch only
        import glob as g
        assert g.glob(f"{tmp_path}/scratch/data/**/*.parquet", recursive=True) == []
        # shipped bytes are readable parquet with the right rows
        import io
        import pyarrow.parquet as pq
        got = sorted(
            int(r["id"])
            for m in sink.manifest
            for r in pq.read_table(io.BytesIO(backend.get(m["file"]))).to_pylist()
        )
        assert got == [0, 1, 2, 3]

    def test_crash_between_upload_and_persist_is_idempotent(
        self, s3_server, tmp_path, spark
    ):
        """Kill after the object is visible but before the manifest/state
        persist: the replayed micro-batch re-rolls the same (pkey, seq),
        the re-upload overwrites the SAME key — file set identical, no
        duplicate objects, manifest single-entry."""
        from deltaforge_spark.checkpoints import MemCheckpointStore

        url, state = s3_server
        store = MemCheckpointStore()
        sink, backend = self._sink(spark, tmp_path, url, store=store)

        real_put = backend.put_file
        def crashing_put(local, key):
            real_put(local, key)
            raise RuntimeError("killed between upload and manifest persist")
        backend.put_file = crashing_put

        batch = spark.createDataFrame([(0, "a", 1), (1, "a", 2)], ["id", "tbl", "ts"])
        import pytest as _pytest
        with _pytest.raises(RuntimeError, match="killed"):
            sink.process_batch(batch, 0)
        assert sink.manifest == []           # crash before the commit point
        keys_after_crash = backend.list("data/")
        assert len(keys_after_crash) == 1    # ...but the object IS visible

        # restart: fresh sink resumes from the checkpoint store, replayed
        # foreachBatch delivers the same batch id
        backend.put_file = real_put
        sink2, backend2 = self._sink(spark, tmp_path, url, store=store)
        sink2.object_store = backend
        sink2.process_batch(batch, 0)
        assert [m["file"] for m in sink2.manifest] == keys_after_crash
        assert backend.list("data/") == keys_after_crash  # same single key
        # exactly the original rows once
        import io
        import pyarrow.parquet as pq
        rows = pq.read_table(
            io.BytesIO(backend.get(keys_after_crash[0]))
        ).to_pylist()
        assert sorted(int(r["id"]) for r in rows) == [0, 1]
