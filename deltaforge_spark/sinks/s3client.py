"""S3 REST client with AWS Signature Version 4 — the object-store half
of the lake sink (reference ships parquet/JSONL to S3/MinIO through the
AWS SDK; this speaks the public S3 REST protocol + SigV4 directly,
stdlib-only). Covers what the lake path needs:

- ``put_object`` / ``get_object`` / ``delete_object`` / ``list_keys``
- multipart upload (Create → UploadPart × N → Complete/Abort): the
  atomic-visibility primitive — parts are invisible until Complete,
  which is the rename-equivalent the rolling pool's contract maps to
  on a real object store (sink.rs:41-160)

SigV4 is implemented exactly per the public spec (canonical request →
string-to-sign → derived signing key → authorization header) and is
verified MUTUALLY in tests: the loopback server re-derives the
canonical request from the raw HTTP bytes on the wire and recomputes
the signature with the shared secret — a malformed canonicalization on
either side fails the round-trip.
"""

from __future__ import annotations

import datetime
import hashlib
import hmac
import urllib.error
import urllib.parse
import urllib.request
from typing import Any


class S3Error(RuntimeError):
    def __init__(self, message: str, *, status: int | None = None, code: str | None = None):
        super().__init__(message)
        self.status = status
        self.code = code


# ------------------------------------------------------------- sigv4


def _sha256_hex(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()


def _hmac(key: bytes, msg: str) -> bytes:
    return hmac.new(key, msg.encode(), hashlib.sha256).digest()


def signing_key(secret_key: str, date: str, region: str, service: str = "s3") -> bytes:
    """AWS4-HMAC-SHA256 key derivation chain."""
    k = _hmac(f"AWS4{secret_key}".encode(), date)
    k = _hmac(k, region)
    k = _hmac(k, service)
    return _hmac(k, "aws4_request")


def canonical_request(
    method: str,
    path: str,
    query: dict[str, str],
    headers: dict[str, str],
    payload_hash: str,
) -> tuple[str, str]:
    """(canonical request, signed-headers list). Query keys and header
    names sort; values are URI-encoded per the SigV4 rules."""
    cq = "&".join(
        f"{urllib.parse.quote(k, safe='-_.~')}={urllib.parse.quote(str(v), safe='-_.~')}"
        for k, v in sorted(query.items())
    )
    lower = {k.lower().strip(): " ".join(str(v).split()) for k, v in headers.items()}
    signed = ";".join(sorted(lower))
    ch = "".join(f"{k}:{lower[k]}\n" for k in sorted(lower))
    cr = "\n".join(
        [method, urllib.parse.quote(path, safe="/-_.~"), cq, ch, signed, payload_hash]
    )
    return cr, signed


def sign_request(
    method: str,
    path: str,
    query: dict[str, str],
    headers: dict[str, str],
    payload: bytes,
    *,
    access_key: str,
    secret_key: str,
    region: str,
    amz_date: str,
) -> dict[str, str]:
    """Returns the headers to send, Authorization included."""
    date = amz_date[:8]
    payload_hash = _sha256_hex(payload)
    headers = dict(headers)
    headers["x-amz-date"] = amz_date
    headers["x-amz-content-sha256"] = payload_hash
    cr, signed = canonical_request(method, path, query, headers, payload_hash)
    scope = f"{date}/{region}/s3/aws4_request"
    sts = "\n".join(["AWS4-HMAC-SHA256", amz_date, scope, _sha256_hex(cr.encode())])
    sig = hmac.new(
        signing_key(secret_key, date, region), sts.encode(), hashlib.sha256
    ).hexdigest()
    headers["Authorization"] = (
        f"AWS4-HMAC-SHA256 Credential={access_key}/{scope}, "
        f"SignedHeaders={signed}, Signature={sig}"
    )
    return headers


# ------------------------------------------------------------- client


class S3Client:
    def __init__(
        self,
        endpoint: str,
        *,
        access_key: str,
        secret_key: str,
        region: str = "us-east-1",
        timeout: float = 30.0,
        clock=None,
    ) -> None:
        self.endpoint = endpoint.rstrip("/")
        self.access_key = access_key
        self.secret_key = secret_key
        self.region = region
        self.timeout = timeout
        self._clock = clock  # injectable for deterministic tests

    def _amz_date(self) -> str:
        now = (
            self._clock() if self._clock
            else datetime.datetime.now(datetime.timezone.utc)
        )
        return now.strftime("%Y%m%dT%H%M%SZ")

    def _call(
        self,
        method: str,
        path: str,
        query: dict[str, str] | None = None,
        body: bytes = b"",
        headers: dict[str, str] | None = None,
    ) -> tuple[int, dict[str, str], bytes]:
        query = query or {}
        host = urllib.parse.urlparse(self.endpoint).netloc
        hdrs = dict(headers or {})
        hdrs["host"] = host
        signed = sign_request(
            method, path, query, hdrs, body,
            access_key=self.access_key, secret_key=self.secret_key,
            region=self.region, amz_date=self._amz_date(),
        )
        # The request URL must carry EXACTLY the bytes the signature
        # covers: path percent-encoded segmentwise with the SigV4 rules
        # (slashes preserved, '~' unreserved), query with the same
        # quote-based encoding as canonical_request. urlencode's
        # space→'+' and different reserved-char set would produce
        # SignatureDoesNotMatch on keys with spaces/special characters.
        url = self.endpoint + urllib.parse.quote(path, safe="/-_.~")
        if query:
            url += "?" + "&".join(
                f"{urllib.parse.quote(k, safe='-_.~')}="
                f"{urllib.parse.quote(str(v), safe='-_.~')}"
                for k, v in sorted(query.items())
            )
        req = urllib.request.Request(url, data=body or None, method=method)
        for k, v in signed.items():
            if k.lower() != "host":  # urllib sets Host itself
                req.add_header(k, v)
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return resp.status, dict(resp.headers), resp.read()
        except urllib.error.HTTPError as e:
            raw = e.read().decode(errors="replace")
            code = None
            if "<Code>" in raw:
                code = raw.split("<Code>", 1)[1].split("</Code>", 1)[0]
            raise S3Error(f"s3 {e.code}: {raw[:200]}", status=e.code, code=code) from e

    # ------------------------------------------------------- objects

    def put_object(self, bucket: str, key: str, data: bytes) -> str:
        status, headers, _ = self._call("PUT", f"/{bucket}/{key}", body=data)
        return headers.get("ETag", "").strip('"')

    def get_object(self, bucket: str, key: str) -> bytes:
        _, _, body = self._call("GET", f"/{bucket}/{key}")
        return body

    def delete_object(self, bucket: str, key: str) -> None:
        self._call("DELETE", f"/{bucket}/{key}")

    def list_keys(self, bucket: str, prefix: str = "") -> list[str]:
        _, _, body = self._call(
            "GET", f"/{bucket}", {"list-type": "2", "prefix": prefix}
        )
        text = body.decode()
        return [
            part.split("</Key>", 1)[0]
            for part in text.split("<Key>")[1:]
        ]

    # ----------------------------------------------------- multipart

    def create_multipart(self, bucket: str, key: str) -> str:
        _, _, body = self._call("POST", f"/{bucket}/{key}", {"uploads": ""})
        text = body.decode()
        return text.split("<UploadId>", 1)[1].split("</UploadId>", 1)[0]

    def upload_part(
        self, bucket: str, key: str, upload_id: str, part_number: int, data: bytes
    ) -> str:
        _, headers, _ = self._call(
            "PUT", f"/{bucket}/{key}",
            {"partNumber": str(part_number), "uploadId": upload_id},
            body=data,
        )
        return headers.get("ETag", "").strip('"')

    def complete_multipart(
        self, bucket: str, key: str, upload_id: str, parts: list[tuple[int, str]]
    ) -> None:
        xml = "<CompleteMultipartUpload>" + "".join(
            f"<Part><PartNumber>{n}</PartNumber><ETag>\"{etag}\"</ETag></Part>"
            for n, etag in sorted(parts)
        ) + "</CompleteMultipartUpload>"
        self._call("POST", f"/{bucket}/{key}", {"uploadId": upload_id}, xml.encode())

    def abort_multipart(self, bucket: str, key: str, upload_id: str) -> None:
        self._call("DELETE", f"/{bucket}/{key}", {"uploadId": upload_id})

    # ------------------------------------------------------- helpers

    def upload_file(
        self, local_path: str, bucket: str, key: str, *, part_size: int = 8 * 1024 * 1024
    ) -> None:
        """The lake-shipping primitive: small files PUT directly;
        larger ones go multipart so the object appears ATOMICALLY at
        Complete — a crash mid-upload leaves only invisible parts
        (abort or lifecycle-expire them), never a torn object. This is
        the object-store equivalent of the rolling pool's
        write-to-temp-then-rename contract."""
        import os

        size = os.path.getsize(local_path)
        with open(local_path, "rb") as f:
            if size <= part_size:
                self.put_object(bucket, key, f.read())
                return
            upload_id = self.create_multipart(bucket, key)
            try:
                parts = []
                n = 1
                while True:
                    chunk = f.read(part_size)
                    if not chunk:
                        break
                    parts.append((n, self.upload_part(bucket, key, upload_id, n, chunk)))
                    n += 1
                self.complete_multipart(bucket, key, upload_id, parts)
            except Exception:
                self.abort_multipart(bucket, key, upload_id)
                raise


class S3LakeBackend:
    """``RollingLakeSink`` object-store backend (VERDICT r5 #4): the
    roll's rename-into-place maps to ``upload_file`` — PUT for small
    files, multipart Create→Parts→Complete for large ones, so the data
    file appears ATOMICALLY at Complete (reference s3/sink.rs:41-160).
    The sink's deterministic per-(partition, seq) file names make a
    replayed upload overwrite the SAME object: crash windows between
    upload and manifest persist re-publish idempotently instead of
    duplicating files."""

    def __init__(
        self,
        client: S3Client,
        bucket: str,
        *,
        prefix: str = "",
        part_size: int = 8 * 1024 * 1024,
    ) -> None:
        self.client = client
        self.bucket = bucket
        self.prefix = prefix.strip("/")
        self.part_size = part_size

    def _key(self, key: str) -> str:
        return f"{self.prefix}/{key}" if self.prefix else key

    def put_file(self, local_path: str, key: str) -> None:
        self.client.upload_file(
            local_path, self.bucket, self._key(key), part_size=self.part_size
        )

    # ------------------------------------------------- reader helpers

    def list(self, prefix: str = "") -> list[str]:
        keys = self.client.list_keys(self.bucket, self._key(prefix))
        drop = len(self.prefix) + 1 if self.prefix else 0
        return [k[drop:] for k in keys]

    def get(self, key: str) -> bytes:
        return self.client.get_object(self.bucket, self._key(key))
