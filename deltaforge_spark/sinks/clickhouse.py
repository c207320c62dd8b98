"""ClickHouse sink: auto-DDL generation, changelog/upsert projection,
partition-local writer with insert dedup tokens.

Re-expresses the reference's ClickHouse sink (reference:
crates/sinks/src/clickhouse/ddl.rs:6-67 — ``CREATE TABLE IF NOT
EXISTS`` with user columns + meta ``_op/_version/_deleted/_source_ts``,
engine per mode: upsert → ``ReplacingMergeTree(_version, _deleted)
ORDER BY (pk…)``, changelog → ``MergeTree ORDER BY (pk…, _version)``,
empty pk → ``tuple()``; types.rs:34-105 source-type → ClickHouse type
mapping; version.rs:11-37 — monotonic UInt64 ``_version`` from the PG
LSN (``X/Y`` hex pair → ``(X<<32)|Y``) falling back to ``ts_ms``;
sink.rs:81-91 auto-create-once + batched insert with a deduplication
token).

Spark mapping:
- the type mapping starts from the envelope's *Spark* schema (the
  source-DDL → engine-type step already happened in
  functions/typerules.py, e.g. unsigned bigint → string), so
  ``map_spark_type`` mirrors types.rs over Spark types.
- DDL generation is driver-side control plane (one statement per
  pipeline, sink.rs table_ensured semantics).
- the insert is partition-parallel through an injected transport (no
  ClickHouse server in this container — same pattern as clients.py):
  one connection per partition, rows serialized as JSONEachRow lines
  (a real transport would speak RowBinary; the wire format is the
  transport's concern, the batching/dedup-token contract is Spark's),
  one insert per chunk with a deterministic dedup token
  ``{db}.{table}:{batch_id}:{partition}:{chunk}`` so a replayed
  micro-batch's identical inserts are no-ops server-side — the
  reference's replay story (sink.rs dedup token) and the piece that
  makes at-least-once delivery exactly-once-visible in ClickHouse.

Scale shape: DDL once; inserts never funnel through the driver; chunked
inserts bound per-request memory; the dedup token is content-free
(position-derived) so replays dedup without hashing row data.
"""

from __future__ import annotations

import json
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


# --------------------------------------------------------------- type mapping


def map_spark_type(dt: T.DataType) -> str:
    """Spark type → ClickHouse DDL type (reference types.rs:34-60 with
    the MySQL/PG source types already normalized into Spark types)."""
    if isinstance(dt, T.BooleanType):
        return "UInt8"  # reference maps Bool → UInt8 in DDL (types.rs:101)
    if isinstance(dt, T.ByteType):
        return "UInt8"
    if isinstance(dt, T.ShortType):
        return "Int16"
    if isinstance(dt, (T.IntegerType,)):
        return "Int32"
    if isinstance(dt, T.LongType):
        return "Int64"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "Float64"
    if isinstance(dt, T.DecimalType):
        return f"Decimal({dt.precision}, {dt.scale})"
    if isinstance(dt, (T.DateType, T.TimestampType, T.TimestampNTZType)):
        return "DateTime64(3)"
    # varchar/text/json/uuid/enum/arrays/structs → String (JSON as text, v1)
    return "String"


def create_table_ddl(
    db: str,
    table: str,
    schema: T.StructType,
    pk: list[str],
    mode: str,
) -> str:
    """``CREATE TABLE IF NOT EXISTS`` for the target table: user columns
    (declared order) then meta columns, engine from the mode
    (ddl.rs:17-52)."""
    assert mode in ("upsert", "changelog")
    lines = []
    for f in schema.fields:
        t = map_spark_type(f.dataType)
        if f.nullable:
            t = f"Nullable({t})"
        lines.append(f"  `{f.name}` {t}")
    lines.append("  `_op` LowCardinality(String)")
    lines.append("  `_version` UInt64")
    lines.append("  `_deleted` UInt8")
    lines.append("  `_source_ts` DateTime64(3)")

    keys = [f"`{k}`" for k in pk]
    if mode == "upsert":
        engine = "ReplacingMergeTree(_version, _deleted)"
    else:
        engine = "MergeTree"
        keys.append("`_version`")
    order_by = f"({', '.join(keys)})" if keys else "tuple()"
    cols = ",\n".join(lines)
    return (
        f"CREATE TABLE IF NOT EXISTS `{db}`.`{table}` (\n{cols}\n"
        f") ENGINE = {engine} ORDER BY {order_by}"
    )


# ------------------------------------------------------------------- version


def lsn_to_u64(lsn: Column) -> Column:
    """PG LSN ``X/Y`` (hex/hex) → ordering-preserving long:
    high 32 bits = X, low 32 = Y (version.rs:12-18). Non-LSN strings →
    NULL (callers coalesce to ts_ms)."""
    valid = lsn.rlike("^[0-9a-fA-F]+/[0-9a-fA-F]+$")
    parts = F.split(lsn, "/")
    hi = F.conv(parts[0], 16, 10).cast("long")
    lo = F.conv(parts[1], 16, 10).cast("long")
    return F.when(valid, F.shiftleft(hi, 32) + lo)


def derive_version(ts_ms: Column, lsn: Column | None = None) -> Column:
    """Monotonic ``_version`` for ReplacingMergeTree replacement: the
    source position when parseable, else the event timestamp
    (version.rs:25-37)."""
    v = F.greatest(ts_ms.cast("long"), F.lit(0))
    if lsn is not None:
        v = F.coalesce(lsn_to_u64(lsn), v)
    return v


# ---------------------------------------------------------------- projection


def clickhouse_rows(
    df: DataFrame,
    user_cols: list[str],
    *,
    lsn: Column | None = None,
) -> DataFrame:
    """Changelog projection: user columns (after-image; before-image for
    deletes) + ``_op/_version/_deleted/_source_ts`` meta columns
    (reference clickhouse/project.rs row shape, sink.rs:123-140)."""
    img = lambda c: F.coalesce(F.col(f"after.{c}"), F.col(f"before.{c}"))  # noqa: E731
    return df.select(
        *[img(c).alias(c) for c in user_cols],
        F.col("op").alias("_op"),
        derive_version(F.col("ts_ms"), lsn).alias("_version"),
        (F.col("op") == "d").cast("int").alias("_deleted"),
        F.timestamp_millis(F.col("ts_ms")).alias("_source_ts"),
    )


def clickhouse_rows_with_dlq(
    df: DataFrame,
    user_cols: list[str],
    *,
    required: list[str],
    lsn: Column | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Per-row projection-failure isolation (reference sink.rs:124-173,
    project.rs tests `projects_batch_isolates_bad_row...`): a row whose
    ``required`` columns project to NULL (no usable image — the Spark
    analog of a RowBinary encode error) goes to a DLQ frame with
    event provenance instead of failing the batch; clean rows keep
    flowing to the insert. Returns (ok_rows, failed_events)."""
    img = lambda c: F.coalesce(F.col(f"after.{c}"), F.col(f"before.{c}"))  # noqa: E731
    proj = df.select(
        *[img(c).alias(c) for c in user_cols],
        F.col("op").alias("_op"),
        derive_version(F.col("ts_ms"), lsn).alias("_version"),
        (F.col("op") == "d").cast("int").alias("_deleted"),
        F.timestamp_millis(F.col("ts_ms")).alias("_source_ts"),
        F.col("event_id").alias("_event_id"),
    )
    bad = None
    for c in required:
        miss = F.col(c).isNull()
        bad = miss if bad is None else (bad | miss)
    bad = bad if bad is not None else F.lit(False)
    ok = proj.filter(~bad).drop("_event_id")
    failed = proj.filter(bad).select(
        F.col("_event_id").alias("event_id"),
        F.concat_ws(
            ",", *[F.when(F.col(c).isNull(), F.lit(c)) for c in required]
        ).alias("missing_columns"),
        F.lit("serialization").alias("error_kind"),
    )
    return ok, failed


def encode_dlq_ddl(database: str, table: str) -> str:
    """DDL for the per-row encode-failure side table (`encode_errors=
    "dlq"`): the reference sink's per-row isolation contract lands the
    bad row's JSON rendering + the type error next to the target table
    instead of failing the batch."""
    return (
        f"CREATE TABLE IF NOT EXISTS {database}.{table}__encode_dlq "
        "(payload String, error String, _ingest_ts DateTime64(3) DEFAULT now64(3)) "
        "ENGINE = MergeTree ORDER BY tuple()"
    )


# -------------------------------------------------------------------- writer


def table_layout(schema: T.StructType) -> list[tuple[str, str]]:
    """The projected frame's (column, ClickHouse DDL type) pairs in
    table order — the single source of truth shared by
    ``create_table_ddl`` and the RowBinary body encoder, so the
    positional RowBinary contract (body columns = table DDL order,
    client.rs:127 inserts without a column list) holds by
    construction. Meta columns are pinned to the DDL's non-null types;
    user columns take Spark nullability."""
    meta_types = {
        "_op": "LowCardinality(String)",
        "_version": "UInt64",
        "_deleted": "UInt8",
        "_source_ts": "DateTime64(3)",
    }
    out: list[tuple[str, str]] = []
    for f in schema.fields:
        if f.name in meta_types:
            out.append((f.name, meta_types[f.name]))
        else:
            t = map_spark_type(f.dataType)
            out.append((f.name, f"Nullable({t})" if f.nullable else t))
    return out


def write_clickhouse(
    df: DataFrame,
    transport_factory: Callable[[], object],
    *,
    database: str,
    table: str,
    mode: str = "changelog",
    pk: list[str] | None = None,
    auto_create: bool = True,
    batch_id: int = 0,
    insert_chunk_rows: int = 10000,
    wire_format: str = "jsoneachrow",
    encode_errors: str = "raise",
) -> str | None:
    """Write a projected changelog DataFrame (``clickhouse_rows`` shape)
    to ClickHouse through an injected transport with
    ``execute_ddl(sql)``, ``insert(db, table, lines, dedup_token)``
    (and, for ``wire_format="rowbinary"``,
    ``insert_rowbinary(db, table, body, dedup_token)``), ``close()``.

    ``wire_format``: ``"jsoneachrow"`` serializes JVM-side via
    ``to_json`` (semantically equivalent public interface);
    ``"rowbinary"`` encodes the reference's wire format
    (ch_rowbinary.py, reference rowbinary.rs) partition-locally —
    materially cheaper server-side for wide rows, and the format the
    reference sink actually speaks.

    ``encode_errors`` (rowbinary only): ``"raise"`` aborts the task on
    the first :class:`~.ch_rowbinary.ChEncodeError` (use when the
    projected schema provably makes encode errors impossible, e.g.
    after ``clickhouse_rows_with_dlq`` pre-cleaning); ``"dlq"``
    isolates each failing row — the reference sink's contract
    (reference sink.rs: per-row encode failures go to the DLQ, the
    good rows still insert) — by posting it as a JSON payload +
    error line to ``{table}__encode_dlq`` through the same transport,
    never losing the rest of the chunk. The DLQ table is auto-created
    alongside the main table when ``auto_create``.

    Returns the DDL that was issued (None when auto_create=False) so
    callers/tests can assert the control-plane step."""
    assert wire_format in ("jsoneachrow", "rowbinary")
    assert encode_errors in ("raise", "dlq")
    pk = pk or []
    meta = {"_op", "_version", "_deleted", "_source_ts"}
    user_schema = T.StructType([f for f in df.schema.fields if f.name not in meta])

    ddl = None
    if auto_create:
        ddl = create_table_ddl(database, table, user_schema, pk, mode)
        t = transport_factory()
        try:
            t.execute_ddl(ddl)
            if wire_format == "rowbinary" and encode_errors == "dlq":
                t.execute_ddl(encode_dlq_ddl(database, table))
        finally:
            t.close()

    if wire_format == "rowbinary":
        from .ch_rowbinary import ChEncodeError, encode_row, layout_from_ddl_types

        layout = layout_from_ddl_types(table_layout(df.schema))
        n_cols = len(layout)
        col_names = [c for c, _ in table_layout(df.schema)]
        isolate = encode_errors == "dlq"
        payload_rb = df.withColumn("_pid", F.spark_partition_id())

        def run_rb(rows) -> None:
            import json as _json

            t = transport_factory()
            try:
                buf = bytearray()
                n = 0
                pid = None
                chunk = 0
                dlq_chunk = 0
                dlq_lines: list[str] = []
                for row in rows:
                    pid = row[n_cols] if pid is None else pid
                    mark = len(buf)
                    try:
                        encode_row(buf, layout, tuple(row)[:n_cols])
                    except ChEncodeError as e:
                        if not isolate:
                            raise
                        # drop the partial row bytes; good rows in the
                        # buffer (and after) are unaffected
                        del buf[mark:]
                        dlq_lines.append(
                            _json.dumps(
                                {
                                    "payload": _json.dumps(
                                        dict(zip(col_names, tuple(row)[:n_cols])),
                                        default=str,
                                        sort_keys=True,
                                    ),
                                    "error": str(e),
                                },
                                sort_keys=True,
                            )
                        )
                        # flush DLQ lines on the same chunk cadence as
                        # good rows — an all-bad partition must not
                        # buffer itself into one partition-sized insert
                        if len(dlq_lines) >= insert_chunk_rows:
                            token = (
                                f"{database}.{table}:{batch_id}:{pid}:dlq:{dlq_chunk}"
                            )
                            t.insert(
                                database, f"{table}__encode_dlq", dlq_lines, token
                            )
                            dlq_lines, dlq_chunk = [], dlq_chunk + 1
                        continue
                    n += 1
                    if n >= insert_chunk_rows:
                        token = f"{database}.{table}:{batch_id}:{pid}:{chunk}"
                        t.insert_rowbinary(database, table, bytes(buf), token)
                        buf, n, chunk = bytearray(), 0, chunk + 1
                if n:
                    token = f"{database}.{table}:{batch_id}:{pid}:{chunk}"
                    t.insert_rowbinary(database, table, bytes(buf), token)
                if dlq_lines:
                    token = f"{database}.{table}:{batch_id}:{pid}:dlq:{dlq_chunk}"
                    t.insert(database, f"{table}__encode_dlq", dlq_lines, token)
            finally:
                t.close()

        payload_rb.foreachPartition(run_rb)
        return ddl

    payload = df.select(
        F.to_json(F.struct(*df.columns)).alias("line"),
        F.spark_partition_id().alias("_pid"),
    )

    def run(rows) -> None:
        t = transport_factory()
        try:
            buf: list[str] = []
            pid = None
            chunk = 0
            for row in rows:
                pid = row["_pid"] if pid is None else pid
                buf.append(row["line"])
                if len(buf) >= insert_chunk_rows:
                    token = f"{database}.{table}:{batch_id}:{pid}:{chunk}"
                    t.insert(database, table, buf, token)
                    buf, chunk = [], chunk + 1
            if buf:
                token = f"{database}.{table}:{batch_id}:{pid}:{chunk}"
                t.insert(database, table, buf, token)
        finally:
            t.close()

    payload.foreachPartition(run)
    return ddl


def http_ch_transport_factory(
    base_url: str,
    *,
    user: str | None = None,
    password: str | None = None,
    timeout: float = 30.0,
    tls: dict | None = None,
):
    """REAL transport over ClickHouse's public HTTP interface: DDL as a
    plain POST body, inserts as ``INSERT INTO db.table FORMAT
    JSONEachRow`` (or ``FORMAT RowBinary`` via ``insert_rowbinary``)
    with the dedup token passed through the
    ``insert_deduplication_token`` setting — the replay-idempotence
    mechanism the chunk tokens in ``write_clickhouse`` exist for
    (reference clickhouse sink's insert dedup contract). Stdlib urllib,
    one connection context per request; partition-local factories keep
    executor fan-out (no driver hop).

    ``tls`` (reference ChTls, sinks_cfg.rs:308-317): for ``https://``
    endpoints — ``{"enabled": bool (default True), "ca_file": path |
    None, "insecure_skip_verify": bool}``. ``ca_file`` pins a private
    CA; ``insecure_skip_verify`` disables chain+hostname checks (test
    rigs only). ``enabled: False`` explicitly turns the option block
    off (the reference's serde default when the block is present)."""
    def factory():
        # imports INSIDE the factory: the closure crosses the pickle
        # boundary to executor workers, where submodule imports must
        # re-run (a captured top-level `urllib` arrives without
        # urllib.request loaded)
        import urllib.error
        import urllib.parse
        import urllib.request

        ctx = None
        if tls and tls.get("enabled", True):
            import ssl

            ctx = ssl.create_default_context(cafile=tls.get("ca_file"))
            if tls.get("insecure_skip_verify"):
                ctx.check_hostname = False
                ctx.verify_mode = ssl.CERT_NONE

        class _T:
            def _post(self, params: dict[str, str], body: str | bytes) -> None:
                url = base_url.rstrip("/") + "/?" + urllib.parse.urlencode(params)
                data = body.encode() if isinstance(body, str) else body
                req = urllib.request.Request(url, data=data, method="POST")
                if user:
                    import base64

                    tok = base64.b64encode(f"{user}:{password or ''}".encode()).decode()
                    req.add_header("Authorization", f"Basic {tok}")
                try:
                    with urllib.request.urlopen(req, timeout=timeout, context=ctx) as resp:
                        resp.read()
                except urllib.error.HTTPError as e:
                    raise IOError(
                        f"clickhouse http {e.code}: {e.read().decode(errors='replace')[:200]}"
                    ) from e

            def execute_ddl(self, sql: str) -> None:
                self._post({}, sql)

            def insert(self, db: str, table: str, lines: list[str], dedup_token: str) -> None:
                self._post(
                    {
                        "query": f"INSERT INTO {db}.{table} FORMAT JSONEachRow",
                        "insert_deduplication_token": dedup_token,
                    },
                    "\n".join(lines) + "\n",
                )

            def insert_rowbinary(
                self, db: str, table: str, body: bytes, dedup_token: str
            ) -> None:
                # the reference's insert form (client.rs:127): positional
                # columns in table-DDL order, no column list
                self._post(
                    {
                        "query": f"INSERT INTO {db}.{table} FORMAT RowBinary",
                        "insert_deduplication_token": dedup_token,
                    },
                    body,
                )

            def close(self) -> None:
                pass

        return _T()

    return factory


# --------------------------------------------------------------- test double


def file_ch_transport_factory(state_dir: str):
    """Filesystem stand-in for a ClickHouse HTTP client: DDL statements
    append to ``ddl.sql``; inserts land one file per dedup token —
    a replayed insert with a token already present is a no-op, exactly
    the server's insert_deduplication_token behavior."""

    def factory():
        import os

        class _T:
            def execute_ddl(self, sql: str) -> None:
                os.makedirs(state_dir, exist_ok=True)
                with open(os.path.join(state_dir, "ddl.sql"), "a") as f:
                    f.write(sql + ";\n")

            def insert(self, db: str, tbl: str, lines: list[str], token: str) -> None:
                d = os.path.join(state_dir, "inserts")
                os.makedirs(d, exist_ok=True)
                safe = token.replace("/", "_").replace(":", "_")
                path = os.path.join(d, f"{safe}.ndjson")
                if os.path.exists(path):  # dedup token replay → no-op
                    return
                tmp = f"{path}.tmp"
                with open(tmp, "w") as f:
                    f.write("\n".join(lines) + "\n")
                os.replace(tmp, path)

            def close(self) -> None:
                pass

        return _T()

    return factory


def read_ch_rows(state_dir: str) -> list[dict]:
    import glob
    import os

    out = []
    for p in sorted(glob.glob(os.path.join(state_dir, "inserts", "*.ndjson"))):
        with open(p) as f:
            out.extend(json.loads(line) for line in f if line.strip())
    return out
