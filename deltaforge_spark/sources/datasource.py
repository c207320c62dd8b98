"""Spark-native custom data sources (PySpark 4 Python DataSource API):
the binlog archive as a first-class ``spark.read.format(...)`` /
``readStream.format(...)`` source — the idiomatic front door to the
wire decoders, replacing hand-rolled "list files → mapInPandas" call
sites with Catalyst-visible sources that partition, prune, and stream
with offsets like any built-in format.

- ``binlog_segments`` (``BinlogSegmentsDataSource``): a directory of
  MySQL binlog segment files.
  - Batch: one input partition PER SEGMENT FILE (the natural parallel
    unit — TABLE_MAP/GTID state is sequential only within a file), so
    a 100 TB archive fans out to #files tasks with zero shuffle and no
    driver decode.
  - Streaming: a ``SimpleDataSourceStreamReader`` whose offset is the
    count of committed files in sorted order — each micro-batch decodes
    exactly the newly arrived segments; replay of an uncommitted batch
    re-reads the same file range (at-least-once, the idempotence keys
    downstream absorb it).

Rows use the same column contract as ``decode_binlog_segments``
(ts_sec/server_id/db/table/op/xid/gtid_sid/gno/log_pos/before/after/
segment/decode_error), so every downstream operator (changefeed
assembly, filters, envelopes) composes unchanged.

Options:
  path              directory containing ``*.binlog`` segment files
  columns_json      optional {"db.table": [col, ...]} name mapping
  suffix            file suffix filter (default ``.binlog``)
"""

from __future__ import annotations

import json
import os
from typing import Any, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

BINLOG_DDL = (
    "ts_sec long, server_id long, db string, table string, op string, "
    "xid long, gtid_sid string, gno long, log_pos long, "
    "before string, after string, segment string, decode_error string"
)


def _columns_of(options: dict) -> dict[tuple[str, str], list[str]] | None:
    raw = options.get("columns_json")
    if not raw:
        return None
    out: dict[tuple[str, str], list[str]] = {}
    for key, cols in json.loads(raw).items():
        db, table = key.split(".", 1)
        out[(db, table)] = list(cols)
    return out


def _list_segments(path: str, suffix: str) -> list[str]:
    try:
        names = sorted(n for n in os.listdir(path) if n.endswith(suffix))
    except FileNotFoundError:
        return []
    return [os.path.join(path, n) for n in names]


def _decode_file(path: str, columns) -> Iterator[tuple]:
    # worker-side import: the DataSource class is pickled to executors
    from .binlog import parse_segment

    with open(path, "rb") as f:
        data = f.read()
    seg_fp = f"{__import__('zlib').crc32(data) & 0xFFFFFFFF:08x}:{len(data)}"
    dumps = json.dumps
    for ev in parse_segment(data, columns):
        if ev["kind"] != "rows":
            continue
        sid, gno = ev["gtid"] if ev["gtid"] else (None, None)
        for r in ev["rows"]:
            b, a = r["before"], r["after"]
            yield (
                ev["ts_sec"], ev["server_id"], ev["db"], ev["table"], ev["op"],
                ev.get("xid"), sid, gno, ev["log_pos"],
                None if b is None else dumps(b),
                None if a is None else dumps(a),
                seg_fp, None,
            )


class _SegmentPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _BinlogBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]
        self.suffix = options.get("suffix", ".binlog")
        self.columns = _columns_of(options)

    def partitions(self):
        parts = [_SegmentPartition(p) for p in _list_segments(self.path, self.suffix)]
        # an empty archive still gets one (empty) task: Spark invokes
        # read(None) when partitions() is empty
        return parts or [_SegmentPartition("")]

    def read(self, partition) -> Iterator[tuple]:
        if partition is None or not partition.path:
            return iter(())
        return _decode_file(partition.path, self.columns)


class SegmentStoreChangedError(RuntimeError):
    """The segment store shrank or was rewritten UNDER a committed
    offset (deletion, compaction, rename between micro-batches).
    File-count offsets only mean anything while the sorted prefix they
    were taken over is immutable — silently re-slicing would skip or
    re-map data, so this fails the stream loudly; the operator decides
    whether to re-snapshot or repoint the checkpoint (the same stance
    as the binlog-purged-on-server detection in recovery.py)."""


def _check_offset_prefix(files: list[str], off: dict, what: str) -> None:
    n = off.get("files", 0)
    if len(files) < n:
        raise SegmentStoreChangedError(
            f"{what}: committed offset covers {n} files but only "
            f"{len(files)} exist — segments were deleted/compacted under "
            "the checkpoint; re-snapshot or reset the checkpoint"
        )
    last = off.get("last")
    if n and last is not None and os.path.basename(files[n - 1]) != last:
        raise SegmentStoreChangedError(
            f"{what}: file #{n} is {os.path.basename(files[n - 1])!r} but the "
            f"committed offset was taken over {last!r} — the sorted prefix "
            "changed (rename/compaction); offsets no longer map to the "
            "same data"
        )


def _offset_of(files: list[str], n: int) -> dict:
    return {
        "files": n,
        "last": os.path.basename(files[n - 1]) if n else None,
    }


class _BinlogStreamReader(SimpleDataSourceStreamReader):
    """Offset = number of files (in sorted-name order) fully committed,
    plus the NAME of the last committed file so a store rewritten under
    the checkpoint (deletion/compaction/rename) fails loudly instead of
    silently skipping (VERDICT r5 #9). Sorted-name tailing matches
    binlog naming (``binlog.000001``...): new segments sort after old
    ones. Files must be append-complete when they appear (the rotate
    contract)."""

    def __init__(self, options: dict):
        self.path = options["path"]
        self.suffix = options.get("suffix", ".binlog")
        self.columns = _columns_of(options)

    def initialOffset(self) -> dict:
        return {"files": 0, "last": None}

    def read(self, start: dict):
        files = _list_segments(self.path, self.suffix)
        _check_offset_prefix(files, start, "binlog_segments stream")
        end = _offset_of(files, len(files))
        rows: list[tuple] = []  # materialized: the API copies/caches this
        for p in files[start["files"] :]:
            rows.extend(_decode_file(p, self.columns))
        return rows, end

    def readBetweenOffsets(self, start: dict, end: dict):
        # replay of an uncommitted range: deterministic re-read of the
        # same sorted file slice — valid only while that slice is intact
        files = _list_segments(self.path, self.suffix)
        _check_offset_prefix(files, end, "binlog_segments stream (replay)")
        rows: list[tuple] = []
        for p in files[start["files"] : end["files"]]:
            rows.extend(_decode_file(p, self.columns))
        return rows

    def commit(self, end: dict) -> None:
        pass  # files are immutable; nothing to clean


PGOUTPUT_DDL = "file string, seq long, data binary"


class _SpoolPartition(InputPartition):
    def __init__(self, path: str, base_seq: int):
        self.path = path
        self.base_seq = base_seq


def _read_spool(path: str, base_seq: int) -> Iterator[tuple]:
    """A pgoutput spool file: u32-BE length-prefixed messages, the
    capture order preserved by (file order, in-file index)."""
    name = os.path.basename(path)
    with open(path, "rb") as f:
        data = f.read()
    pos, i = 0, 0
    while pos < len(data):
        if pos + 4 > len(data):
            raise ValueError(f"{name}: truncated length prefix at {pos}")
        n = int.from_bytes(data[pos : pos + 4], "big")
        pos += 4
        if pos + n > len(data):
            raise ValueError(f"{name}: truncated message at {pos}")
        yield (name, base_seq + i, data[pos : pos + n])
        pos += n
        i += 1


def write_spool(path: str, messages: list[bytes]) -> None:
    """Writer half (capture side / fixtures): length-prefixed frames."""
    with open(path, "wb") as f:
        for m in messages:
            f.write(len(m).to_bytes(4, "big") + m)


class _PgoutputBatchReader(DataSourceReader):
    """Partitions per spool file; seq is globally ordered by
    (sorted file, in-file index) so tx stamping downstream
    (decode_pgoutput's interval join) sees capture order."""

    SEQ_STRIDE = 1 << 32  # per-file seq namespace: files hold < 4B msgs

    def __init__(self, options: dict):
        self.path = options["path"]
        self.suffix = options.get("suffix", ".pgout")

    def partitions(self):
        files = _list_segments(self.path, self.suffix)
        parts = [
            _SpoolPartition(p, i * self.SEQ_STRIDE) for i, p in enumerate(files)
        ]
        return parts or [_SpoolPartition("", 0)]

    def read(self, partition) -> Iterator[tuple]:
        if partition is None or not partition.path:
            return iter(())
        return _read_spool(partition.path, partition.base_seq)


class _PgoutputStreamReader(SimpleDataSourceStreamReader):
    """Offset = committed file count + last committed name, sorted-name
    order (the WAL spool grows append-only; a file is complete when it
    appears). A spool rewritten under the checkpoint fails loudly —
    seq namespaces are positional, so a shifted prefix would remap
    every downstream tx stamp (VERDICT r5 #9)."""

    def __init__(self, options: dict):
        self.path = options["path"]
        self.suffix = options.get("suffix", ".pgout")

    def initialOffset(self) -> dict:
        return {"files": 0, "last": None}

    def read(self, start: dict):
        files = _list_segments(self.path, self.suffix)
        _check_offset_prefix(files, start, "pgoutput_spool stream")
        end = _offset_of(files, len(files))
        rows: list[tuple] = []
        for i, p in enumerate(files[start["files"] :], start=start["files"]):
            rows.extend(_read_spool(p, i * _PgoutputBatchReader.SEQ_STRIDE))
        return rows, end

    def readBetweenOffsets(self, start: dict, end: dict):
        files = _list_segments(self.path, self.suffix)
        _check_offset_prefix(files, end, "pgoutput_spool stream (replay)")
        rows: list[tuple] = []
        for i in range(start["files"], end["files"]):
            rows.extend(_read_spool(files[i], i * _PgoutputBatchReader.SEQ_STRIDE))
        return rows

    def commit(self, end: dict) -> None:
        pass


class PgoutputSpoolDataSource(DataSource):
    """Raw pgoutput message spools as a Spark format: yields
    (file, seq, data) rows that feed ``decode_pgoutput`` /
    ``decode_pgoutput_messages`` unchanged — the source owns framing
    and ordering, the decoder owns the grammar."""

    @classmethod
    def name(cls) -> str:
        return "pgoutput_spool"

    def schema(self) -> str:
        return PGOUTPUT_DDL

    def reader(self, schema) -> DataSourceReader:
        return _PgoutputBatchReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _PgoutputStreamReader(self.options)


class BinlogSegmentsDataSource(DataSource):
    """``spark.dataSource.register(BinlogSegmentsDataSource)`` then
    ``spark.read.format("binlog_segments").option("path", dir).load()``."""

    @classmethod
    def name(cls) -> str:
        return "binlog_segments"

    def schema(self) -> str:
        return BINLOG_DDL

    def reader(self, schema) -> DataSourceReader:
        return _BinlogBatchReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _BinlogStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of all custom sources."""
    spark.dataSource.register(BinlogSegmentsDataSource)
    spark.dataSource.register(PgoutputSpoolDataSource)
