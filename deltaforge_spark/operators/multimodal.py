"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched Pandas UDFs.

The Spark-side plumbing is real and tested: schema contracts, binary
columns, ``mapInPandas`` batch iteration, deterministic partitioning.
The actual media decode is STUBBED (the container has no image/audio
libs): ``decode_image_meta`` ships a deterministic fake decoder driven
by the content hash, and the place where Pillow/libav would slot in is
marked. At 100 TB the pattern matters more than the decoder:

- binaries stay opaque in parquet (no JVM<->Python conversion until the
  UDF boundary, Arrow-batched there);
- metadata extraction is a mapInPandas projection — embarrassingly
  parallel, no shuffle;
- frame/window sampling fans out rows inside the UDF iterator without
  materializing whole partitions.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_sha256", T.StringType()),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for a real image decode.

    REAL IMPLEMENTATION (requires Pillow, absent in this container):
        from PIL import Image; im = Image.open(io.BytesIO(payload))
        return im.width, im.height, im.format
    The fake derives dims from the content hash so tests and oracles
    can reproduce it: width = 1 + h[0:4]%2048, height = 1 + h[4:8]%2048.
    """
    h = hashlib.sha256(payload).digest()
    width = 1 + int.from_bytes(h[0:4], "big") % 2048
    height = 1 + int.from_bytes(h[4:8], "big") % 2048
    return width, height, "FAKE"


def with_binary_payload(df: DataFrame, *, src_col: str = "text", out_col: str = "payload") -> DataFrame:
    """Materialize an opaque binary column (tests reuse document text as
    the 'media' bytes; production reads real blobs)."""
    return df.withColumn(out_col, F.encode(F.col(src_col), "UTF-8"))


def decode_image_meta(df: DataFrame, *, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Extract typed metadata from a binary media column via
    mapInPandas (Arrow batches; decode stub marked above)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                w, h, fmt = _fake_decode(b)
                out.append((int(doc_id), len(b), hashlib.sha256(b).hexdigest(), w, h, fmt))
            yield pd.DataFrame(
                out, columns=["doc_id", "n_bytes", "sha256", "width", "height", "format"]
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(run, IMAGE_META_SCHEMA)


def sample_frames(
    df: DataFrame, *, id_col: str = "doc_id", payload_col: str = "payload", every: int = 64
) -> DataFrame:
    """Frame-sampling pattern: 1→N fan-out inside the UDF iterator.

    REAL IMPLEMENTATION would demux video and hash every Nth frame;
    the stub slices the payload into ``every``-byte 'frames'. The
    Spark-side contract (row explosion inside mapInPandas, stable
    output schema) is the part under test.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                for i, off in enumerate(range(0, len(b), every)):
                    rows.append(
                        (int(doc_id), i, hashlib.sha256(b[off : off + every]).hexdigest())
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_sha256"])

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(run, FRAME_SCHEMA)


AUDIO_WINDOW_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("window_idx", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("sum_energy", T.LongType()),
        T.StructField("zero_crossings", T.IntegerType()),
    ]
)


def audio_energy_windows(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    window_bytes: int = 256,
) -> DataFrame:
    """Windowed signal features over an opaque audio byte stream:
    per-window sample count, energy sum, and zero-crossing count.

    Unlike the image decode this is NOT a stub — the computation treats
    the payload as unsigned 8-bit PCM (bytes ARE samples), which is a
    real feature extraction for u8 audio; a codec'd input (mp3/ogg)
    would decode to PCM first at the marked line. All outputs are exact
    integers, so the DuckDB oracle reproduces them bit-for-bit.

    Zero crossings count sign changes around the u8 midline (128),
    within each window only (windows are independent → the operator
    stays embarrassingly parallel; cross-window continuity would need
    one boundary sample carried per window, not a shuffle).

    Scale: map-only mapInPandas; NumPy-vectorized per batch; the window
    fan-out happens inside the UDF iterator.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                # REAL AUDIO: samples = decode(payload) here (libav /
                # soundfile, absent in this container); u8 PCM passthrough:
                samples = np.frombuffer(bytes(payload), dtype=np.uint8)
                for w in range(0, len(samples), window_bytes):
                    win = samples[w : w + window_bytes]
                    below = win < 128
                    out.append(
                        (
                            doc_id,
                            w // window_bytes,
                            len(win),
                            int(win.sum(dtype=np.int64)),
                            int((below[:-1] != below[1:]).sum()),
                        )
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "window_idx", "n_samples", "sum_energy", "zero_crossings",
                ],
            )

    return df.select(
        F.col(id_col).alias(id_col), F.col(payload_col).alias(payload_col)
    ).mapInPandas(run, AUDIO_WINDOW_SCHEMA)


RESIZE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("src_width", T.IntegerType()),
        T.StructField("src_height", T.IntegerType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("out_bytes", T.IntegerType()),
    ]
)


def resize_images(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_w: int = 512,
    max_h: int = 512,
) -> DataFrame:
    """Fit-within resize of an image batch: aspect-preserving downscale
    to at most (max_w, max_h), never upscaling.

    The geometry is REAL (integer fit-within math, exact oracle); the
    pixel work is the marked stub — source dims come from the same
    deterministic fake decode as ``decode_image_meta``, and the resized
    payload is reported as an uncompressed RGB byte count
    (out_w * out_h * 3). REAL IMPLEMENTATION (Pillow, absent here):
    ``im.thumbnail((max_w, max_h)); buf = im.tobytes()``.

    Scale: map-only mapInPandas; binaries stay opaque to the JVM.
    Fit-within: scale = min(max_w/w, max_h/h, 1); out = floor(dim *
    scale) clamped to >= 1 — the floor keeps both bounds respected.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                w, h, _ = _fake_decode(bytes(payload))
                scale = min(max_w / w, max_h / h, 1.0)
                ow = max(1, int(w * scale))
                oh = max(1, int(h * scale))
                out.append((doc_id, w, h, ow, oh, ow * oh * 3))
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "src_width", "src_height",
                    "out_width", "out_height", "out_bytes",
                ],
            )

    return df.select(
        F.col(id_col).alias(id_col), F.col(payload_col).alias(payload_col)
    ).mapInPandas(run, RESIZE_META_SCHEMA)
