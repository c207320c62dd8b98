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

    Scale: map-only mapInPandas, NumPy-vectorized ACROSS the whole
    batch (r13, guide §4.2): payloads concatenate into one u8 array,
    window sums come from one ``np.add.reduceat`` over the contiguous
    window starts, and zero-crossings from a second reduceat over the
    sign-change array with window-boundary positions zeroed (a
    boundary compares samples of different windows/docs — not a
    crossing). The previous per-doc per-window Python loop built one
    tuple per window; values are bit-identical (integer arithmetic,
    same window order).
    """
    import numpy as np

    cols = ["doc_id", "window_idx", "n_samples", "sum_energy", "zero_crossings"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            # REAL AUDIO: samples = decode(payload) here (libav /
            # soundfile, absent in this container); u8 PCM passthrough:
            blobs = [bytes(p) for p in pdf[payload_col]]
            lens = np.fromiter((len(b) for b in blobs), dtype=np.int64, count=len(blobs))
            n_win = (lens + window_bytes - 1) // window_bytes
            total_w = int(n_win.sum())
            if total_w == 0:
                yield pd.DataFrame({c: [] for c in cols})
                continue
            data = np.frombuffer(b"".join(blobs), dtype=np.uint8)
            doc_starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            wdoc = np.repeat(np.arange(len(ids)), n_win)
            first_w = np.concatenate(([0], np.cumsum(n_win)[:-1]))
            in_doc = (np.arange(total_w) - np.repeat(first_w, n_win)) * window_bytes
            starts = doc_starts[wdoc] + in_doc
            ends = np.minimum(starts + window_bytes, doc_starts[wdoc] + lens[wdoc])
            sums = np.add.reduceat(data.astype(np.int64), starts)
            below = data < 128
            # sign changes between ADJACENT samples, sentinel-padded to
            # len(data) so every window's slice is index-safe; zeroing
            # position e-1 of every window removes the cross-boundary
            # comparison from its slice
            d = np.zeros(len(data), dtype=np.int64)
            d[: len(data) - 1] = below[:-1] != below[1:]
            d[ends - 1] = 0
            zc = np.add.reduceat(d, starts)
            yield pd.DataFrame(
                {
                    "doc_id": ids[wdoc],
                    "window_idx": in_doc // window_bytes,
                    "n_samples": ends - starts,
                    "sum_energy": sums,
                    "zero_crossings": zc,
                }
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


# ------------------------------------------------ deterministic codec
#
# A REAL container format with REAL decode logic, over synthetic
# payloads seeded from doc_id — so the decode step itself (magic
# check, ASCII header parse, offset math, pixel plane slicing) is
# oracle-checkable, not just the downstream projection. PPM P6 is the
# simplest real image container (magic + ASCII dims + raw RGB); the
# PCM twin seeds raw u8 samples. Both generators use closed-form
# per-byte formulas a SQL oracle reproduces exactly.

PPM_MAXVAL = 255
_PIX_MOD = 251  # prime < 256: every residue is a valid u8 sample


def synth_ppm_bytes(doc_id: int) -> bytes:
    """Seeded P6 image: w = 8 + id%9, h = 8 + id%7, pixel byte k =
    (id*31 + k) % 251 over the w*h*3 RGB plane."""
    w, h = 8 + doc_id % 9, 8 + doc_id % 7
    header = f"P6\n{w} {h}\n{PPM_MAXVAL}\n".encode()
    n = w * h * 3
    import numpy as np

    px = ((doc_id * 31 + np.arange(n, dtype=np.int64)) % _PIX_MOD).astype(np.uint8)
    return header + px.tobytes()


def synth_pcm_bytes(doc_id: int) -> bytes:
    """Seeded u8 PCM: n = 64 + id%128 samples, s[i] = (id*7 + i*13) %
    256 — full-range values, so midline zero-crossings actually occur
    (ASCII text payloads never cross 128, leaving that logic untested)."""
    import numpy as np

    n = 64 + doc_id % 128
    s = ((doc_id * 7 + np.arange(n, dtype=np.int64) * 13) % 256).astype(np.uint8)
    return s.tobytes()


def _synth_pcm_batch(ids: pd.Series) -> pd.Series:
    """Vectorized batch form of :func:`synth_pcm_bytes` (r13, guide
    §4.2): one formula evaluation over the concatenated sample stream,
    then zero-copy byte slices per doc — byte-identical to the per-doc
    numpy path it replaces."""
    import numpy as np

    iv = ids.to_numpy().astype(np.int64)
    if len(iv) == 0:
        return pd.Series([], dtype=object)
    n = 64 + iv % 128
    total = int(n.sum())
    starts = np.concatenate(([0], np.cumsum(n)[:-1]))
    rep = np.repeat(iv, n)
    j = np.arange(total, dtype=np.int64) - np.repeat(starts, n)
    big = ((rep * 7 + j * 13) % 256).astype(np.uint8).tobytes()
    ends = starts + n
    return pd.Series([big[s:e] for s, e in zip(starts, ends)])


def with_synth_payload(
    df: DataFrame, *, kind: str, id_col: str = "doc_id", out_col: str = "payload"
) -> DataFrame:
    """Attach a seeded synthetic media column (kind: 'ppm' | 'pcm') —
    an Arrow-batched pandas_udf, map-only. The pcm branch synthesizes
    the whole batch in one vectorized pass; ppm stays per-row (its
    ASCII header is per-doc and the pixel planes are tiny)."""
    gen = {"ppm": synth_ppm_bytes, "pcm": synth_pcm_bytes}[kind]

    @F.pandas_udf(T.BinaryType())
    def _gen(ids: pd.Series) -> pd.Series:
        if kind == "pcm":
            return _synth_pcm_batch(ids)
        return ids.map(lambda i: gen(int(i)))

    return df.withColumn(out_col, _gen(F.col(id_col)))


class PpmDecodeError(ValueError):
    pass


def decode_ppm(payload: bytes):
    """REAL P6 parser: magic, whitespace-separated ASCII dims + maxval,
    then exactly w*h*3 raw bytes. Returns (width, height, pixels:
    np.ndarray[u8, w*h*3]). Raises PpmDecodeError on malformed input —
    truncated pixel planes must fail loudly, not yield short arrays."""
    import numpy as np

    if payload[:2] != b"P6":
        raise PpmDecodeError("bad magic: not a P6 PPM")
    # header: three ASCII ints after the magic, any whitespace runs
    fields, pos = [], 2
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        start = pos
        while pos < len(payload) and payload[pos : pos + 1].isdigit():
            pos += 1
        if start == pos:
            raise PpmDecodeError("malformed header")
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace byte terminates the header
    w, h, maxval = fields
    if maxval != PPM_MAXVAL:
        raise PpmDecodeError(f"unsupported maxval {maxval}")
    n = w * h * 3
    body = payload[pos : pos + n]
    if len(body) != n:
        raise PpmDecodeError(f"truncated pixel plane: {len(body)} of {n} bytes")
    return w, h, np.frombuffer(body, dtype=np.uint8)


PPM_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("format", T.StringType()),
        T.StructField("pixel_sum", T.LongType()),
    ]
)


def decode_ppm_meta(
    df: DataFrame, *, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Decode-verifying metadata: dims from the REAL header parse plus
    the decoded pixel-plane sum — a wrong header offset or a truncated
    slice changes pixel_sum, so the oracle catches decoder bugs, not
    just projection bugs. Map-only mapInPandas."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                w, h, px = decode_ppm(b)
                out.append(
                    (int(doc_id), len(b), w, h, "PPM", int(px.sum(dtype=np.int64)))
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "n_bytes", "width", "height", "format", "pixel_sum"],
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(run, PPM_META_SCHEMA)


PPM_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("src_width", T.IntegerType()),
        T.StructField("src_height", T.IntegerType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("out_pixel_sum", T.LongType()),
    ]
)


def resize_ppm_images(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_w: int = 8,
    max_h: int = 8,
) -> DataFrame:
    """REAL resize over REAL decoded pixels: fit-within geometry (same
    exact math as resize_images), then nearest-neighbor resample with
    integer source mapping src_y = i*h // oh, src_x = j*w // ow — every
    output byte is a specific decoded input byte, and the reported
    out_pixel_sum verifies the whole decode→resample path bit-for-bit
    against the SQL oracle. Map-only mapInPandas, numpy per batch."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                w, h, px = decode_ppm(bytes(payload))
                scale = min(max_w / w, max_h / h, 1.0)
                ow, oh = max(1, int(w * scale)), max(1, int(h * scale))
                img = px.reshape(h, w, 3)
                ys = (np.arange(oh) * h) // oh
                xs = (np.arange(ow) * w) // ow
                resized = img[np.ix_(ys, xs)]
                out.append(
                    (int(doc_id), w, h, ow, oh, int(resized.sum(dtype=np.int64)))
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "src_width", "src_height",
                    "out_width", "out_height", "out_pixel_sum",
                ],
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(run, PPM_RESIZE_SCHEMA)


PCM_RESAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_in", T.IntegerType()),
        T.StructField("n_out", T.IntegerType()),
        T.StructField("sum_out", T.LongType()),
        T.StructField("checksum", T.LongType()),
    ]
)


def resample_pcm(
    df: DataFrame,
    *,
    factor: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Nearest-neighbor PCM decimation: keep every ``factor``-th sample
    (out[j] = in[j*factor]) — every output byte IS a decoded input
    byte, like the image resize twin (resize_ppm_images). Emits exact
    integer summaries (count, sum, position-weighted checksum) so the
    oracle can verify every retained sample from the seed formula.
    Map-only Arrow pass; at scale this is the audio down-sampling
    stage before feature extraction."""
    import numpy as np

    if factor < 1:
        raise ValueError("factor must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                s = np.frombuffer(bytes(payload), dtype=np.uint8)
                r = s[::factor].astype(np.int64)
                checksum = int((r * (np.arange(len(r)) + 1)).sum())
                out.append((int(doc_id), len(s), len(r), int(r.sum()), checksum))
            yield pd.DataFrame(
                out, columns=["doc_id", "n_in", "n_out", "sum_out", "checksum"]
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, PCM_RESAMPLE_SCHEMA
    )
