"""Multimodal plumbing tests: schemas, determinism, batch shapes,
explode semantics, and composition with the ANN operators. Decoders
are the documented deterministic fakes (real libs absent here)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from vectordb_light_spark.operators.multimodal import (
    decode_images,
    image_features,
    media_from_documents,
    resize_images,
    sample_frames,
)

SF = "/root/testdata/sf0.001"


def _media(spark, n=20):
    return media_from_documents(spark, SF, limit=n)


def test_media_table_schema(spark):
    m = _media(spark)
    assert dict(m.dtypes)["content"] == "binary"
    meta_type = dict(m.dtypes)["media_meta"]
    assert "duration_ms" in meta_type and "sample_rate" in meta_type
    assert m.count() == 20


def test_decode_images_deterministic(spark):
    m = _media(spark, 10)
    d1 = decode_images(m).select("media_id", "width", "height", "px_mean").collect()
    d2 = decode_images(m).select("media_id", "width", "height", "px_mean").collect()
    assert sorted(map(tuple, d1)) == sorted(map(tuple, d2))
    for r in d1:
        assert 16 <= r["width"] < 80 and 16 <= r["height"] < 80
        assert 0.0 <= r["px_mean"] <= 255.0
    # pass-through columns survive
    cols = decode_images(m).columns
    assert {"media_id", "kind", "content", "media_meta"} <= set(cols)


def test_image_features_unit_norm_and_compose_with_ann(spark):
    m = _media(spark, 30)
    feats = image_features(m, dim=32).drop("content")
    rows = feats.select("media_id", "features").collect()
    for r in rows:
        assert len(r["features"]) == 32
        assert abs(float(np.linalg.norm(r["features"])) - 1.0) < 1e-5
    # media features drive the same ANN operators as text embeddings
    from vectordb_light_spark.operators.similarity import add_srp_signature, ann_topk_srp

    indexed = add_srp_signature(feats, vec_col="features", n_planes=16, dim=32)
    q = [float(x) for x in rows[0]["features"]]
    out = ann_topk_srp(
        indexed, q, k=5, probe_hamming=16, n_planes=16,
        id_col="media_id", vec_col="features",
    ).collect()
    assert out[0]["media_id"] == rows[0]["media_id"]  # self is nearest
    assert out[0]["similarity_score"] > 0.999


def test_resize_byte_contract(spark):
    m = _media(spark, 5)
    out = resize_images(m, 8, 8).select("content", "resized_width").collect()
    for r in out:
        assert len(bytes(r["content"])) == 8 * 8 * 3
        assert r["resized_width"] == 8


def test_sample_frames_counts(spark):
    m = _media(spark, 8).withColumn("kind", F.lit("video"))
    frames = sample_frames(m, every_ms=500)
    per = (
        frames.groupBy("media_id")
        .agg(F.count(F.lit(1)).alias("n"), F.first("media_meta.duration_ms").alias("d"))
        .collect()
    )
    for r in per:
        assert r["n"] == max(r["d"] // 500, 1)
    one = frames.where(F.col("frame_index") >= 0).select("frame_bytes").first()
    assert isinstance(bytes(one["frame_bytes"]), bytes)
    # frame rows are deterministic across runs
    a = frames.select("media_id", "frame_index", "frame_ts_ms").collect()
    b = sample_frames(m, every_ms=500).select(
        "media_id", "frame_index", "frame_ts_ms"
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_audio_windows_boundaries_and_pcm_stub(spark):
    """Window starts stride by hop below duration; ends clamp to the
    clip; the stubbed PCM slice is non-empty, deterministic, and
    proportional to the window's span of the byte stream."""
    from vectordb_light_spark.operators.multimodal import (
        audio_windows,
        media_from_documents,
    )

    media = media_from_documents(spark, SF, kind="audio", limit=20)
    out = audio_windows(media, window_ms=5000, hop_ms=2500).cache()
    rows = out.collect()
    assert rows
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    for mid, rs in by_media.items():
        dur = rs[0]["media_meta"]["duration_ms"]
        rs.sort(key=lambda r: r["window_index"])
        assert [r["window_index"] for r in rs] == list(range(len(rs)))
        for r in rs:
            assert r["win_start_ms"] == r["window_index"] * 2500
            assert r["win_start_ms"] < dur
            assert r["win_end_ms"] == min(r["win_start_ms"] + 5000, dur)
            assert len(bytes(r["window_bytes"])) >= 1
        # full coverage: last window reaches the clip end
        assert rs[-1]["win_end_ms"] == dur

    again = {
        (r["media_id"], r["window_index"]): bytes(r["window_bytes"])
        for r in audio_windows(media, window_ms=5000, hop_ms=2500).collect()
    }
    first = {(r["media_id"], r["window_index"]): bytes(r["window_bytes"]) for r in rows}
    assert first == again


def test_audio_windows_zero_duration_emits_no_window(spark):
    """A zero-duration clip yields ZERO windows — range(0, 0, hop)
    semantics, matching the mm_audio_windows oracle; duration 1 still
    yields exactly one."""
    from vectordb_light_spark.operators.multimodal import (
        audio_windows,
        media_from_documents,
    )

    media = media_from_documents(spark, SF, limit=2)
    zero = media.withColumn(
        "media_meta", F.col("media_meta").withField("duration_ms", F.lit(0))
    )
    assert audio_windows(zero, window_ms=5000, hop_ms=2500).count() == 0
    one = media.limit(1).withColumn(
        "media_meta", F.col("media_meta").withField("duration_ms", F.lit(1))
    )
    rows = audio_windows(one, window_ms=5000, hop_ms=2500).collect()
    assert [r["window_index"] for r in rows] == [0]
    assert rows[0]["win_end_ms"] == 1


# ---------------------------------------------------------------------------
# Round 3: real stdlib decoders (sources/media.py) — BMP, PNG, WAV
# ---------------------------------------------------------------------------


def _checker(h, w):
    """Deterministic RGB test image."""
    y, x = np.mgrid[0:h, 0:w]
    px = np.stack(
        [(x * 7 + y * 3) % 256, (x * 13) % 256, (y * 11) % 256], axis=2
    ).astype(np.uint8)
    return px


def test_bmp_roundtrip_and_decode():
    from vectordb_light_spark.sources.media import bmp_decode, bmp_encode

    px = _checker(13, 10)  # odd width exercises row padding
    data = bmp_encode(px)
    assert data[:2] == b"BM"
    back = bmp_decode(data)
    np.testing.assert_array_equal(back, px)


def test_png_roundtrip_and_all_filters():
    import struct
    import zlib

    from vectordb_light_spark.sources.media import png_decode, png_encode

    for nch in (1, 2, 3, 4):
        px = _checker(9, 7)[:, :, :3]
        if nch == 1:
            px = px[:, :, :1]
        elif nch == 2:
            px = np.concatenate([px[:, :, :1], px[:, :, 1:2]], axis=2)
        elif nch == 4:
            px = np.concatenate([px, px[:, :, :1]], axis=2)
        back = png_decode(png_encode(px))
        np.testing.assert_array_equal(back, px)

    # hand-build a PNG exercising filters 1-4 (Sub/Up/Average/Paeth)
    px = _checker(5, 6)
    stride = 6 * 3
    lines = []
    prev = np.zeros(stride, np.int32)
    for y in range(5):
        cur = px[y].reshape(-1).astype(np.int32)
        f = [1, 2, 3, 4, 0][y]
        if f == 0:
            enc = cur
        elif f == 1:
            a = np.concatenate([np.zeros(3, np.int32), cur[:-3]])
            enc = (cur - a) % 256
        elif f == 2:
            enc = (cur - prev) % 256
        elif f == 3:
            a = np.concatenate([np.zeros(3, np.int32), cur[:-3]])
            enc = (cur - (a + prev) // 2) % 256
        else:
            a = np.concatenate([np.zeros(3, np.int32), cur[:-3]])
            c = np.concatenate([np.zeros(3, np.int32), prev[:-3]])
            p = a + prev - c
            pa, pb, pc = np.abs(p - a), np.abs(p - prev), np.abs(p - c)
            pred = np.where(
                (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, prev, c)
            )
            enc = (cur - pred) % 256
        lines.append(bytes([f]) + bytes(enc.astype(np.uint8)))
        prev = cur
    raw = b"".join(lines)

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 5, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(png_decode(data), px)


def test_wav_roundtrip_and_real_pcm_windows(spark):
    from vectordb_light_spark.operators.multimodal import audio_windows
    from vectordb_light_spark.sources.media import wav_decode, wav_encode

    rate = 8000
    t = np.arange(rate * 2)  # 2 s clip
    samples = (np.sin(2 * np.pi * 440 * t / rate) * 20000).astype(np.int16)
    data = wav_encode(samples[:, None], rate)
    back, r2 = wav_decode(data)
    assert r2 == rate
    np.testing.assert_array_equal(back[:, 0], samples)

    media = spark.createDataFrame(
        [(1, "audio", bytearray(data), ("wav", None, None, 1, rate, 2000))],
        "media_id long, kind string, content binary, "
        "media_meta struct<format string, width int, height int, "
        "channels int, sample_rate int, duration_ms int>",
    )
    rows = (
        audio_windows(media, window_ms=500, hop_ms=500)
        .orderBy("window_index")
        .collect()
    )
    assert len(rows) == 4
    for r in rows:
        win, _ = wav_decode(bytes(r["window_bytes"]))
        lo = rate * r["win_start_ms"] // 1000
        hi = rate * r["win_end_ms"] // 1000
        np.testing.assert_array_equal(win[:, 0], samples[lo:hi])


def test_audio_features_8bit_wav_centered(spark):
    """Regression (r5): 8-bit WAV PCM is unsigned 0..255 — the mono
    signal must be centered on 128 before normalization, or silence
    carries a ~1.0 DC offset that dominates rms and band-0 energy."""
    from vectordb_light_spark.operators.multimodal import audio_features
    from vectordb_light_spark.sources.media import wav_encode

    rate, dur = 8000, 1.0
    t = np.arange(int(rate * dur)) / rate
    amp = 100  # of 127 full-scale
    tone8 = (128 + amp * np.sin(2 * np.pi * 1000 * t)).astype(np.uint8)
    silence8 = np.full(len(t), 128, dtype=np.uint8)
    tone16 = (amp / 128.0 * 32767 * np.sin(2 * np.pi * 1000 * t)).astype(
        np.int16
    )
    media = spark.createDataFrame(
        [
            (1, bytearray(wav_encode(tone8[:, None], rate))),
            (2, bytearray(wav_encode(silence8[:, None], rate))),
            (3, bytearray(wav_encode(tone16[:, None], rate))),
        ],
        "media_id long, content binary",
    )
    rows = {r["media_id"]: r for r in audio_features(media).collect()}
    want_rms = (amp / 128.0) / np.sqrt(2.0)
    # 8-bit tone: rms matches amplitude/sqrt(2), not 1.0+offset
    assert abs(rows[1]["rms"] - want_rms) < 0.02, rows[1]["rms"]
    assert abs(rows[1]["peak_hz"] - 1000.0) < 4.0
    # 8-bit silence: rms ~0 (buggy path reported ~1.0)
    assert rows[2]["rms"] < 0.01, rows[2]["rms"]
    # 8-bit and 16-bit encodings of the same tone agree closely
    assert abs(rows[1]["rms"] - rows[3]["rms"]) < 0.02
    assert rows[1]["dominant_band"] == rows[3]["dominant_band"]


def _mp3_frames(
    n: int,
    *,
    version_bits: int = 3,
    bitrate_idx: int = 9,
    rate_idx: int = 0,
    channel_mode: int = 0,
) -> bytes:
    """Synthetic MPEG audio frame chain: REAL headers (ISO 11172-3
    layout), zeroed payloads — mp3_metadata only reads headers."""
    from vectordb_light_spark.sources.media import _mp3_frame_header

    b1 = 0xE0 | (version_bits << 3) | (0x1 << 1) | 0x1  # Layer III
    b2 = (bitrate_idx << 4) | (rate_idx << 2)
    b3 = channel_mode << 6
    hdr = bytes([0xFF, b1, b2, b3])
    size = _mp3_frame_header(hdr, 0)["size"]
    return (hdr + b"\x00" * (size - 4)) * n


def test_mp3_metadata_frame_chain():
    """r5 (verdict #8): duration / bitrate / sample rate / channels
    parsed from real MPEG frame headers, incl. an ID3v2 prefix and a
    mono MPEG2 variant; garbage raises."""
    import pytest

    from vectordb_light_spark.sources.media import mp3_metadata, sniff_format

    data = _mp3_frames(10)  # MPEG1 L3, 44100 Hz, 128 kbps, stereo
    assert sniff_format(data) == "mp3"
    m = mp3_metadata(data)
    assert m["sample_rate"] == 44100 and m["channels"] == 2
    assert m["n_frames"] == 10 and m["bitrate_kbps"] == 128
    assert abs(m["duration_s"] - 10 * 1152 / 44100) < 1e-9
    assert (m["layer"], m["mpeg_version"]) == (3, "1")

    # ID3v2 prefix: syncsafe size 200, zero padding before the frames
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 200 >> 7, 200 & 0x7F]) + b"\x00" * 200
    m2 = mp3_metadata(id3 + data)
    assert sniff_format(id3 + data) == "mp3"
    assert (m2["n_frames"], m2["sample_rate"]) == (10, 44100)

    # MPEG2 Layer III mono, 24000 Hz (rate_idx 1), 64 kbps (idx 8)
    m3 = mp3_metadata(
        _mp3_frames(4, version_bits=2, bitrate_idx=8, rate_idx=1, channel_mode=3)
    )
    assert (m3["sample_rate"], m3["channels"]) == (24000, 1)
    assert abs(m3["duration_s"] - 4 * 576 / 24000) < 1e-9
    assert m3["mpeg_version"] == "2"

    with pytest.raises(ValueError):
        mp3_metadata(b"\xff\xe0 definitely not frames" * 10)


def test_audio_features_mp3_real_sample_rate(spark):
    """MP3 rows stay on the labeled fake feature tier but carry a
    REAL sr from the frame chain; non-audio garbage keeps sr -1."""
    from vectordb_light_spark.operators.multimodal import audio_features

    media = spark.createDataFrame(
        [
            (1, bytearray(_mp3_frames(5))),
            (2, bytearray(_mp3_frames(3, version_bits=2, bitrate_idx=8, rate_idx=1))),
            (3, bytearray(b"not audio")),
        ],
        "media_id long, content binary",
    )
    rows = {r["media_id"]: r for r in audio_features(media).collect()}
    assert rows[1]["sr"] == 44100 and rows[2]["sr"] == 24000
    assert rows[1]["rms"] == -1.0  # still the labeled fake tier
    assert rows[3]["sr"] == -1


def test_decode_and_features_and_resize_on_real_images(spark):
    from vectordb_light_spark.operators.multimodal import (
        decode_images,
        image_features,
        resize_images,
    )
    from vectordb_light_spark.sources.media import (
        bmp_decode,
        bmp_encode,
        png_decode,
        png_encode,
    )

    bmp_px, png_px = _checker(20, 30), _checker(16, 16)
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(bmp_encode(bmp_px)), ("bmp", None, None, 3, 0, 0)),
            (2, "image", bytearray(png_encode(png_px)), ("png", None, None, 3, 0, 0)),
            (3, "image", bytearray(b"not an image at all"), ("jpg", None, None, 3, 0, 0)),
        ],
        "media_id long, kind string, content binary, "
        "media_meta struct<format string, width int, height int, "
        "channels int, sample_rate int, duration_ms int>",
    )
    got = {r["media_id"]: r for r in decode_images(media).collect()}
    assert (got[1]["width"], got[1]["height"]) == (30, 20)
    assert abs(got[1]["px_mean"] - float(bmp_px.mean())) < 1e-6
    assert abs(got[1]["px_std"] - float(bmp_px.std())) < 1e-6
    assert (got[2]["width"], got[2]["height"]) == (16, 16)
    assert abs(got[2]["px_mean"] - float(png_px.mean())) < 1e-6
    # undecodable row still gets the deterministic fake, not a crash
    assert got[3]["width"] > 0

    feats = {r["media_id"]: r["features"] for r in image_features(media).collect()}
    assert all(abs(sum(x * x for x in v) - 1.0) < 1e-4 for v in feats.values())
    # real pixel features: identical pixels re-encoded differently
    # (PNG vs BMP) must produce the SAME descriptor
    alt = spark.createDataFrame(
        [(9, "image", bytearray(png_encode(bmp_px)), ("png", None, None, 3, 0, 0))],
        media.schema,
    )
    same = image_features(alt).collect()[0]["features"]
    np.testing.assert_allclose(feats[1], same, atol=1e-6)

    rows = {
        r["media_id"]: r
        for r in resize_images(media, 8, 6).collect()
    }
    small = bmp_decode(bytes(rows[1]["content"]))
    assert small.shape == (6, 8, 3)
    small_png = png_decode(bytes(rows[2]["content"]))
    assert small_png.shape == (6, 8, 3)


def test_media_codec_roundtrip_property():
    """Property: ANY uint8 image round-trips bit-exact through both
    stdlib codecs, and any int16 clip through WAV."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    from vectordb_light_spark.sources.media import (
        bmp_decode,
        bmp_encode,
        png_decode,
        png_encode,
        wav_decode,
        wav_encode,
    )

    @settings(max_examples=25, deadline=None)
    @given(
        arrays(
            np.uint8,
            st.tuples(
                st.integers(1, 12), st.integers(1, 12), st.sampled_from([1, 3, 4])
            ),
        )
    )
    def roundtrip_images(px):
        np.testing.assert_array_equal(png_decode(png_encode(px)), px)
        if px.shape[2] == 3:
            np.testing.assert_array_equal(bmp_decode(bmp_encode(px)), px)

    @settings(max_examples=25, deadline=None)
    @given(
        arrays(
            np.int16,
            st.tuples(st.integers(1, 400), st.sampled_from([1, 2])),
        ),
        st.sampled_from([8000, 16000, 44100]),
    )
    def roundtrip_wav(samples, rate):
        back, r = wav_decode(wav_encode(samples, rate))
        assert r == rate
        np.testing.assert_array_equal(back, samples)

    roundtrip_images()
    roundtrip_wav()


def test_bmp_decode_8bit_palette_and_bitfields_rejection():
    """8-bit BMPs must map through their color table (not return raw
    palette indices as gray), and BI_BITFIELDS files (whose channel
    masks we don't parse) must be rejected so they fall through to the
    documented fake tier (ADVICE r3)."""
    import struct

    import numpy as np
    import pytest

    from vectordb_light_spark.sources.media import bmp_decode

    # hand-build a 2x2 8-bit palettized BMP: indices 0..3 → distinct RGB
    w = h = 2
    palette = b"".join(
        struct.pack("<BBBB", b, g, r, 0)
        for r, g, b in [(255, 0, 0), (0, 255, 0), (0, 0, 255), (7, 8, 9)]
    ) + b"\x00" * 4 * 252
    row0 = bytes([0, 1]) + b"\x00\x00"  # 4-byte row padding
    row1 = bytes([2, 3]) + b"\x00\x00"
    body = row1 + row0  # bottom-up
    pixel_off = 14 + 40 + len(palette)
    header = struct.pack("<2sIHHI", b"BM", pixel_off + len(body), 0, 0, pixel_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(body), 2835, 2835, 256, 0
    )
    px = bmp_decode(header + info + palette + body)
    assert px.shape == (2, 2, 3)
    np.testing.assert_array_equal(px[0, 0], [255, 0, 0])
    np.testing.assert_array_equal(px[0, 1], [0, 255, 0])
    np.testing.assert_array_equal(px[1, 0], [0, 0, 255])
    np.testing.assert_array_equal(px[1, 1], [7, 8, 9])

    # same geometry but compression=3 (BI_BITFIELDS) → rejected
    info_bf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 32, 3, 16, 2835, 2835, 0, 0
    )
    hdr_bf = struct.pack("<2sIHHI", b"BM", 14 + 40 + 16, 0, 0, 14 + 40)
    with pytest.raises(ValueError, match="unsupported BMP"):
        bmp_decode(hdr_bf + info_bf + b"\x00" * 16)


def test_jpeg_roundtrip_all_modes():
    """Baseline JPEG codec (r4): encode/decode round-trip at 4:4:4,
    4:2:0, grayscale, odd dimensions, and restart intervals — errors
    bounded by quantization (smooth gradients, q90)."""
    import numpy as np

    from vectordb_light_spark.sources.media import (
        decode_image,
        jpeg_decode,
        jpeg_encode,
        sniff_format,
    )

    yy, xx = np.mgrid[0:37, 0:53]
    px = np.stack(
        [np.clip(xx * 3, 0, 255), np.clip(yy * 4, 0, 255),
         np.clip(120 + 0.5 * xx + 0.5 * yy, 0, 255)],
        axis=2,
    ).astype(np.uint8)
    for sub in ("444", "420"):
        for ri in (0, 3):
            data = jpeg_encode(px, quality=90, subsampling=sub,
                               restart_interval=ri)
            assert sniff_format(data) == "jpeg"
            back = jpeg_decode(data)
            assert back.shape == px.shape
            err = np.abs(back.astype(int) - px.astype(int))
            assert err.max() <= (10 if sub == "444" else 20), (sub, ri)
    gray = np.clip(yy * 6, 0, 255).astype(np.uint8)
    back = jpeg_decode(jpeg_encode(gray, quality=85))
    assert back.shape == (37, 53, 1)
    assert np.abs(back[:, :, 0].astype(int) - gray.astype(int)).max() <= 12
    # dispatch integration
    assert decode_image(jpeg_encode(px)).shape == px.shape
    # progressive marker (SOF2) must fall through to the fake tier
    import pytest

    data = bytearray(jpeg_encode(px))
    idx = data.find(b"\xff\xc0")
    data[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="coding process"):
        jpeg_decode(bytes(data))
    assert decode_image(bytes(data)) is None


def test_jpeg_roundtrip_low_quality_high_frequency():
    """Regression (r5): dequantization must index the quant table in
    zigzag order. At q<=75 the scaled Annex-K tables are far from
    flat, so natural-order indexing mis-scales every AC coefficient —
    noise content decoded with mean abs error ~37 instead of ~7. Pin
    the corrected error envelope on high-frequency content."""
    import numpy as np

    from vectordb_light_spark.sources.media import jpeg_decode, jpeg_encode

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(32, 40, 3), dtype=np.uint8)
    # 4:4:4 only: 4:2:0 chroma decimation dominates on noise content
    # regardless of dequant correctness. Measured on this content:
    # fixed mean err 28.1 (q50) / 15.4 (q75); buggy 42.7 / 37.6.
    for q, bound in ((50, 33.0), (75, 25.0)):
        back = jpeg_decode(jpeg_encode(px, quality=q, subsampling="444"))
        err = np.abs(back.astype(int) - px.astype(int))
        assert err.mean() <= bound, (q, err.mean())
    gray = rng.integers(0, 256, size=(24, 24), dtype=np.uint8)
    back = jpeg_decode(jpeg_encode(gray, quality=60))
    # measured: fixed 11.6, buggy 35.0
    assert np.abs(back[:, :, 0].astype(int) - gray.astype(int)).mean() <= 20.0


def test_jpeg_contract_margin():
    """mm_jpeg_decode pins within_tol at |mean - const| <= 3; require
    the measured worst error across all 256-step constants at >= 2x
    margin so codec wobble can't flip the driver flag."""
    import numpy as np

    from vectordb_light_spark.sources.media import jpeg_decode, jpeg_encode

    worst = 0.0
    for i in range(0, 256, 17):
        rgb = (i * 7 % 256, i * 13 % 256, i * 29 % 256)
        img = np.tile(np.array(rgb, dtype=np.uint8)[None, None, :], (16, 24, 1))
        back = jpeg_decode(
            jpeg_encode(img, quality=90, subsampling="420", restart_interval=2)
        )
        worst = max(worst, abs(float(back.mean()) - sum(rgb) / 3.0))
    assert worst <= 1.5, worst


def test_avi_mjpeg_roundtrip_and_parse():
    """r4: AVI RIFF container (avi_encode/avi_parse) carries MJPEG
    frames losslessly — parsed chunks are byte-identical to the JPEG
    streams that went in, and timing metadata round-trips."""
    import pytest

    from vectordb_light_spark.sources.media import (
        avi_encode,
        avi_parse,
        jpeg_decode,
        jpeg_encode,
        sniff_format,
    )

    frames = [
        jpeg_encode(np.full((16, 24, 3), c, np.uint8)) for c in (5, 130, 250)
    ]
    avi = avi_encode(frames, 12.5, 24, 16)
    assert sniff_format(avi) == "avi"
    v = avi_parse(avi)
    assert (v["fps"], v["n_frames"], v["width"], v["height"]) == (12.5, 3, 24, 16)
    assert [bytes(f) for f in v["frames"]] == frames
    px = jpeg_decode(v["frames"][2])
    assert px.shape == (16, 24, 3) and abs(float(px.mean()) - 250) <= 3
    with pytest.raises(ValueError):
        avi_parse(b"RIFF\x00\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        avi_encode([], 10, 2, 2)


def test_gif_roundtrip_interlace_transparency_disposal():
    import pytest

    from vectordb_light_spark.sources.media import (
        gif_decode,
        gif_encode,
        sniff_format,
    )

    f1 = np.zeros((10, 12, 3), np.uint8)
    f1[:, :6] = [255, 0, 0]
    f1[:, 6:] = [0, 0, 255]
    f2 = np.zeros((10, 12, 3), np.uint8)
    f2[:5] = [0, 255, 0]
    f2[5:] = [7, 8, 9]
    g = gif_encode([f1, f2], delay_ms=200)
    assert sniff_format(g) == "gif"
    frames, delays = gif_decode(g)
    assert delays == [200, 200]
    assert np.array_equal(frames[0], f1) and np.array_equal(frames[1], f2)
    # single frame, >2 colors exercises wider LZW code widths
    rng = np.random.default_rng(0)
    big = rng.integers(0, 255, size=(9, 7, 3), dtype=np.uint8)
    big = (big // 32) * 32  # <=8 levels/channel keeps palette <=256? no —
    big = np.stack([big[:, :, 0]] * 3, axis=2)  # grayscale → <=256 colors
    fr, _ = gif_decode(gif_encode([big]))
    assert np.array_equal(fr[0], big)
    with pytest.raises(ValueError):
        gif_decode(b"NOTAGIF")
    with pytest.raises(ValueError):
        gif_encode([np.zeros((2, 2, 4), np.uint8)])


def test_sample_frames_real_avi_and_gif_tiers(spark):
    """r4: video rows whose content is MJPEG-AVI return the REAL
    stored JPEG stream nearest each sampled timestamp; GIF rows the
    composed frame PNG-encoded; anything else keeps the documented
    fake. One 2s@2fps AVI sampled every 500 ms hits frames 0..3
    exactly."""
    from vectordb_light_spark.sources.media import (
        avi_encode,
        gif_encode,
        jpeg_decode,
        jpeg_encode,
        png_decode,
    )

    jpgs = [
        jpeg_encode(np.full((16, 24, 3), 40 * (i + 1), np.uint8))
        for i in range(4)
    ]
    avi = avi_encode(jpgs, 2.0, 24, 16)
    gif_frames = [np.full((6, 8, 3), [i * 80, 0, 255 - i * 80], np.uint8) for i in range(3)]
    gif = gif_encode(gif_frames, delay_ms=700)  # frames start at 0/700/1400 ms
    meta = {"format": "raw", "width": None, "height": None, "channels": None,
            "sample_rate": 16000, "duration_ms": 2000}
    df = spark.createDataFrame(
        [(1, "video", bytearray(avi), meta),
         (2, "video", bytearray(gif), meta),
         (3, "video", bytearray(b"\x00opaque-codec-bytes" * 8), meta)],
        "media_id long, kind string, content binary, media_meta struct<"
        "format string, width int, height int, channels int, "
        "sample_rate int, duration_ms int>",
    )
    rows = {
        (r["media_id"], r["frame_index"]): bytes(r["frame_bytes"])
        for r in sample_frames(df, every_ms=500).collect()
    }
    assert len(rows) == 12  # 3 videos x 4 sampled frames
    for fi in range(4):
        assert rows[(1, fi)] == jpgs[fi]  # bit-identical stored JPEG
        px = jpeg_decode(rows[(1, fi)])
        assert abs(float(px.mean()) - 40 * (fi + 1)) <= 3
    # GIF: ts 0,500 → frame 0; 1000 → frame 1; 1500 → frame 2
    for fi, want in ((0, 0), (1, 0), (2, 1), (3, 2)):
        assert np.array_equal(png_decode(rows[(2, fi)]), gif_frames[want])
    # unknown codec keeps the fake 64-byte window
    assert len(rows[(3, 0)]) == 64


# ---------------------------------------------------------------------------
# Perceptual image hashing (r6)
# ---------------------------------------------------------------------------


def _gradient_bmp(seed, noise_at=None):
    import numpy as np

    from vectordb_light_spark.sources.media import bmp_encode

    R = np.arange(16)[:, None]
    C = np.arange(18)[None, :]
    px = ((seed + 3) * (R * 17 + C * 23 + 11)) % 256
    if noise_at is not None:
        r, c, v = noise_at
        px[r, c] = (px[r, c] + v) % 256
    return bmp_encode(px.astype(np.uint8))


def test_dhash_identical_and_perturbed_images(spark):
    """dHash invariants: identical bytes → hamming 0; a one-pixel
    perturbation flips at most 2 of the 64 grid comparisons; a
    different base pattern lands far away."""
    from pyspark.sql import functions as F

    from vectordb_light_spark.operators.multimodal import image_dhash

    rows = [
        (1, _gradient_bmp(7)),
        (2, _gradient_bmp(7)),                       # identical
        (3, _gradient_bmp(7, noise_at=(4, 9, 83))),  # one noisy pixel
        (4, _gradient_bmp(123)),                     # different image
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: r["dhash"] for r in image_dhash(df).collect()}

    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    assert got[1] == got[2]
    assert ham(got[1], got[3]) <= 2
    assert ham(got[1], got[4]) > 6


def test_dhash_undecodable_bytes_get_deterministic_fake(spark):
    from vectordb_light_spark.operators.multimodal import image_dhash

    df = spark.createDataFrame(
        [(1, b"not an image"), (2, b"not an image"), (3, None)],
        "media_id long, content binary",
    )
    got = {r["media_id"]: r["dhash"] for r in image_dhash(df).collect()}
    assert got[1] == got[2]          # deterministic
    assert got[3] is not None        # total — NULL content still hashes


def test_image_hamming_pairs_star_collapse_parity(spark):
    """Identical-image clusters: the hot-cluster star collapse must
    keep connected components identical to the exact clique while
    emitting only |cluster|−1 star rows per cluster."""
    from pyspark.sql import functions as F

    from vectordb_light_spark.operators.dedup import hamming_near_dup_pairs
    from vectordb_light_spark.operators.multimodal import image_dhash

    # two identical-image clusters (8 + 5) plus 3 singletons
    rows = (
        [(i, _gradient_bmp(7)) for i in range(8)]
        + [(100 + i, _gradient_bmp(55)) for i in range(5)]
        + [(900 + i, _gradient_bmp(200 + 37 * i)) for i in range(3)]
    )
    df = spark.createDataFrame(rows, "media_id long, content binary")
    keyed = image_dhash(df).select(
        F.col("media_id").alias("__id"), F.col("dhash").alias("__sim")
    )

    def components(pairs):
        import collections

        parent = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in pairs:
            a, b = find(r["id_a"]), find(r["id_b"])
            if a != b:
                parent[max(a, b)] = min(a, b)
        groups = collections.defaultdict(set)
        for x in parent:
            groups[find(x)].add(x)
        return {frozenset(g) for g in groups.values() if len(g) > 1}

    exact = hamming_near_dup_pairs(
        keyed, total_bits=64, max_hamming=0, max_cluster=None
    ).collect()
    starred = hamming_near_dup_pairs(
        keyed, total_bits=64, max_hamming=0, max_cluster=3
    ).collect()
    assert components(exact) == components(starred)
    assert len(exact) == 8 * 7 // 2 + 5 * 4 // 2   # full cliques
    assert len(starred) == 7 + 4                   # star rows only
    assert all(r["hamming"] == 0 for r in starred)


def test_decode_image_features_fused_matches_two_stage(spark):
    """r13 fused stage: decode_image_features must be bit-identical
    to image_features(decode_images(df)) — same meta columns, same
    feature vectors, same column order semantics (the fused form is
    what mm_image_pipeline runs; the two-stage form stays the
    reference)."""
    from vectordb_light_spark.operators.multimodal import (
        decode_image_features,
    )

    m = _media(spark, 25)
    cols = [
        "media_id", "width", "height", "channels",
        "px_mean", "px_std", "features",
    ]
    fused = {
        r["media_id"]: r
        for r in decode_image_features(m, dim=32).select(*cols).collect()
    }
    staged = {
        r["media_id"]: r
        for r in image_features(decode_images(m), dim=32)
        .select(*cols)
        .collect()
    }
    assert set(fused) == set(staged) and len(fused) == 25
    for mid, f in fused.items():
        s = staged[mid]
        for c in ("width", "height", "channels", "px_mean", "px_std"):
            assert f[c] == s[c], (mid, c, f[c], s[c])
        assert f["features"] == s["features"], mid
