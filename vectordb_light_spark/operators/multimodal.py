"""Multimodal columns: image/audio/video as opaque ``binary`` with
typed metadata, processed by Arrow-batched stages.

The reference's GUI exposes document_type ∈ {document, image, audio}
as a query-time filter (reference gui_tabs_settings_database_query.py:
165-172) but has no media decoding; a 100 TB training-data pipeline
does, so this module supplies the engine's media surface:

    media table: media_id long, kind string, content binary,
                 media_meta struct<format string, width int,
                 height int, channels int, sample_rate int,
                 duration_ms int>

    decode_images    content → dims + pixel stats     (mapInPandas)
    image_features   content → array<float> embedding (mapInPandas)
    resize_images    content → resized content        (mapInPandas)
    sample_frames    video row → exploded frame rows  (builtins+UDF)

DECODER TIERS (round 3 ungated the stdlib formats): each stage
resolves per row, best first —

1. PIL / real codec when importable (not in this container);
2. pure-stdlib decoders (sources/media.py, written from the public
   specs): BMP, zlib-PNG, (r4) baseline-JPEG and GIF pixels for the
   image stages, ``wave`` PCM for audio windows, and (r4) MJPEG-AVI /
   animated-GIF frames for sample_frames — REAL pixels/samples/
   frames, real statistics, real nearest-neighbor resizes, real PCM
   slices;
3. for formats with no stdlib path (MP3, non-MJPEG video codecs,
   progressive/arithmetic JPEG): the
   clearly-marked DETERMINISTIC FAKE (byte-level arithmetic, stable
   across runs and executors), which keeps the Spark-side plumbing —
   schemas, Arrow batch shapes, partitioning, pass-through columns,
   explode semantics — real and fully tested.

Scale notes: binary columns ride Parquet like any other column;
``spark.sql.files.maxPartitionBytes`` bounds task input so huge blobs
don't blow executor memory; stages are map-only (no shuffle); file
pruning on ``kind`` works when the table is partitioned by it.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_META = (
    "media_meta struct<format string, width int, height int, channels int, "
    "sample_rate int, duration_ms int>"
)
MEDIA_SCHEMA = f"media_id long, kind string, content binary, {MEDIA_META}"


def _try_pil():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


# ---------------------------------------------------------------------------
# Deterministic fakes (used when the real decoder is absent)
# ---------------------------------------------------------------------------


def _fake_decode(data: bytes) -> dict:
    """DETERMINISTIC FAKE decode: dims derived from a content hash,
    pixel stats from byte statistics. Stable across runs/executors."""
    h = hashlib.blake2b(data, digest_size=8).digest()
    width = 16 + h[0] % 64
    height = 16 + h[1] % 64
    arr = np.frombuffer(data, dtype=np.uint8)
    return {
        "width": int(width),
        "height": int(height),
        "channels": 3,
        "px_mean": float(arr.mean()) if arr.size else 0.0,
        "px_std": float(arr.std()) if arr.size else 0.0,
    }


def _fake_features(data: bytes, dim: int) -> np.ndarray:
    """DETERMINISTIC FAKE feature extractor: byte-4-gram feature
    hashing → unit vector (same shape/dtype contract a real vision
    encoder would return)."""
    out = np.zeros(dim, dtype=np.float32)
    for i in range(0, max(len(data) - 3, 1)):
        h = int.from_bytes(
            hashlib.blake2b(data[i : i + 4], digest_size=8).digest(), "big"
        )
        out[h % dim] += 1.0 if (h >> 62) & 1 else -1.0
    n = float(np.linalg.norm(out))
    return out / max(n, 1e-12)


def _fake_resize(data: bytes, width: int, height: int) -> bytes:
    """DETERMINISTIC FAKE resize: tile/truncate bytes to w*h*3."""
    target = width * height * 3
    if not data:
        return b"\x00" * target
    reps = target // len(data) + 1
    return (data * reps)[:target]


# ---------------------------------------------------------------------------
# Stages
# ---------------------------------------------------------------------------


def decode_images(df: DataFrame, *, content_col: str = "content") -> DataFrame:
    """Decode stage: adds width/height/channels/px_mean/px_std.

    Per-row tiers: PIL → stdlib BMP/PNG (sources/media.py, REAL
    pixels) → deterministic fake for other formats. All input columns
    pass through."""
    from vectordb_light_spark.sources.media import decode_image

    pil = _try_pil()
    fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema)
    schema = (
        f"{fields}, width int, height int, channels int, "
        "px_mean double, px_std double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in batches:
            metas = []
            for data in pdf[content_col]:
                raw = bytes(data) if data is not None else b""
                px = None if pil is not None else decode_image(raw)
                if pil is not None:
                    img = pil.open(io.BytesIO(raw))
                    arr = np.asarray(img)
                    metas.append(
                        {
                            "width": img.width,
                            "height": img.height,
                            "channels": arr.shape[2] if arr.ndim == 3 else 1,
                            "px_mean": float(arr.mean()),
                            "px_std": float(arr.std()),
                        }
                    )
                elif px is not None:
                    metas.append(
                        {
                            "width": int(px.shape[1]),
                            "height": int(px.shape[0]),
                            "channels": int(px.shape[2]),
                            "px_mean": float(px.mean()),
                            "px_std": float(px.std()),
                        }
                    )
                else:
                    metas.append(_fake_decode(raw))
            out = pdf.copy()
            for k in ("width", "height", "channels", "px_mean", "px_std"):
                out[k] = [m[k] for m in metas]
            yield out

    return df.mapInPandas(run, schema=schema)


def decode_image_features(
    df: DataFrame,
    *,
    content_col: str = "content",
    out_col: str = "features",
    dim: int = 64,
) -> DataFrame:
    """Fused decode + feature stage (r13, guide §4): one mapInPandas
    emits decode_images' width/height/channels/px_mean/px_std AND
    image_features' L2-normalized array<float> — the binary content
    column crosses the Arrow boundary ONCE instead of twice and the
    plan carries one Python stage instead of two. Output is
    bit-identical to ``image_features(decode_images(df))`` (property-
    tested): meta keeps decode_images' tiers (PIL → stdlib → fake;
    when PIL is present the stdlib decode still feeds the features,
    exactly as the two-stage form), features keep image_features'
    tiers (stdlib pixels → perceptual thumbnail; else byte-hash
    fake)."""
    from vectordb_light_spark.sources.media import decode_image

    pil = _try_pil()
    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema
    )
    schema = (
        f"{fields}, width int, height int, channels int, "
        f"px_mean double, px_std double, `{out_col}` array<float>"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in batches:
            metas, feats = [], []
            for data in pdf[content_col]:
                raw = bytes(data) if data is not None else b""
                px = decode_image(raw)
                if pil is not None:
                    img = pil.open(io.BytesIO(raw))
                    arr = np.asarray(img)
                    metas.append(
                        {
                            "width": img.width,
                            "height": img.height,
                            "channels": arr.shape[2] if arr.ndim == 3 else 1,
                            "px_mean": float(arr.mean()),
                            "px_std": float(arr.std()),
                        }
                    )
                elif px is not None:
                    metas.append(
                        {
                            "width": int(px.shape[1]),
                            "height": int(px.shape[0]),
                            "channels": int(px.shape[2]),
                            "px_mean": float(px.mean()),
                            "px_std": float(px.std()),
                        }
                    )
                else:
                    metas.append(_fake_decode(raw))
                feats.append(
                    _pixel_features(px, dim)
                    if px is not None
                    else _fake_features(raw, dim)
                )
            out = pdf.copy()
            for k in ("width", "height", "channels", "px_mean", "px_std"):
                out[k] = [m[k] for m in metas]
            out[out_col] = feats
            yield out

    return df.mapInPandas(run, schema=schema)


def _pixel_features(px: np.ndarray, dim: int) -> np.ndarray:
    """REAL pixel features for stdlib-decodable images: 16×16
    nearest-resampled grayscale tile, folded into ``dim`` bins and
    L2-normalized — the classic perceptual-thumbnail descriptor
    (near-dup image detection), same shape/dtype contract a trained
    vision encoder would return."""
    from vectordb_light_spark.sources.media import resize_nearest

    gray = px.astype(np.float32).mean(axis=2) if px.ndim == 3 else px.astype(np.float32)
    tile = resize_nearest(gray, 16, 16).reshape(-1)
    tile = tile - tile.mean()
    out = np.zeros(dim, dtype=np.float32)
    np.add.at(out, np.arange(tile.size) % dim, tile)
    n = float(np.linalg.norm(out))
    return out / max(n, 1e-12)


def _dhash_bits(px: np.ndarray) -> int:
    """64-bit difference hash (dHash, the classic perceptual image
    fingerprint): grayscale → 9×8 area grid → bit (r·8+c) set iff
    grid[r][c] > grid[r][c+1]. Grayscale is the integer CHANNEL SUM
    (monotone in intensity, keeps integer exactness); when the image
    divides evenly into the 9×8 grid the cells are exact integer
    block sums (the oracle-twinnable regime), otherwise float area
    means over floor-boundary blocks — same hash contract either way.
    Returns a signed 64-bit int (bit 63 wraps negative)."""
    gray = (
        px.astype(np.int64).sum(axis=2) if px.ndim == 3 else px.astype(np.int64)
    )
    h, w = gray.shape
    if w % 9 == 0 and h % 8 == 0:
        bw, bh = w // 9, h // 8
        grid = gray.reshape(8, bh, 9, bw).sum(axis=(1, 3))
    else:
        ys = [int(i * h / 8) for i in range(9)]
        xs = [int(j * w / 9) for j in range(10)]
        grid = np.array(
            [
                [
                    float(gray[ys[r]:max(ys[r + 1], ys[r] + 1),
                               xs[c]:max(xs[c + 1], xs[c] + 1)].mean())
                    for c in range(9)
                ]
                for r in range(8)
            ]
        )
    # Vectorized bit pack (r13): identical word to the former
    # per-bit loop — distinct powers of two, so the uint64 sum is
    # exact; wrap to signed via the same astype(int64).
    cmp = np.asarray(grid)[:, :8] > np.asarray(grid)[:, 1:9]
    weights = np.left_shift(
        np.uint64(1), np.arange(64, dtype=np.uint64)
    ).reshape(8, 8)
    bits = np.uint64((cmp.astype(np.uint64) * weights).sum(dtype=np.uint64))
    return int(bits.astype(np.int64))


def image_dhash(
    df: DataFrame,
    *,
    content_col: str = "content",
    out_col: str = "dhash",
) -> DataFrame:
    """Perceptual-hash stage: binary image → 64-bit dHash long.

    Tiers mirror :func:`image_features`: stdlib BMP/PNG/JPEG/GIF
    pixels → REAL dHash; undecodable bytes → a deterministic
    splitmix-style byte-hash fake (never NULL, so downstream blocking
    stays total). Feed the output to
    :func:`~vectordb_light_spark.operators.dedup.hamming_near_dup_pairs`
    for banded near-dup candidate pairs — the image-modality twin of
    SimHash text dedup."""
    from vectordb_light_spark.sources.media import decode_image

    fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema)
    schema = f"{fields}, `{out_col}` long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        for pdf in batches:
            hashes = []
            for d in pdf[content_col]:
                raw = bytes(d) if d is not None else b""
                px = decode_image(raw)
                if px is not None:
                    hashes.append(_dhash_bits(px))
                else:
                    digest = _hl.md5(raw).digest()[:8]
                    hashes.append(
                        int.from_bytes(digest, "big", signed=True)
                    )
            out = pdf.copy()
            out[out_col] = hashes
            yield out

    return df.mapInPandas(run, schema=schema)


def image_features(
    df: DataFrame, *, content_col: str = "content", out_col: str = "features", dim: int = 64
) -> DataFrame:
    """Feature-extraction stage: binary → L2-normalized array<float>.

    Per-row tiers: stdlib BMP/PNG pixels → perceptual-thumbnail
    descriptor (REAL pixel features, near-dup-image grade); other
    formats → the deterministic byte-hash fake. A trained vision
    encoder (not available in this container) would slot into the
    same mapInPandas stage; downstream similarity/ANN operators
    compose with media exactly as with text embeddings either way."""
    from vectordb_light_spark.sources.media import decode_image

    fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema)
    schema = f"{fields}, `{out_col}` array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for d in pdf[content_col]:
                raw = bytes(d) if d is not None else b""
                px = decode_image(raw)
                feats.append(
                    _pixel_features(px, dim)
                    if px is not None
                    else _fake_features(raw, dim)
                )
            out = pdf.copy()
            out[out_col] = feats
            yield out

    return df.mapInPandas(run, schema=schema)


def resize_images(
    df: DataFrame, width: int, height: int, *, content_col: str = "content"
) -> DataFrame:
    """Resize stage: content replaced by the resized rendition, dims
    recorded. Tiers: PIL → stdlib decode + nearest-neighbor resample
    re-encoded in the SAME format (BMP→BMP, PNG→PNG) → byte-volume
    fake for undecodable formats."""
    from vectordb_light_spark.sources.media import (
        bmp_encode,
        decode_image,
        png_encode,
        resize_nearest,
        sniff_format,
    )

    pil = _try_pil()
    fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema)
    schema = f"{fields}, resized_width int, resized_height int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in batches:
            outs = []
            for data in pdf[content_col]:
                raw = bytes(data) if data is not None else b""
                px = None if pil is not None else decode_image(raw)
                if pil is not None:
                    img = pil.open(io.BytesIO(raw)).resize((width, height))
                    buf = io.BytesIO()
                    img.save(buf, format="PNG")
                    outs.append(buf.getvalue())
                elif px is not None:
                    small = resize_nearest(px, width, height)
                    enc = png_encode if sniff_format(raw) == "png" else bmp_encode
                    outs.append(enc(small))
                else:
                    outs.append(_fake_resize(raw, width, height))
            out = pdf.copy()
            out[content_col] = outs
            out["resized_width"] = width
            out["resized_height"] = height
            yield out

    return df.mapInPandas(run, schema=schema)


def sample_frames(
    df: DataFrame,
    *,
    every_ms: int = 1000,
    content_col: str = "content",
    meta_col: str = "media_meta",
    with_bytes: bool = True,
) -> DataFrame:
    """Frame-sampling stage for video rows: one output row per sampled
    frame at ``every_ms`` intervals (frame_index, frame_ts_ms, and —
    with ``with_bytes`` — frame_bytes).

    The frame COUNT and timestamps are pure builtins over
    media_meta.duration_ms — real plumbing; ``with_bytes=False``
    skips the per-frame byte stage entirely (pure codegen, and column
    pruning then drops the binary content from the scan), which is
    what count/metadata consumers should use.

    Frame EXTRACTION tiers (r4): MJPEG-AVI rows return the REAL
    stored JPEG stream nearest ``frame_ts_ms`` (sources/media.py
    avi_parse — zero re-encode), animated-GIF rows the composed frame
    at that timestamp PNG-encoded (gif_decode); other codecs fall to
    the documented deterministic fake (no stdlib decoder exists).
    Exploded rows of one video land in the same Arrow batch, so the
    container is parsed once per (video, batch), not once per frame.
    """
    n_frames = F.greatest(
        (F.col(f"{meta_col}.duration_ms") / every_ms).cast("int"), F.lit(1)
    )
    exploded = df.withColumn(
        "frame_index", F.explode(F.sequence(F.lit(0), n_frames - 1))
    ).withColumn("frame_ts_ms", F.col("frame_index") * every_ms)
    if not with_bytes:
        return exploded

    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in exploded.schema
    )
    schema = f"{fields}, frame_bytes binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from vectordb_light_spark.sources.media import (
            avi_parse,
            gif_decode,
            png_encode,
            sniff_format,
        )

        for pdf in batches:
            frames = []
            parsed: dict[bytes, object] = {}  # per-batch container memo
            for data, idx, ts in zip(
                pdf[content_col], pdf["frame_index"], pdf["frame_ts_ms"]
            ):
                raw = bytes(data) if data is not None else b""
                if not raw:
                    frames.append(b"")
                    continue
                fmt = sniff_format(raw)
                try:
                    if fmt == "avi":
                        if raw not in parsed:
                            parsed[raw] = avi_parse(raw)
                        v = parsed[raw]
                        fi = min(
                            int(round(float(ts) / 1000.0 * v["fps"])),
                            v["n_frames"] - 1,
                        )
                        frames.append(v["frames"][fi])
                        continue
                    if fmt == "gif":
                        if raw not in parsed:
                            fr, delays = gif_decode(raw)
                            # zero-delay frames (no/empty GCE) still
                            # occupy a timeline slot, else every ts
                            # would map to the last frame
                            starts = np.cumsum(
                                [0] + [max(d, 1) for d in delays[:-1]]
                            )
                            parsed[raw] = (fr, [png_encode(f) for f in fr], starts)
                        fr, pngs, starts = parsed[raw]
                        fi = int(np.searchsorted(starts, float(ts), "right") - 1)
                        frames.append(pngs[max(fi, 0)])
                        continue
                except (ValueError, struct.error, IndexError):
                    pass  # corrupt/truncated container → fake tier below
                # fake: a deterministic 64-byte window per frame index
                start = (int(idx) * 97) % max(len(raw), 1)
                frames.append((raw * 2)[start : start + 64])
            out = pdf.copy()
            out["frame_bytes"] = frames
            yield out

    return exploded.mapInPandas(run, schema=schema)


def audio_features(
    df: DataFrame,
    *,
    n_bands: int = 16,
    max_samples: int = 65536,
    content_col: str = "content",
) -> DataFrame:
    """Spectral feature extraction for audio rows (r4): adds
    ``features array<float>`` (log band energies, L2-normalized),
    ``rms double``, ``dominant_band int`` (band of the FFT argmax
    bin), ``peak_hz double``, and ``sr int``.

    Real tier: WAV content decodes through the stdlib ``wave`` module
    to mono float, a power spectrum over the first ``max_samples``
    frames comes from ``numpy.fft.rfft`` (real DSP, no third-party
    deps), and the band energies split the 0..Nyquist range into
    ``n_bands`` equal slices. Non-WAV formats fall to the
    deterministic byte-hash fake with sentinel scalars (rms/peak -1,
    band -1), mirroring image_features — except that MP3 rows get a
    REAL ``sr`` from the frame-header chain
    (:func:`~vectordb_light_spark.sources.media.mp3_metadata`; PCM
    decode is the only part out of stdlib scope).

    Scale: map-only Arrow stage, bounded per row by ``max_samples``
    regardless of clip length; binary rides the scan like any column.
    """
    fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema)
    schema = (
        f"{fields}, features array<float>, rms double, "
        "dominant_band int, peak_hz double, sr int"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from vectordb_light_spark.sources.media import (
            mp3_metadata,
            sniff_format,
            wav_decode,
        )

        for pdf in batches:
            feats, rmss, bands, peaks, srs = [], [], [], [], []
            for data in pdf[content_col]:
                raw = bytes(data) if data is not None else b""
                decoded = None
                fmt = sniff_format(raw)
                if fmt == "wav":
                    try:
                        decoded = wav_decode(raw)
                    except (ValueError, EOFError, struct.error, IndexError):
                        decoded = None
                if decoded is None:
                    # r5: MP3 PCM decode stays out of stdlib scope, but
                    # the frame headers parse for real — fake features
                    # keep a REAL sample rate for MP3 rows.
                    sr_real = -1
                    if fmt == "mp3":
                        try:
                            sr_real = int(mp3_metadata(raw)["sample_rate"])
                        except (ValueError, KeyError, IndexError):
                            sr_real = -1
                    feats.append(_fake_features(raw, n_bands))
                    rmss.append(-1.0)
                    bands.append(-1)
                    peaks.append(-1.0)
                    srs.append(sr_real)
                    continue
                samples, sr = decoded
                mono = samples.astype(np.float64).mean(axis=1)
                if samples.dtype.itemsize == 1:
                    # 8-bit WAV PCM is unsigned 0..255: center on the
                    # 128 midpoint before scaling, or silence carries a
                    # ~1.0 DC offset that dominates rms and band-0.
                    mono = (mono - 128.0) / 128.0
                else:
                    mono /= (
                        32768.0
                        if samples.dtype.itemsize == 2
                        else 2147483648.0
                    )
                mono = mono[:max_samples]
                n = len(mono)
                if n == 0:
                    feats.append(_fake_features(raw, n_bands))
                    rmss.append(0.0)
                    bands.append(-1)
                    peaks.append(-1.0)
                    srs.append(int(sr))
                    continue
                power = np.abs(np.fft.rfft(mono)) ** 2
                freqs = np.fft.rfftfreq(n, d=1.0 / sr)
                nyq = sr / 2.0
                # band of the argmax bin (DC excluded so silence-plus-
                # offset clips don't all land in band 0)
                k = 1 + int(np.argmax(power[1:])) if len(power) > 1 else 0
                band = min(int(freqs[k] // (nyq / n_bands)), n_bands - 1)
                edges = np.minimum(
                    (freqs // (nyq / n_bands)).astype(int), n_bands - 1
                )
                be = np.zeros(n_bands)
                np.add.at(be, edges, power)
                v = np.log1p(be)
                norm = float(np.linalg.norm(v))
                feats.append((v / norm if norm > 0 else v).astype(np.float32))
                rmss.append(float(np.sqrt(np.mean(mono**2))))
                bands.append(band)
                peaks.append(float(freqs[k]))
                srs.append(int(sr))
            out = pdf.copy()
            out["features"] = feats
            out["rms"] = rmss
            out["dominant_band"] = bands
            out["peak_hz"] = peaks
            out["sr"] = srs
            yield out

    return df.mapInPandas(run, schema=schema)


# ---------------------------------------------------------------------------
# Test-table synthesis (no binary tables ship in the driver testdata)
# ---------------------------------------------------------------------------


def media_from_documents(
    spark: SparkSession, sf_dir: str, *, kind: str = "image", limit: int | None = None
) -> DataFrame:
    """Deterministic media table derived from the documents parquet:
    content = UTF-8 bytes of the text, metadata from text stats. Gives
    the media stages a reproducible input at every scale factor."""
    from vectordb_light_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    if limit:
        docs = docs.orderBy("doc_id").limit(limit)
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            F.lit("raw").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("channels"),
            F.lit(16000).alias("sample_rate"),
            (F.length("text") * 10).cast("int").alias("duration_ms"),
        ).alias("media_meta"),
    )


def audio_windows(
    df: DataFrame,
    *,
    window_ms: int = 5000,
    hop_ms: int = 2500,
    content_col: str = "content",
    meta_col: str = "media_meta",
    with_pcm: bool = True,
) -> DataFrame:
    """Audio segmentation: one row per fixed-length window with
    ``hop_ms`` stride — the audio analogue of the text chunker (T3),
    the unit a speech/audio training pipeline embeds.

    Window COUNT and boundaries are pure builtins over
    ``media_meta.duration_ms`` (starts 0, hop, … < duration;
    ``win_end_ms`` clamped to the clip) — real, oracle-checkable
    plumbing. PCM EXTRACTION (``with_pcm=True``) tiers per row: WAV
    content decodes through the stdlib ``wave`` module and each
    window's bytes are the REAL sample frames for its time span
    (re-encoded as a standalone WAV clip at the source rate);
    non-WAV formats (MP3 etc. — no stdlib codec) fall back to the
    deterministic proportional byte slice, keeping the mapInPandas
    batch shape and schema contract a real decoder would have.
    """
    duration = F.col(f"{meta_col}.duration_ms")
    n_windows = F.ceil(duration / F.lit(hop_ms)).cast("int")
    # A zero-duration clip yields ZERO windows (explode of an empty
    # array drops the row) — matching range(0, duration, hop)
    # semantics. NB: sequence(0, -1) would generate a DESCENDING
    # [0, -1], so the n==0 case must be an explicit empty array.
    exploded = (
        df.withColumn(
            "window_index",
            F.explode(
                F.when(
                    n_windows > 0, F.sequence(F.lit(0), n_windows - 1)
                ).otherwise(F.array().cast("array<int>"))
            ),
        )
        .withColumn("win_start_ms", F.col("window_index") * hop_ms)
        .withColumn(
            "win_end_ms", F.least(F.col("win_start_ms") + window_ms, duration)
        )
    )
    if not with_pcm:
        return exploded

    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in exploded.schema
    )
    schema = f"{fields}, window_bytes binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from vectordb_light_spark.sources.media import (
            sniff_format,
            wav_decode,
            wav_encode,
        )

        # per-batch decode memo: one clip explodes into many window
        # rows, but the WAV should inflate once per Arrow batch
        memo: dict[bytes, tuple] = {}
        for pdf in batches:
            outs = []
            for data, lo, hi, dur in zip(
                pdf[content_col],
                pdf["win_start_ms"],
                pdf["win_end_ms"],
                (pdf[meta_col].apply(lambda mm: mm["duration_ms"])),
            ):
                raw = bytes(data) if data is not None else b""
                if not raw or not dur:
                    outs.append(b"")
                    continue
                if sniff_format(raw) == "wav":
                    hit = memo.get(raw)
                    if hit is None:
                        try:
                            hit = wav_decode(raw)
                        except Exception:  # malformed RIFF → stub path
                            hit = (None, 0)
                        memo[raw] = hit
                    samples, rate = hit
                    if samples is not None:
                        a = int(rate * int(lo) / 1000)
                        b = int(rate * int(hi) / 1000)
                        b = min(max(b, a + 1), samples.shape[0])
                        outs.append(wav_encode(samples[a:b], rate))
                        continue
                a = int(len(raw) * int(lo) / int(dur))
                b = int(len(raw) * int(hi) / int(dur))
                outs.append(raw[a:max(b, a + 1)])
            out = pdf.copy()
            out["window_bytes"] = outs
            yield out

    return exploded.mapInPandas(run, schema=schema)
