"""Pure-stdlib media decoders: BMP, PNG (zlib), WAV (wave module).

Round-2 shipped the multimodal stages with deterministic fakes behind
a PIL/cv2/librosa gate; this module ungates the formats that need no
third-party library at all — the same move that ungated PDF (ISO
32000) and XLS (BIFF8) via from-scratch parsers. Everything here is
written from the public format specifications:

- BMP: BITMAPFILEHEADER + BITMAPINFOHEADER (Windows GDI docs),
  uncompressed 8/24/32-bit, bottom-up or top-down rows, 4-byte row
  padding.
- PNG: RFC 2083 / W3C PNG spec — IHDR/IDAT/IEND chunks, zlib
  inflate, scanline filters 0-4 (None/Sub/Up/Average/Paeth),
  8-bit gray/RGB/RGBA/gray+alpha.
- WAV: RIFF PCM via the stdlib ``wave`` module (8/16/32-bit int
  PCM), decoded to [n_frames, channels] numpy.
- JPEG (r4): baseline sequential DCT per ITU-T T.81 + JFIF — marker
  parse, canonical Huffman from the stream's own DHT, dequantize +
  IDCT, 4:4:4/4:2:2/4:2:0 sampling, restart intervals; encoder emits
  baseline 4:4:4 with the spec's Annex-K example tables.
- AVI (r4): RIFF container walk per Microsoft's AVI RIFF reference —
  avih/strh timing, LIST movi frame chunks; MJPEG chunks are complete
  JPEG streams fed to jpeg_decode, making video frame sampling REAL.
- GIF (r4): GIF87a/89a per the W3C/CompuServe spec — variable-width
  LZW, global/local color tables, interlace, transparency, disposal;
  animated GIFs double as a second real video-frame source.

Decoders return numpy pixel/sample arrays, so the Spark stages
(operators/multimodal.py) compute REAL statistics, features, resizes,
frame samples, and PCM windows for these formats and fall back to the
documented fakes only for formats with no stdlib path (MP3, non-MJPEG
video codecs, and progressive/arithmetic JPEG variants).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

__all__ = [
    "sniff_format",
    "decode_image",
    "bmp_decode",
    "bmp_encode",
    "png_decode",
    "png_encode",
    "jpeg_decode",
    "jpeg_encode",
    "wav_decode",
    "wav_encode",
    "avi_parse",
    "avi_encode",
    "gif_decode",
    "gif_encode",
    "resize_nearest",
]


def sniff_format(data: bytes) -> str | None:
    """Magic-byte sniff for the formats this module decodes."""
    if data[:2] == b"BM":
        return "bmp"
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return "avi"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:3] == b"ID3" or (
        len(data) >= 4
        and data[0] == 0xFF
        and (data[1] & 0xE0) == 0xE0
        and _mp3_frame_header(data, 0) is not None
    ):
        return "mp3"
    return None


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------


def bmp_decode(data: bytes) -> np.ndarray:
    """Uncompressed BMP → uint8 array [H, W, C] (C = 3 or 4; 8-bit
    palettized files are mapped through their color table to RGB).
    Handles bottom-up (positive height) and top-down rows and the
    4-byte row padding. Raises ValueError on compressed/unsupported
    variants — including BI_BITFIELDS (compression=3), whose channel
    masks this decoder does not parse; assuming fixed BGR(A) order
    there would return wrong pixels for externally-produced files, so
    such inputs fall through to the caller's documented fallback tier
    instead."""
    if data[:2] != b"BM" or len(data) < 54:
        raise ValueError("not a BMP file")
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    width, height = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if compression != 0 or bpp not in (8, 24, 32):
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    topdown = height < 0
    height = abs(height)
    nch = bpp // 8
    row_bytes = (width * nch + 3) & ~3
    need = pixel_off + row_bytes * height
    if len(data) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(
        data, dtype=np.uint8, count=row_bytes * height, offset=pixel_off
    ).reshape(height, row_bytes)
    px = rows[:, : width * nch].reshape(height, width, nch)
    if not topdown:
        px = px[::-1]
    if bpp == 8:
        # mandatory BGRX color table between the info header and the
        # pixel data; biClrUsed (offset 46) of 0 means the full 256
        n_colors = struct.unpack_from("<I", data, 46)[0] or 256
        pal_off = 14 + hdr_size
        if pal_off + 4 * n_colors > pixel_off:
            raise ValueError("truncated BMP color table")
        pal = np.frombuffer(
            data, dtype=np.uint8, count=4 * n_colors, offset=pal_off
        ).reshape(n_colors, 4)[:, [2, 1, 0]]  # BGRX → RGB
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= n_colors:
            raise ValueError("BMP palette index out of range")
        return np.ascontiguousarray(pal[idx])
    px = px[:, :, [2, 1, 0] + ([3] if nch == 4 else [])]  # BGR(A) → RGB(A)
    return np.ascontiguousarray(px)


def bmp_encode(px: np.ndarray) -> bytes:
    """uint8 [H, W, 3] (or [H, W] gray, upcast to RGB) → 24-bit BMP."""
    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 3 and px.shape[2] == 1:
        px = px[:, :, 0]
    if px.ndim == 2:
        px = np.repeat(px[:, :, None], 3, axis=2)
    if px.ndim != 3 or px.shape[2] < 3:
        raise ValueError(f"need [H, W, >=3], got {px.shape}")
    h, w = px.shape[:2]
    bgr = px[:, :, [2, 1, 0]]
    row_bytes = (w * 3 + 3) & ~3
    pad = row_bytes - w * 3
    body = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up
        body += bgr[r].tobytes() + b"\x00" * pad
    pixel_off = 14 + 40
    size = pixel_off + len(body)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, pixel_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + bytes(body)


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type → samples/px


def png_decode(data: bytes) -> np.ndarray:
    """8-bit PNG (gray / RGB / gray+alpha / RGBA, non-interlaced) →
    uint8 [H, W, C]. Implements zlib inflate + the five scanline
    filters per the W3C spec."""
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG file")
    pos, width = 8, None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack_from(">I", data, pos), data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", chunk)
            )
            if bit_depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
                raise ValueError(
                    f"unsupported PNG: depth={bit_depth} color={color_type} "
                    f"interlace={interlace}"
                )
            nch = _PNG_CHANNELS[color_type]
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = width * nch
    if len(raw) < (stride + 1) * height:
        raise ValueError("truncated PNG scanlines")
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = nch  # bytes per pixel at depth 8
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need a scan
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ftype == 1:
                    val = line[x] + a
                elif ftype == 3:
                    val = line[x] + (a + b) // 2
                else:
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    val = line[x] + pred
                cur[x] = val & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y] = cur.astype(np.uint8)
    return out.reshape(height, width, nch)


def png_encode(px: np.ndarray) -> bytes:
    """uint8 [H, W, C] (C ∈ 1,2,3,4) → PNG with filter 0 scanlines."""
    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, nch = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[nch]
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------

_WAV_DTYPES = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes → (samples [n_frames, channels], sample_rate).
    8-bit is unsigned per the RIFF spec; 16/32-bit signed LE."""
    with wave.open(io.BytesIO(data), "rb") as f:
        nch, sw, rate, nframes = (
            f.getnchannels(),
            f.getsampwidth(),
            f.getframerate(),
            f.getnframes(),
        )
        if sw not in _WAV_DTYPES:
            raise ValueError(f"unsupported WAV sample width {sw}")
        frames = f.readframes(nframes)
    arr = np.frombuffer(frames, dtype=_WAV_DTYPES[sw])
    return arr.reshape(-1, nch), rate


def wav_encode(samples: np.ndarray, rate: int) -> bytes:
    """[n_frames, channels] int array → PCM WAV bytes (width from the
    array dtype: uint8 / int16 / int32)."""
    samples = np.asarray(samples)
    if samples.ndim == 1:
        samples = samples[:, None]
    sw = samples.dtype.itemsize
    if sw not in _WAV_DTYPES or samples.dtype.kind not in "iu":
        raise ValueError(f"unsupported sample dtype {samples.dtype}")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(samples.shape[1])
        f.setsampwidth(sw)
        f.setframerate(int(rate))
        f.writeframes(np.ascontiguousarray(samples).tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------------------
# MP3 — frame-header METADATA only (r5, verdict #8). An MPEG audio
# PCM decoder (hybrid filterbank + Huffman) is beyond reasonable
# pure-stdlib scope, but the frame headers are a documented fixed
# 32-bit layout (ISO/IEC 11172-3 §2.4.1.3), so duration / bitrate /
# sample rate / channel count are parsed for real; feature extraction
# for MP3 rows stays on the labeled fake tier.
# ---------------------------------------------------------------------------

#: kbps by (version_group, layer, bitrate_index); version_group is
#: 1 for MPEG1, 2 for MPEG2/2.5. Index 0 is "free" (unparseable
#: frame size), 15 is invalid.
_MP3_KBPS = {
    (1, 1): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (1, 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (1, 3): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    (2, 1): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    (2, 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (2, 3): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}

#: Hz by (version_bits, rate_index); version bits: 0=MPEG2.5, 2=MPEG2,
#: 3=MPEG1 (1 is reserved).
_MP3_HZ = {
    3: (44100, 48000, 32000),
    2: (22050, 24000, 16000),
    0: (11025, 12000, 8000),
}


def _mp3_frame_header(data: bytes, off: int) -> dict | None:
    """Parse one MPEG audio frame header at ``off``; None if invalid."""
    if off + 4 > len(data):
        return None
    b0, b1, b2, b3 = data[off], data[off + 1], data[off + 2], data[off + 3]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    version_bits = (b1 >> 3) & 0x3
    layer_bits = (b1 >> 1) & 0x3
    if version_bits == 1 or layer_bits == 0:
        return None
    layer = 4 - layer_bits  # bits 3/2/1 → Layer I/II/III
    bitrate_idx = (b2 >> 4) & 0xF
    rate_idx = (b2 >> 2) & 0x3
    if bitrate_idx in (0, 15) or rate_idx == 3:
        return None  # free/invalid bitrate or reserved rate
    vgroup = 1 if version_bits == 3 else 2
    kbps = _MP3_KBPS[(vgroup, layer)][bitrate_idx]
    hz = _MP3_HZ[version_bits][rate_idx]
    padding = (b2 >> 1) & 0x1
    channel_mode = (b3 >> 6) & 0x3
    if layer == 1:
        samples = 384
        size = (12 * kbps * 1000 // hz + padding) * 4
    else:
        samples = 1152 if (layer == 2 or vgroup == 1) else 576
        size = samples // 8 * kbps * 1000 // hz + padding
    return {
        "kbps": kbps,
        "hz": hz,
        "samples": samples,
        "size": size,
        "channels": 1 if channel_mode == 3 else 2,
        "layer": layer,
        "mpeg_version": {3: "1", 2: "2", 0: "2.5"}[version_bits],
    }


def _mp3_first_frame(data: bytes) -> int | None:
    """Offset of the first frame whose SUCCESSOR also parses (a lone
    sync pattern in arbitrary bytes is common; two chained valid
    headers almost never are), or a valid final frame at EOF."""
    off = 0
    if data[:3] == b"ID3" and len(data) >= 10:
        # ID3v2: 4-byte syncsafe size at bytes 6..9, after a 10-byte
        # header
        size = 0
        for b in data[6:10]:
            size = (size << 7) | (b & 0x7F)
        off = 10 + size
    end = min(len(data) - 4, off + 65536)
    while off <= end:
        h = _mp3_frame_header(data, off)
        if h is not None:
            nxt = off + h["size"]
            if nxt >= len(data) or _mp3_frame_header(data, nxt) is not None:
                return off
        off += 1
    return None


def mp3_metadata(data: bytes, *, max_frames: int = 100_000) -> dict:
    """Walk the frame chain: real duration / mean bitrate / sample
    rate / channels without decoding audio. Raises ValueError when no
    frame chain exists. Bounded per row by ``max_frames``."""
    off = _mp3_first_frame(data)
    if off is None:
        raise ValueError("no MPEG audio frame chain found")
    n = 0
    dur = 0.0
    kbps_sum = 0
    first = _mp3_frame_header(data, off)
    while off + 4 <= len(data) and n < max_frames:
        h = _mp3_frame_header(data, off)
        if h is None:
            break
        n += 1
        dur += h["samples"] / h["hz"]
        kbps_sum += h["kbps"]
        off += h["size"]
    return {
        "sample_rate": first["hz"],
        "channels": first["channels"],
        "n_frames": n,
        "duration_s": dur,
        "bitrate_kbps": kbps_sum / n,
        "layer": first["layer"],
        "mpeg_version": first["mpeg_version"],
    }


# ---------------------------------------------------------------------------
# Shared image helpers
# ---------------------------------------------------------------------------


def decode_image(data: bytes) -> np.ndarray | None:
    """Sniff + decode BMP/PNG/baseline-JPEG/GIF (first frame) to uint8
    [H, W, C]; None when the format has no stdlib decoder or uses an
    unsupported variant (caller falls back to PIL or the fake)."""
    fmt = sniff_format(data)
    try:
        if fmt == "bmp":
            return bmp_decode(data)
        if fmt == "png":
            return png_decode(data)
        if fmt == "jpeg":
            return jpeg_decode(data)
        if fmt == "gif":
            return gif_decode(data)[0][0]
    except (ValueError, struct.error, IndexError):
        # struct.error/IndexError: truncated streams cut inside a
        # header or sub-block chain — same fallback as bad magic
        return None
    return None


def resize_nearest(px: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize — exact, dependency-free, and what a
    training pipeline's thumbnail stage needs (bilinear is a decoder
    swap away)."""
    h, w = px.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return np.ascontiguousarray(px[ys][:, xs])


# ---------------------------------------------------------------------------
# JPEG (baseline sequential DCT, ITU-T T.81 / JFIF)
# ---------------------------------------------------------------------------
# Pure-Python/numpy codec by the same spec-driven pattern as the PNG
# and BMP codecs above: the encoder writes baseline 4:4:4 JFIF with
# the spec's example quantization tables (Annex K.1/K.2) and example
# Huffman tables (Annex K.3), and the decoder reads ANY baseline
# (SOF0) stream — tables come from the file's own DQT/DHT segments,
# arbitrary 1- or 3-component sampling factors (4:4:4 / 4:2:2 / 4:2:0)
# and restart intervals included. Progressive (SOF2) and arithmetic
# coding raise ValueError and fall through to the caller's documented
# fallback tier.

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)

_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64)

# Annex K.3 example Huffman tables: (BITS[1..16], HUFFVAL)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis: F = D @ block @ D.T, inverse
    block = D.T @ F @ D."""
    x = np.arange(8)
    d = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    d[0] /= np.sqrt(2.0)
    return d


_DCT = _dct_matrix()


def _huff_encode_table(bits, vals) -> dict:
    """Canonical Huffman: symbol -> (code, length)."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_table(bits, vals) -> dict:
    """Canonical Huffman: (length, code) -> symbol."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


def _encode_block(w: _BitWriter, coefs: np.ndarray, pred: int, dc_t, ac_t) -> int:
    """Huffman-encode one zigzagged, quantized 64-coef block; returns
    the new DC predictor."""
    dc = int(coefs[0])
    diff = dc - pred
    mag = abs(diff)
    cat = mag.bit_length()
    code, ln = dc_t[cat]
    w.write(code, ln)
    if cat:
        w.write(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
    run = 0
    last_nz = 0
    nz = np.nonzero(coefs[1:])[0]
    last_nz = nz[-1] + 1 if nz.size else 0
    for i in range(1, last_nz + 1):
        v = int(coefs[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_t[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        cat = abs(v).bit_length()
        code, ln = ac_t[(run << 4) | cat]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << cat) - 1, cat)
        run = 0
    if last_nz < 63:
        code, ln = ac_t[0x00]  # EOB
        w.write(code, ln)
    return dc


def jpeg_encode(
    px: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """uint8 [H, W] / [H, W, 1] (grayscale) or [H, W, 3] (RGB) →
    baseline JFIF bytes (Annex-K tables scaled by ``quality`` per the
    widely-published IJG convention). ``subsampling``: ``"444"`` (one
    block per component per MCU) or ``"420"`` (2x2 luma blocks per
    MCU over box-averaged half-resolution chroma — the common camera
    layout, and the coverage path for the decoder's upsampler)."""
    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 3 and px.shape[2] == 1:
        px = px[:, :, 0]
    gray = px.ndim == 2
    if not gray and (px.ndim != 3 or px.shape[2] != 3):
        raise ValueError(f"need [H, W], [H, W, 1] or [H, W, 3], got {px.shape}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be 444|420, got {subsampling}")
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    q = min(max(int(quality), 1), 100)
    scale = 5000 / q if q < 50 else 200 - 2 * q
    qluma = np.clip((_QUANT_LUMA * scale + 50) // 100, 1, 255)
    qchroma = np.clip((_QUANT_CHROMA * scale + 50) // 100, 1, 255)
    qtabs = [qluma, qchroma]

    if gray:
        comps = [(px.astype(np.float64) - 128.0, 1, 1, 0)]
    else:
        r, g, b = (px[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "420":
            # box-average to half resolution (pad odd dims by edge)
            def half(p):
                pp = np.pad(p, ((0, h % 2), (0, w % 2)), mode="edge")
                return (
                    pp[0::2, 0::2] + pp[1::2, 0::2]
                    + pp[0::2, 1::2] + pp[1::2, 1::2]
                ) / 4.0

            comps = [
                (y - 128.0, 2, 2, 0),
                (half(cb) - 128.0, 1, 1, 1),
                (half(cr) - 128.0, 1, 1, 1),
            ]
        else:
            comps = [
                (y - 128.0, 1, 1, 0),
                (cb - 128.0, 1, 1, 1),
                (cr - 128.0, 1, 1, 1),
            ]

    dc_l = _huff_encode_table(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_l = _huff_encode_table(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _huff_encode_table(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _huff_encode_table(_AC_CHROMA_BITS, _AC_CHROMA_VALS)

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    padded = []
    for p, ch, cv, qid in comps:
        ph, pw = mcuy * cv * 8, mcux * ch * 8
        pp = np.pad(
            p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge"
        )
        padded.append((pp, ch, cv, qid))
    writer = _BitWriter()
    preds = [0] * len(comps)
    mcu_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                writer.flush()  # byte-align before the marker
                writer.out += bytes(
                    [0xFF, 0xD0 + (mcu_n // restart_interval - 1) % 8]
                )
                preds = [0] * len(comps)
            mcu_n += 1
            for ci, (p, ch, cv, qid) in enumerate(padded):
                dc_t, ac_t = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        block = p[y0 : y0 + 8, x0 : x0 + 8]
                        coefs = _DCT @ block @ _DCT.T
                        zz = np.round(
                            coefs.ravel()[_ZIGZAG] / qtabs[qid][_ZIGZAG]
                        ).astype(np.int64)
                        preds[ci] = _encode_block(
                            writer, zz, preds[ci], dc_t, ac_t
                        )
    writer.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(int(qluma[z]) for z in _ZIGZAG))
    if not gray:
        out += seg(0xDB, bytes([1]) + bytes(int(qchroma[z]) for z in _ZIGZAG))
    ncomp = len(comps)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci, (_, ch, cv, qid) in enumerate(comps):
        sof += bytes([ci + 1, (ch << 4) | cv, qid])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_LUMA_BITS) + bytes(_DC_LUMA_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(_AC_LUMA_BITS) + bytes(_AC_LUMA_VALS))
    if not gray:
        out += seg(0xC4, bytes([0x01]) + bytes(_DC_CHROMA_BITS) + bytes(_DC_CHROMA_VALS))
        out += seg(0xC4, bytes([0x11]) + bytes(_AC_CHROMA_BITS) + bytes(_AC_CHROMA_VALS))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if (ci == 0 or gray) else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; stops at any
    marker and exposes it for the restart-interval handler."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.marker = None

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG entropy data")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            else:  # a real marker: pad with 1-bits, remember it
                self.marker = nxt
                self.acc = (self.acc << 8) | 0xFF
                self.n += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        """Byte-align, consume the RSTn marker, resume."""
        self.acc, self.n, self.marker = 0, 0, None
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("missing JPEG restart marker")


def _decode_huff(r: _BitReader, table: dict) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, cat: int) -> int:
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def jpeg_decode(data: bytes) -> np.ndarray:
    """Baseline-sequential JPEG (SOF0) → uint8 [H, W, C] (C = 1 or 3).
    Tables are read from the stream's own DQT/DHT segments; arbitrary
    sampling factors (4:4:4 / 4:2:2 / 4:2:0) and restart intervals
    supported; chroma upsampling is nearest-neighbor. Progressive /
    arithmetic / 12-bit streams raise ValueError."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG file")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    comps = None  # list of (id, h, v, tq)
    h = w = None
    restart_interval = 0
    scan = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit JPEG quant tables unsupported")
                tab = np.zeros(64)
                tab[_ZIGZAG] = np.frombuffer(body, np.uint8, 64, i + 1)
                qt[tq] = tab
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                huff[(tc, th)] = _huff_decode_table(bits, vals)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec = body[0]
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            h, w = struct.unpack_from(">HH", body, 1)
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG coding process (SOF{marker - 0xC0})"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tdta = body[1 + 2 * c], body[2 + 2 * c]
                scan.append((cs, tdta >> 4, tdta & 0xF))
            entropy_start = pos
            break
    if comps is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")
    if len(scan) != len(comps):
        raise ValueError("JPEG multi-scan streams unsupported")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {}
    for cid, ch, cv, tq in comps:
        planes[cid] = np.zeros((mcuy * cv * 8, mcux * ch * 8), dtype=np.float64)

    scan_info = []
    for cs, td, ta in scan:
        comp = next(c for c in comps if c[0] == cs)
        scan_info.append((comp, huff[(0, td)], huff[(1, ta)]))

    r = _BitReader(data, entropy_start)
    preds = {c[0][0]: 0 for c in scan_info}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                r.restart()
                preds = {k: 0 for k in preds}
            mcu_count += 1
            for (cid, ch, cv, tq), dc_t, ac_t in scan_info:
                qtab = qt[tq]
                for by in range(cv):
                    for bx in range(ch):
                        zz = np.zeros(64)
                        cat = _decode_huff(r, dc_t)
                        diff = _extend(r.read_bits(cat), cat) if cat else 0
                        preds[cid] += diff
                        zz[0] = preds[cid]
                        k = 1
                        while k < 64:
                            sym = _decode_huff(r, ac_t)
                            if sym == 0x00:  # EOB
                                break
                            run, cat = sym >> 4, sym & 0xF
                            if cat == 0:
                                if run != 15:
                                    raise ValueError("bad JPEG AC symbol")
                                k += 16  # ZRL
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            zz[k] = _extend(r.read_bits(cat), cat)
                            k += 1
                        block = np.zeros(64)
                        # zz holds zigzag-ordered coefficients; qtab is
                        # stored de-zigzagged (natural order, see DQT
                        # parse), so it must be re-indexed into zigzag
                        # order before the element-wise dequantization.
                        block[_ZIGZAG] = zz * qtab[_ZIGZAG]
                        sb = _DCT.T @ block.reshape(8, 8) @ _DCT
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = sb

    # upsample to full geometry, crop, color-convert
    chans = []
    for cid, ch, cv, tq in comps:
        p = planes[cid] + 128.0
        if ch != hmax or cv != vmax:
            p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        chans.append(p[:h, :w])
    if len(chans) == 1:
        out = chans[0][:, :, None]
    elif len(chans) == 3:
        y, cb, cr = chans
        r_ = y + 1.402 * (cr - 128.0)
        g_ = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b_ = y + 1.772 * (cb - 128.0)
        out = np.stack([r_, g_, b_], axis=2)
    else:
        raise ValueError(f"unsupported JPEG component count {len(chans)}")
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# AVI container (Microsoft 'AVI RIFF File Reference'), MJPEG + raw DIB
# ---------------------------------------------------------------------------


def _riff_chunks(data: bytes, off: int, end: int):
    """Yield (fourcc, payload_start, payload_size) walking a RIFF level."""
    while off + 8 <= end:
        fcc = data[off : off + 4]
        size = struct.unpack_from("<I", data, off + 4)[0]
        yield fcc, off + 8, size
        off += 8 + size + (size & 1)  # chunks are word-aligned


def avi_encode(frames: list[bytes], fps: float, width: int, height: int) -> bytes:
    """JPEG frame streams → an AVI RIFF file with one MJPG video
    stream (avih/strh/strf headers + LIST movi '00dc' chunks + idx1),
    per the public AVI RIFF spec. Fixture/sink twin of ``avi_parse``."""
    if not frames or fps <= 0:
        raise ValueError("need >=1 frame and positive fps")
    usec = int(round(1_000_000 / fps))
    n = len(frames)
    maxbuf = max(len(f) for f in frames)

    def chunk(fcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return fcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(fcc: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", fcc + payload)

    avih = struct.pack(
        "<14I", usec, maxbuf * int(round(fps)), 0, 0x10, n, 0, 1, maxbuf,
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0, 1000, int(round(fps * 1000)),
                      0, n, maxbuf, 0, -1)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_payload = b"".join(chunk(b"00dc", f) for f in frames)
    movi = lst(b"movi", movi_payload)
    # idx1: one entry per frame, offsets relative to the 'movi' fourcc
    idx_entries, off = [], 4
    for f in frames:
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) & 1)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_parse(data: bytes) -> dict:
    """AVI bytes → {fps, n_frames, width, height, frames: [bytes]}.

    Walks RIFF levels for the avih header and the LIST movi frame
    chunks ('##dc'/'##db' of stream 00). Frame payloads are returned
    raw (MJPEG chunks are complete JPEG streams — feed jpeg_decode);
    no codec assumption is made here beyond chunk framing."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI file")
    fps, width, height, total = 0.0, 0, 0, 0
    frames: list[bytes] = []
    for fcc, p, sz in _riff_chunks(data, 12, min(len(data), 8 + struct.unpack_from("<I", data, 4)[0])):
        if fcc != b"LIST":
            continue
        kind = data[p : p + 4]
        if kind == b"hdrl":
            for f2, p2, s2 in _riff_chunks(data, p + 4, p + sz):
                if f2 == b"avih" and s2 >= 40:
                    usec, _, _, _, total, _, _, _, width, height = struct.unpack_from(
                        "<10I", data, p2
                    )
                    fps = 1_000_000 / usec if usec else 0.0
                elif f2 == b"LIST" and data[p2 : p2 + 4] == b"strl":
                    for f3, p3, s3 in _riff_chunks(data, p2 + 4, p2 + s2):
                        if f3 == b"strh" and s3 >= 32 and data[p3 : p3 + 4] == b"vids":
                            scale, rate = struct.unpack_from("<II", data, p3 + 20)
                            if scale and rate:
                                fps = rate / scale
        elif kind == b"movi":
            for f2, p2, s2 in _riff_chunks(data, p + 4, p + sz):
                if f2[:2] == b"00" and f2[2:4] in (b"dc", b"db"):
                    frames.append(data[p2 : p2 + s2])
    if not frames:
        raise ValueError("AVI has no stream-00 video frames")
    return {
        "fps": fps or 25.0,
        "n_frames": len(frames) or total,
        "width": width,
        "height": height,
        "frames": frames,
    }


# ---------------------------------------------------------------------------
# GIF (GIF89a specification: LZW-compressed indexed frames)
# ---------------------------------------------------------------------------


def _lzw_decode(min_code: int, data: bytes) -> list[int]:
    """GIF-variant LZW: variable code width starting min_code+1,
    CLEAR/END codes, dictionary capped at 4096 entries."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code + 1
    out: list[int] = []
    prev: bytes | None = None
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                width = min_code + 1
                prev = None
                continue
            if code == end:
                return out
            if code < len(table):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]
            else:
                raise ValueError("corrupt GIF LZW stream")
            out.extend(entry)
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
            prev = entry
            if len(table) >= (1 << width) and width < 12:
                width += 1
    return out


def _lzw_encode(min_code: int, indices: list[int]) -> bytes:
    clear, end = 1 << min_code, (1 << min_code) + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    nxt, width = end + 1, min_code + 1
    emit(clear, width)
    run = b""
    for idx in indices:
        cand = run + bytes([idx])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        if nxt < 4096:
            table[cand] = nxt
            if nxt == (1 << width) and width < 12:
                width += 1
            nxt += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            nxt, width = end + 1, min_code + 1
        run = bytes([idx])
    if run:
        emit(table[run], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def gif_encode(
    frames: list[np.ndarray], delay_ms: int = 100
) -> bytes:
    """uint8 [H, W, 3] frames (<=256 distinct colors across all
    frames) → animated GIF89a with a global color table and one
    full-canvas image per frame. Fixture/sink twin of gif_decode."""
    if not frames:
        raise ValueError("need >=1 frame")
    h, w = frames[0].shape[:2]
    colors: dict[tuple, int] = {}
    for fr in frames:
        if fr.shape[:2] != (h, w) or fr.ndim != 3 or fr.shape[2] != 3:
            raise ValueError("all frames must be [H, W, 3] and same size")
        for c in {tuple(int(v) for v in px) for px in fr.reshape(-1, 3)}:
            colors.setdefault(c, len(colors))
    if len(colors) > 256:
        raise ValueError(f"gif_encode supports <=256 colors, got {len(colors)}")
    depth = max(2, (len(colors) - 1).bit_length())  # GCT size >= 4 entries
    gct = np.zeros(((1 << depth), 3), dtype=np.uint8)
    for rgb, i in colors.items():
        gct[i] = rgb
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) << 4) | (depth - 1), 0, 0)
    out += gct.tobytes()
    if len(frames) > 1:
        # Netscape looping application extension
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    lut = {rgb: i for rgb, i in colors.items()}
    for fr in frames:
        out += b"\x21\xf9\x04" + struct.pack(
            "<BHB", 0x04, max(delay_ms // 10, 1), 0
        ) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        idx = [lut[tuple(int(v) for v in px)] for px in fr.reshape(-1, 3)]
        min_code = max(depth, 2)
        out.append(min_code)
        comp = _lzw_encode(min_code, idx)
        for i in range(0, len(comp), 255):
            blk = comp[i : i + 255]
            out.append(len(blk))
            out += blk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def gif_decode(data: bytes) -> tuple[list[np.ndarray], list[int]]:
    """GIF87a/89a bytes → (frames as uint8 [H, W, 3] composed onto the
    logical canvas, per-frame delays in ms). Honors local color
    tables, interlace, transparency, and disposal methods 0-3."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF file")
    w, h, packed, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    frames: list[np.ndarray] = []
    delays: list[int] = []
    delay_cs, transp, disposal = 0, -1, 0
    while pos < len(data):
        b0 = data[pos]
        pos += 1
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9 and data[pos] >= 4:
                flags = data[pos + 1]
                delay_cs = struct.unpack_from("<H", data, pos + 2)[0]
                transp = data[pos + 4] if flags & 1 else -1
                disposal = (flags >> 2) & 0x7
            while data[pos]:  # skip sub-blocks
                pos += 1 + data[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
        left, top, fw, fh, fpacked = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        table = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            table = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if table is None:
            raise ValueError("GIF frame has no color table")
        min_code = data[pos]
        pos += 1
        comp = bytearray()
        while data[pos]:
            ln = data[pos]
            comp += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = np.array(_lzw_decode(min_code, bytes(comp))[: fw * fh], dtype=np.int32)
        if idx.size < fw * fh:
            raise ValueError("truncated GIF frame data")
        grid = idx.reshape(fh, fw)
        if fpacked & 0x40:  # interlaced: rows in 4 passes
            order = np.concatenate([
                np.arange(0, fh, 8), np.arange(4, fh, 8),
                np.arange(2, fh, 4), np.arange(1, fh, 2),
            ])
            deinter = np.empty_like(grid)
            deinter[order] = grid
            grid = deinter
        prev = canvas.copy()
        region = canvas[top : top + fh, left : left + fw]
        px = table[grid.clip(0, len(table) - 1)]
        if transp >= 0:
            m = grid != transp
            region[m] = px[m]
        else:
            region[:] = px
        frames.append(canvas.copy())
        delays.append(delay_cs * 10)
        if disposal == 2:
            canvas[top : top + fh, left : left + fw] = 0
        elif disposal == 3:
            canvas = prev
        delay_cs, transp, disposal = 0, -1, 0
    if not frames:
        raise ValueError("GIF has no image frames")
    return frames, delays
