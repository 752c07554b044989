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

Decoders return numpy pixel/sample arrays, so the Spark stages
(operators/multimodal.py) compute REAL statistics, features, resizes,
and PCM windows for these formats and fall back to the documented
fakes only for formats with no stdlib path (JPEG, MP3, video).
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
    "wav_decode",
    "wav_encode",
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
# Shared image helpers
# ---------------------------------------------------------------------------


def decode_image(data: bytes) -> np.ndarray | None:
    """Sniff + decode BMP/PNG to uint8 [H, W, C]; None when the format
    has no stdlib decoder (caller falls back to PIL or the fake)."""
    fmt = sniff_format(data)
    try:
        if fmt == "bmp":
            return bmp_decode(data)
        if fmt == "png":
            return png_decode(data)
    except ValueError:
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
