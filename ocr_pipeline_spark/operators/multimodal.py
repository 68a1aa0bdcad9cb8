"""Multimodal (image/audio/video) column operators — Spark plumbing real,
codec decode stubbed.

Media travel as opaque ``binary`` columns with typed metadata structs,
processed in Arrow batches via mapInPandas — the same physical pattern
as the html kernel.  The container ships no image/audio codecs, so the
decode step is isolated behind `_decode_image` / `_decode_audio`: with
PIL/soundfile installed those become real decoders; here they fall back
to a deterministic header parser (dimensions from PNG/JPEG/GIF headers,
duration from WAV headers) so every downstream op — schema, batching,
partitioning, feature shape — is real and tested end to end.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

IMAGE_META_DDL = (
    "struct<format:string,width:int,height:int,n_bytes:bigint,sha1:string>"
)
IMAGE_FEATURES_DDL = "array<float>"
AUDIO_META_DDL = (
    "struct<format:string,sample_rate:int,n_channels:int,"
    "n_frames:bigint,n_bytes:bigint>"
)

try:  # pragma: no cover - codec libs absent in this container
    from PIL import Image as _PIL_Image  # type: ignore

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


# --- header-level parsing (deterministic, no codecs) ------------------------
def probe_image(data: bytes | None) -> dict:
    """Container-format probe from magic bytes + header fields."""
    if not data:
        return {"format": "empty", "width": 0, "height": 0,
                "n_bytes": 0, "sha1": ""}
    fmt, width, height = "unknown", 0, 0
    if data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) >= 24:
        fmt = "png"
        width, height = struct.unpack(">II", data[16:24])
    elif data[:2] == b"\xff\xd8":
        fmt = "jpeg"
        i = 2
        while i + 9 < len(data):
            if data[i] != 0xFF:
                break
            marker = data[i + 1]
            seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
            if marker in (0xC0, 0xC1, 0xC2, 0xC3):
                height, width = struct.unpack(">HH", data[i + 5 : i + 9])
                break
            i += 2 + seg_len
    elif data[:6] in (b"GIF87a", b"GIF89a") and len(data) >= 10:
        fmt = "gif"
        width, height = struct.unpack("<HH", data[6:10])
    return {
        "format": fmt,
        "width": int(width),
        "height": int(height),
        "n_bytes": len(data),
        "sha1": hashlib.sha1(data).hexdigest(),
    }


def probe_audio(data: bytes | None) -> dict:
    if not data:
        return {"format": "empty", "sample_rate": 0, "n_channels": 0,
                "n_frames": 0, "n_bytes": 0}
    fmt, rate, channels, frames = "unknown", 0, 0, 0
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE" and len(data) >= 36:
        fmt = "wav"
        channels = struct.unpack("<H", data[22:24])[0]
        rate = struct.unpack("<I", data[24:28])[0]
        bits = struct.unpack("<H", data[34:36])[0] or 16
        frames = max(len(data) - 44, 0) // max(channels * bits // 8, 1)
    return {
        "format": fmt, "sample_rate": int(rate), "n_channels": int(channels),
        "n_frames": int(frames), "n_bytes": len(data),
    }


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(data: bytes) -> "np.ndarray":
    """Minimal pure-Python PNG decoder: zlib inflate + per-scanline
    unfilter (filters 0-4), palette expansion.  Supports bit depth 8,
    color types 0/2/3/4/6, no interlace — the overwhelming majority of
    web PNGs.  Returns an (H, W, C) uint8 array; raises ValueError on
    malformed or unsupported input.  This makes the PNG pixel path real
    without any codec dependency (zlib is stdlib)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat, plte = 8, [], None
    w = h = depth = color = interlace = None
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos : pos + 4]), data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        if len(chunk) < length:
            raise ValueError("truncated chunk")
        if ctype == b"IHDR":
            if length != 13:
                raise ValueError("bad IHDR")
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
        elif ctype == b"PLTE":
            plte = np.frombuffer(chunk, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG (depth={depth} color={color} "
                         f"interlace={interlace})")
    # decode-bomb guards: header-declared dimensions drive allocations,
    # and IDAT is a deflate stream (a few KB can inflate to GBs) — cap
    # both BEFORE touching pixel memory, mirroring imagecodecs/_MAX_PIXELS
    # and dom.decode_html's gzip cap
    if w <= 0 or h <= 0 or w * h > (1 << 26):
        raise ValueError(f"implausible PNG dimensions {w}x{h}")
    nch = _PNG_CHANNELS[color]
    stride = w * nch
    max_raw = h * (stride + 1)
    d = zlib.decompressobj()
    raw = d.decompress(b"".join(idat), max_raw)
    if len(raw) < h * (stride + 1):
        raise ValueError("short pixel data")
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int64)
    for y in range(h):
        base = y * (stride + 1)
        f = raw[base]
        line = np.frombuffer(raw[base + 1 : base + 1 + stride], np.uint8).astype(
            np.int64
        )
        if f == 0:
            cur = line
        elif f == 2:  # Up — fully vectorized
            cur = (line + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub/Average/Paeth need the left neighbor
            cur = line.copy()
            for x in range(stride):
                a = cur[x - nch] if x >= nch else 0
                b = prev[x]
                if f == 1:
                    cur[x] = (cur[x] + a) & 0xFF
                elif f == 3:
                    cur[x] = (cur[x] + (a + b) // 2) & 0xFF
                else:  # Paeth
                    c = prev[x - nch] if x >= nch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad filter byte {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    px = out.reshape(h, w, nch)
    if color == 3:  # palette
        if plte is None:
            raise ValueError("palette image without PLTE")
        px = plte[px[:, :, 0]]
    return px


def _decode_image(data: bytes):
    """Pixel decode: PIL when installed; otherwise the pure-Python
    decoders — PNG (above), baseline + progressive JPEG and GIF
    (operators/imagecodecs.py).  Returns (H, W, C) uint8; ValueError on
    malformed/unsupported payloads (arithmetic JPEG, webp, ...), which
    image_features degrades to the byte-histogram fallback."""
    if _HAVE_PIL:  # pragma: no cover
        import io

        return np.asarray(_PIL_Image.open(io.BytesIO(data)).convert("RGB"))
    if data[:8] == _PNG_SIG:
        return decode_png(data)
    if data[:2] == b"\xff\xd8":
        from ocr_pipeline_spark.operators.imagecodecs import decode_jpeg

        return decode_jpeg(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        from ocr_pipeline_spark.operators.imagecodecs import decode_gif

        return decode_gif(data)
    raise ValueError("unsupported image container")


def image_features(data: bytes | None, dim: int = 16) -> list[float]:
    """Deterministic feature vector: for decodable images, a normalized
    luminance histogram folded to `dim` buckets (real pixel features —
    PNG decodes here codec-free); otherwise a byte-value histogram with
    the same schema and batch shape, so the Spark plumbing is identical
    either way."""
    if not data:
        return [round(0.0, 6)] * dim
    try:
        px = _decode_image(data).astype(np.uint32)
        lum = (
            (px[:, :, 0] * 299 + px[:, :, 1] * 587 + px[:, :, 2] * 114) // 1000
            if px.shape[2] >= 3
            else px[:, :, 0]
        )
        counts = np.bincount((lum.ravel() * dim) // 256, minlength=dim)[:dim]
    except (
        NotImplementedError,
        ValueError,
        IndexError,
        KeyError,       # garbage JPEG: scan referencing an undeclared table
        struct.error,
        zlib.error,     # corrupt deflate inside a PNG
    ):
        counts = np.bincount(
            np.frombuffer(data, np.uint8) % dim, minlength=dim
        )[:dim]
    total = int(counts.sum()) or 1
    return [round(float(c) / total, 6) for c in counts]


# --- Arrow-batched operators ---------------------------------------------
def image_meta_kernel(bin_col: str = "media", out_col: str = "image_meta"):
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [probe_image(d) for d in pdf[bin_col]]
            yield pdf

    return kernel


def image_features_kernel(
    bin_col: str = "media", out_col: str = "features", dim: int = 16
):
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [image_features(d, dim) for d in pdf[bin_col]]
            yield pdf

    return kernel


def frame_sample_kernel(
    bin_col: str = "media", out_col: str = "frames", every_n_bytes: int = 4096
):
    """Video frame-sampling analog: emit one sample struct per N-byte
    stride (with codecs: one decoded frame per N frames; same shape)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [
                [
                    {"offset": off, "sha1": hashlib.sha1(
                        (d or b"")[off : off + 64]).hexdigest()[:16]}
                    for off in range(0, len(d or b""), every_n_bytes)
                ]
                for d in pdf[bin_col]
            ]
            yield pdf

    return kernel


FRAMES_DDL = "array<struct<offset:bigint,sha1:string>>"
