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
from collections.abc import Iterator

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


def _decode_image(data: bytes):
    """Pixel decode — real under PIL, NotImplementedError otherwise.
    Feature extraction below never calls this in the stub path."""
    if _HAVE_PIL:  # pragma: no cover
        import io

        return _PIL_Image.open(io.BytesIO(data)).convert("RGB")
    raise NotImplementedError(
        "pixel decode requires PIL; this container ships no codecs "
        "(deterministic header/byte features are used instead)"
    )


def image_features(data: bytes | None, dim: int = 16) -> list[float]:
    """Deterministic byte-level feature vector (the stub embedding): a
    normalized histogram of byte values folded to `dim` buckets.  With
    real codecs this becomes a pixel-statistics / model embedding with
    the SAME schema and batch shape."""
    counts = [0] * dim
    if data:
        for b in data:
            counts[b % dim] += 1
    total = sum(counts) or 1
    return [round(c / total, 6) for c in counts]


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
