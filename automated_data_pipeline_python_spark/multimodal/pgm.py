"""Binary PGM (P5): a real image codec with zero dependencies.

Every other codec seam in this package is injection-only (Pillow,
ffmpeg, ... are optional and absent in some environments), which means
the decode → hash → dedup/scene pipelines can normally be exercised
only with deterministic fakes. PGM is a genuine container format
(netpbm, `man pgm`) whose binary variant is a 3-field ASCII header
followed by a raw raster — decodable in pure Python + numpy — so this
module gives the engine ONE always-available real codec: real encoded
bytes flow through `decode_images(decode=pgm_decode)` /
`average_hash(pixels=pgm_pixels)` on executors with no optional
dependency, and tests/test_multimodal_codec_integration.py pins the
full pipeline's counts on it.

Scope: 8-bit grayscale (maxval 255), binary raster (P5), no comment
lines — the subset sufficient for a codec-seam integration surface,
not a general netpbm reader.
"""

from __future__ import annotations

import numpy as np

__all__ = ["pgm_bytes", "pgm_decode", "pgm_pixels"]


def pgm_bytes(arr: "np.ndarray") -> bytes:
    """Encode a 2-D uint8 array as a binary PGM (P5) image."""
    h, w = arr.shape
    return f"P5\n{w} {h}\n255\n".encode() + arr.astype(np.uint8).tobytes()


def _parse(data: bytes) -> tuple[int, int, "np.ndarray"]:
    magic, dims, maxval, raster = data.split(b"\n", 3)
    if magic != b"P5":
        raise ValueError(f"not a binary PGM (magic {magic!r})")
    if maxval != b"255":
        raise ValueError(f"unsupported maxval {maxval!r} (8-bit only)")
    w, h = (int(x) for x in dims.split())
    if len(raster) < w * h:
        raise ValueError(f"truncated raster: {len(raster)} < {w * h}")
    return w, h, np.frombuffer(raster[: w * h], dtype=np.uint8).reshape(h, w)


def pgm_decode(data: bytes) -> tuple[int, int, str]:
    """Header decode for the ``decode_images(decode=...)`` seam."""
    w, h, _ = _parse(data)
    return w, h, "L"


def pgm_pixels(data: bytes) -> "np.ndarray":
    """Raster decode for the ``average_hash(pixels=...)`` seam."""
    return _parse(data)[2].astype(np.float64)
