"""Multimodal (image/audio/video) column plumbing (SURVEY §2.8 target).

Media travel as opaque ``binary`` columns plus typed metadata — the
standard large-scale layout (media bytes inline for small assets, or a
``uri`` column pointing into object storage for large ones). All
Spark-side mechanics here are real and tested: schemas, Arrow-batched
``mapInPandas`` signatures, partition-size control. Only the codec
itself is stubbed — the image/audio libraries are not in this
environment — behind ``decode=`` hooks:

- ``decode=None``     → raise NotImplementedError at *execution* time
                        with a clear message (plumbing still planable)
- ``decode=fake_*``   → deterministic SHA-derived fake, for tests

Swap ``decode`` for a Pillow/ffmpeg-backed callable in deployment; the
plan, schema, and batch shape do not change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Magic-byte prefixes for format sniffing (pure metadata; no codec).
_MAGIC: list[tuple[bytes, str]] = [
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF87a", "gif"),
    (b"GIF89a", "gif"),
    (b"RIFF", "riff"),  # wav/avi container
    (b"\x00\x00\x00", "mp4"),  # ftyp boxes start with size
    (b"ID3", "mp3"),
    (b"OggS", "ogg"),
]

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("format", T.StringType()),
    ]
)

IMAGE_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mode", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("offset_bytes", T.LongType()),
    ]
)


def sniff_format(data: bytes | None) -> str:
    if not data:
        return "empty"
    for magic, name in _MAGIC:
        if data.startswith(magic):
            return name
    return "unknown"


def media_metadata(df: DataFrame, id_col: str = "media_id", binary_col: str = "data") -> DataFrame:
    """Size/hash/format metadata per media row — Arrow-batched mapInPandas.

    This is the cheap always-run pass: no codec, bounded memory per batch.
    """

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            data = pdf[binary_col]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "n_bytes": data.map(lambda b: 0 if b is None else len(b)),
                    "sha256": data.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "format": data.map(sniff_format),
                }
            )

    return df.select(id_col, binary_col).mapInPandas(compute, schema=MEDIA_META_SCHEMA)


def fake_image_decode(data: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for a codec: dims derived from content hash."""
    h = hashlib.sha256(data).digest()
    return 16 + h[0] % 1024, 16 + h[1] % 1024, ("RGB", "RGBA", "L")[h[2] % 3]


def pil_image_decode(data: bytes) -> tuple[int, int, str]:
    """Pillow-backed codec for :func:`decode_images` (deployment
    binding; import-gated — Pillow is absent in this container, so this
    raises ImportError there and tests/test_multimodal_pil.py skips)."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(data)) as im:
        return im.width, im.height, im.mode


def pil_image_resize(data: bytes, width: int, height: int) -> bytes:
    """Pillow-backed resizer for :func:`resize_images` (import-gated;
    re-encodes in the source format, falling back to PNG for formats
    Pillow can read but not write)."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(data)) as im:
        fmt = im.format or "PNG"
        out = io.BytesIO()
        try:
            im.resize((width, height)).save(out, format=fmt)
        except (KeyError, OSError):
            im.resize((width, height)).convert("RGB").save(out, format="PNG")
        return out.getvalue()


def decode_images(
    df: DataFrame,
    decode: Callable[[bytes], tuple[int, int, str]] | None = None,
    id_col: str = "media_id",
    binary_col: str = "data",
) -> DataFrame:
    """Decode pass → (width, height, mode). Codec injected; stub by default."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decode is None:
            raise NotImplementedError(
                "no image codec in this environment: pass decode= "
                "(e.g. a Pillow-backed callable) to decode_images()"
            )
        for pdf in batches:
            decoded = [decode(b) for b in pdf[binary_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "mode": [d[2] for d in decoded],
                }
            )

    return df.select(id_col, binary_col).mapInPandas(compute, schema=IMAGE_DECODE_SCHEMA)


def fake_feature_extract(data: bytes, dims: int = 8) -> list[float]:
    """Deterministic SHA-derived feature vector (codec stand-in)."""
    h = hashlib.sha256(data).digest()
    return [((h[i] << 8 | h[i + 1]) / 65535.0) * 2 - 1 for i in range(0, dims * 2, 2)]


def extract_features(
    df: DataFrame,
    extractor: Callable[[bytes], list[float]] | None = None,
    id_col: str = "media_id",
    binary_col: str = "data",
) -> DataFrame:
    """Feature-extraction pass → array<float> column (ANN-ready)."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if extractor is None:
            raise NotImplementedError(
                "no feature model in this environment: pass extractor= "
                "to extract_features()"
            )
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "features": [extractor(b) for b in pdf[binary_col]],
                }
            )

    return df.select(id_col, binary_col).mapInPandas(compute, schema=FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame,
    n_frames: int = 4,
    id_col: str = "media_id",
    binary_col: str = "data",
) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled frame.

    Offsets are computed structurally (evenly spaced byte offsets) — the
    real decoder would seek to these; the fan-out (rows × frames) and
    schema are the actual plumbing under test.
    """

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs = [], [], []
            for mid, b in zip(pdf[id_col], pdf[binary_col]):
                size = len(b or b"")
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    offs.append((size * i) // max(n_frames, 1))
            yield pd.DataFrame(
                {"media_id": ids, "frame_index": idxs, "offset_bytes": offs}
            )

    return df.select(id_col, binary_col).mapInPandas(compute, schema=FRAME_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as media blobs (test corpus has
    no binary table; the plumbing is payload-agnostic)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("data"),
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("data", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def fake_image_resize(data: bytes, width: int, height: int) -> bytes:
    """Deterministic resize stand-in: SHA-keyed bytes of the target
    size's magnitude (real codec: Pillow ``Image.resize`` re-encode)."""
    h = hashlib.sha256(data + f"{width}x{height}".encode()).digest()
    return (h * ((width * height) // len(h) + 1))[: max(width * height // 64, 16)]


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
    id_col: str = "media_id",
    binary_col: str = "data",
) -> DataFrame:
    """Resize pass → new binary column + target dims (batch- and
    stream-compatible; the standard thumbnail/normalize stage before
    feature extraction).

    Scale: pure map over Arrow batches — no shuffle; the output binary
    is typically much smaller than the input, so this stage SHRINKS the
    bytes the rest of the pipeline moves. Swap ``resizer`` for a
    Pillow-backed callable in deployment.
    """

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if resizer is None:
            raise NotImplementedError(
                "no image codec in this environment: pass resizer= "
                "(e.g. a Pillow-backed callable) to resize_images()"
            )
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "data": [resizer(b, width, height) for b in pdf[binary_col]],
                    "width": width,
                    "height": height,
                }
            )

    return df.select(id_col, binary_col).mapInPandas(compute, schema=RESIZE_SCHEMA)


# ---------------------------------------------------------------------------
# Perceptual-hash (average-hash) image near-duplicate detection
# ---------------------------------------------------------------------------
# The image analogue of SimHash text dedup: a 64-bit signature whose
# hamming distance tracks visual similarity (re-encodes, minor crops,
# brightness shifts), so near-identical images dedup WITHOUT pairwise
# pixel comparison. Only the bytes→pixels step needs a codec (injected,
# like every decode here); the hash math is pure numpy inside the same
# Arrow batch, and pair-finding is entirely JVM-side.

AHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("ahash", T.LongType()),
    ]
)


def fake_image_pixels(data: bytes) -> "object":
    """Deterministic grayscale array (16x16) from bytes — codec stand-in.

    Byte-level perturbations produce small pixel deltas, so tests can
    construct controlled near-duplicates.
    """
    import numpy as np

    h = hashlib.sha256(data[: max(1, len(data) // 2)]).digest()
    base = np.frombuffer((h * 8)[:256], dtype=np.uint8).astype(np.float64)
    # low-frequency structure + byte-sum brightness jitter
    jitter = (sum(data) % 7) * 0.5
    return (base.reshape(16, 16) / 4.0) + jitter


def average_hash(
    df: DataFrame,
    pixels: Callable[[bytes], "object"] | None = None,
    id_col: str = "media_id",
    binary_col: str = "data",
) -> DataFrame:
    """64-bit average hash per image: block-mean the (injected) pixel
    array to 8x8, bit i = cell_i > global mean. Arrow-batched; one
    map-only pass."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        if pixels is None:
            raise NotImplementedError(
                "no image codec in this environment: pass pixels= "
                "(e.g. a Pillow-backed grayscale loader) to average_hash()"
            )
        for pdf in batches:
            out = []
            for b in pdf[binary_col]:
                a = np.asarray(pixels(bytes(b)), dtype=np.float64)
                h, w = a.shape
                a = a[: h - h % 8, : w - w % 8]
                cells = a.reshape(8, a.shape[0] // 8, 8, a.shape[1] // 8).mean(
                    axis=(1, 3)
                )
                bits = (cells > cells.mean()).flatten()
                v = 0
                for bit in bits:
                    v = (v << 1) | int(bit)
                if v >= 1 << 63:  # two's-complement into LongType
                    v -= 1 << 64
                out.append(v)
            yield pd.DataFrame({"media_id": pdf[id_col], "ahash": out})

    return df.select(id_col, binary_col).mapInPandas(compute, schema=AHASH_SCHEMA)


def phash_near_dup_pairs(hashes: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-duplicate pairs among 64-bit perceptual hashes — JVM-side.

    Chunk-blocked hamming (the SimHash discipline, queries/dedup.py):
    split each hash into 4 sixteen-bit chunks; by pigeonhole, any pair
    within hamming distance ≤ 3 shares at least one identical chunk, so
    candidate generation is an equi-join on (chunk_idx, chunk_value) —
    never an all-pairs product — and ``bit_count(xor)`` verifies
    exactly. Scale: bucket sizes are bounded by near-duplicate cluster
    sizes, the same skew profile the text SimHash path carries.
    """
    if not 0 <= max_hamming <= 3:
        raise ValueError("4x16-bit blocking guarantees recall only for d <= 3")
    chunks = hashes.select(
        "media_id",
        "ahash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("idx"),
                        F.expr(f"(ahash >> {i * 16}) & 65535").alias("val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("media_id", "ahash", "c.idx", "c.val")
    pairs = (
        chunks.alias("a")
        .join(
            chunks.alias("b"),
            on=[
                F.col("a.idx") == F.col("b.idx"),
                F.col("a.val") == F.col("b.val"),
                F.col("a.media_id") < F.col("b.media_id"),
            ],
        )
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
            F.expr("bit_count(a.ahash ^ b.ahash)").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs
