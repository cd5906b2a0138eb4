"""Real-codec multimodal pass: Pillow-backed decode/resize over a real
JPEG and PNG, exercised through the same mapInPandas plumbing the
injected-fake tests pin.

Import-gated: Pillow is not baked into every environment — the module
skips cleanly when PIL is absent and runs green where it is installed,
proving the codec seam (``decode=`` / ``resizer=`` injection points)
accepts a real codec, not just the deterministic fakes.
"""

from __future__ import annotations

import io

import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402  (after the gate by design)

from automated_data_pipeline_python_spark.multimodal.binary_ops import (  # noqa: E402
    decode_images,
    media_metadata,
    pil_image_decode,
    pil_image_resize,
    resize_images,
)


def _jpeg_bytes(w: int, h: int) -> bytes:
    im = Image.new("RGB", (w, h), color=(200, 30, 90))
    out = io.BytesIO()
    im.save(out, format="JPEG")
    return out.getvalue()


def _png_bytes(w: int, h: int) -> bytes:
    im = Image.new("RGBA", (w, h), color=(0, 120, 255, 255))
    out = io.BytesIO()
    im.save(out, format="PNG")
    return out.getvalue()


@pytest.fixture()
def media_df(spark):
    rows = [(1, _jpeg_bytes(48, 32)), (2, _png_bytes(20, 10))]
    return spark.createDataFrame(rows, ["media_id", "data"])


def test_real_codec_decode(spark, media_df):
    got = {r.media_id: r for r in decode_images(media_df, decode=pil_image_decode).collect()}
    assert (got[1].width, got[1].height, got[1].mode) == (48, 32, "RGB")
    assert (got[2].width, got[2].height, got[2].mode) == (20, 10, "RGBA")


def test_real_codec_resize_roundtrip(spark, media_df):
    resized = resize_images(media_df, 16, 8, resizer=pil_image_resize)
    got = {r.media_id: r for r in resized.collect()}
    assert set(got) == {1, 2}
    for r in got.values():
        assert (r.width, r.height) == (16, 8)
        with Image.open(io.BytesIO(bytes(r.data))) as im:
            assert (im.width, im.height) == (16, 8)
    # format preserved through the re-encode
    with Image.open(io.BytesIO(bytes(got[1].data))) as im:
        assert im.format == "JPEG"
    with Image.open(io.BytesIO(bytes(got[2].data))) as im:
        assert im.format == "PNG"


def test_metadata_sniffs_real_formats(spark, media_df):
    fmts = {r.media_id: r.format for r in media_metadata(media_df).collect()}
    assert fmts == {1: "jpeg", 2: "png"}
