"""Multimodal plumbing tests: binary columns through mapInPandas passes."""

from __future__ import annotations

import hashlib

import pytest

from automated_data_pipeline_python_spark.multimodal.binary_ops import (
    decode_images,
    documents_as_media,
    extract_features,
    fake_feature_extract,
    fake_image_decode,
    media_metadata,
    sample_frames,
    sniff_format,
)
from automated_data_pipeline_python_spark.tables import load

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return documents_as_media(load(spark, SF_DIR, "documents")).cache()


def test_sniff_format_magic_bytes():
    assert sniff_format(b"\x89PNG\r\n\x1a\n....") == "png"
    assert sniff_format(b"\xff\xd8\xff\xe0rest") == "jpeg"
    assert sniff_format(b"GIF89a...") == "gif"
    assert sniff_format(b"") == "empty"
    assert sniff_format(None) == "empty"
    assert sniff_format(b"plain text") == "unknown"


def test_media_metadata_matches_local_hash(spark, media):
    docs = {r.doc_id: r.text for r in load(spark, SF_DIR, "documents").collect()}
    meta = {r.media_id: r for r in media_metadata(media).collect()}
    assert set(meta) == set(docs)
    some = sorted(docs)[:10]
    for did in some:
        raw = docs[did].encode("utf-8")
        assert meta[did].n_bytes == len(raw)
        assert meta[did].sha256 == hashlib.sha256(raw).hexdigest()
        assert meta[did].format == "unknown"


def test_decode_without_codec_raises_cleanly(spark, media):
    df = decode_images(media)  # plan builds fine (lazy)
    with pytest.raises(Exception, match="no image codec"):
        df.collect()


def test_decode_with_fake_codec(spark, media):
    rows = decode_images(media, decode=fake_image_decode).collect()
    assert len(rows) == media.count()
    assert all(16 <= r.width <= 1040 and 16 <= r.height <= 1040 for r in rows)
    assert all(r.mode in {"RGB", "RGBA", "L"} for r in rows)
    # Determinism: same content -> same decode
    again = decode_images(media, decode=fake_image_decode).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_feature_extraction_shape_and_range(spark, media):
    feats = extract_features(media, extractor=fake_feature_extract).collect()
    assert len(feats) == media.count()
    assert all(len(r.features) == 8 for r in feats)
    assert all(-1.0 <= v <= 1.0 for r in feats for v in r.features)


def test_frame_sampling_fanout(spark, media):
    n = media.count()
    frames = sample_frames(media, n_frames=4)
    assert frames.count() == 4 * n
    one = frames.filter("media_id = 0").orderBy("frame_index").collect()
    assert [r.frame_index for r in one] == [0, 1, 2, 3]
    assert one[0].offset_bytes == 0
    assert all(b.offset_bytes >= a.offset_bytes for a, b in zip(one, one[1:]))


def test_resize_images_plumbing(spark):
    """Resize stage: schema, determinism, and the no-codec error path."""
    import pytest

    from automated_data_pipeline_python_spark.multimodal.binary_ops import (
        documents_as_media,
        fake_image_resize,
        resize_images,
    )
    from automated_data_pipeline_python_spark.tables import load
    from tests.conftest import SF_SMOKE

    media = documents_as_media(load(spark, SF_SMOKE, "documents")).limit(20)
    out = resize_images(media, 64, 32, resizer=fake_image_resize)
    rows = out.collect()
    assert len(rows) == 20
    assert all(r.width == 64 and r.height == 32 for r in rows)
    assert all(isinstance(r.data, (bytes, bytearray)) and len(r.data) > 0 for r in rows)
    # Deterministic: same input -> same bytes.
    again = {r.media_id: bytes(r.data) for r in resize_images(
        media, 64, 32, resizer=fake_image_resize).collect()}
    assert {r.media_id: bytes(r.data) for r in rows} == again

    with pytest.raises(Exception, match="no image codec"):
        resize_images(media, 64, 32).collect()


class TestPerceptualHashDedup:
    def _media(self, spark, rows):
        return spark.createDataFrame(rows, "media_id long, data binary")

    def test_average_hash_deterministic_and_long_typed(self, spark):
        from automated_data_pipeline_python_spark.multimodal.binary_ops import (
            average_hash,
            fake_image_pixels,
        )

        # distinct PREFIXES: the fake codec derives structure from the
        # first half of the bytes (and average-hash is deliberately
        # invariant to the brightness jitter the tail contributes)
        df = self._media(spark, [(1, b"one-image-payload"), (2, b"two-image-payload")])
        a = {r.media_id: r.ahash for r in
             average_hash(df, pixels=fake_image_pixels).collect()}
        b = {r.media_id: r.ahash for r in
             average_hash(df, pixels=fake_image_pixels).collect()}
        assert a == b                      # deterministic
        assert all(isinstance(v, int) for v in a.values())
        assert a[1] != a[2]                # distinct content -> distinct hash

    def test_near_duplicates_found_distinct_images_not(self, spark):
        from automated_data_pipeline_python_spark.multimodal.binary_ops import (
            average_hash,
            fake_image_pixels,
            phash_near_dup_pairs,
        )

        # fake_image_pixels hashes the FIRST HALF of the bytes for
        # structure: same prefix + different tail = same structure with
        # brightness jitter -> near-identical pixels (a re-encode).
        base = b"photo-AAAA-" * 8
        near = base[:-1] + b"x"
        other = b"completely-different-photo" * 4
        df = self._media(spark, [(1, bytes(base)), (2, bytes(near)),
                                 (3, bytes(other))])
        hashes = average_hash(df, pixels=fake_image_pixels)
        pairs = phash_near_dup_pairs(hashes, max_hamming=3).collect()
        found = {(r.id_a, r.id_b) for r in pairs}
        assert (1, 2) in found
        assert all(p == (1, 2) for p in found), found

    def test_no_codec_raises_at_execution(self, spark):
        from automated_data_pipeline_python_spark.multimodal.binary_ops import (
            average_hash,
        )

        df = self._media(spark, [(1, b"x")])
        plan = average_hash(df)  # builds fine (plumbing planable)
        with pytest.raises(Exception, match="codec"):
            plan.collect()

    def test_blocking_threshold_guard(self, spark):
        from automated_data_pipeline_python_spark.multimodal.binary_ops import (
            average_hash,
            fake_image_pixels,
            phash_near_dup_pairs,
        )

        h = average_hash(self._media(spark, [(1, b"a")]), pixels=fake_image_pixels)
        with pytest.raises(ValueError, match="d <= 3"):
            phash_near_dup_pairs(h, max_hamming=8)
