"""Semantic invariants for the second multimodal family (round 11).

Oracle parity (tests/test_oracle_parity.py + the driver replay) proves
Spark == DuckDB; these tests pin properties that both engines could get
wrong TOGETHER — packing never overfills a shard by more than one blob,
the resize plan is aspect-exact, islands are contiguous, shares sum to
one — the same role the lm-bounds/monitor-template modules play for
their families.
"""

from __future__ import annotations

from collections import defaultdict

import pytest

from automated_data_pipeline_python_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def _rows(spark, name):
    return QUERIES[name].fn(spark, SF_SMOKE).collect()


def test_mix_report_shares_sum_to_one(spark):
    rows = _rows(spark, "multimodal_modality_mix_report")
    assert {r.modality for r in rows} == {"text", "image", "audio", "video"}
    assert abs(sum(r.item_share for r in rows) - 1.0) < 4e-6
    assert abs(sum(r.byte_share for r in rows) - 1.0) < 4e-6
    for r in rows:
        assert r.total_bytes >= r.n_items  # every blob is non-empty


def test_bitrate_fences_bound_outliers(spark):
    rows = _rows(spark, "multimodal_bitrate_outliers")
    assert [r.fps for r in rows] == [12, 24, 30]
    for r in rows:
        assert r.lo_fence <= r.q1 <= r.q3 <= r.hi_fence
        assert 0 <= r.n_outliers <= r.n_clips
        assert abs(r.iqr - round(r.q3 - r.q1, 6)) < 2e-6


def test_frame_dedup_histogram_is_consistent(spark):
    rows = _rows(spark, "multimodal_frame_dedup_rate")
    corpus_frames = rows[0].corpus_frames
    corpus_distinct = rows[0].corpus_distinct
    assert 0 < corpus_distinct <= corpus_frames
    # histogram covers every clip exactly once; 8 frames per clip
    n_clips = sum(r.n_clips for r in rows)
    assert corpus_frames == 8 * n_clips
    for r in rows:
        assert 1 <= r.n_distinct_in_clip <= 8
    # duplicate documents exist in the corpus by construction, so the
    # corpus-level frame dedup rate must be strictly positive
    assert rows[0].corpus_dup_rate > 0


def test_scene_counts_bounded_by_frames(spark):
    for r in _rows(spark, "multimodal_scene_cut_spans"):
        assert r.n_frames == 8
        assert 0 <= r.n_cuts <= r.n_frames - 1
        assert r.n_scenes == r.n_cuts + 1
        assert r.mean_scene_ms > 0


def test_vad_profile_invariants(spark):
    for r in _rows(spark, "multimodal_vad_utterances"):
        assert 0 <= r.n_active <= r.n_segments
        # merging adjacent active windows can only reduce the count
        assert r.n_utterances <= max(r.n_active, 1)
        assert r.longest_utterance_segs <= r.n_active
        assert 0.0 <= r.voiced_ratio <= 1.0
        assert (r.n_utterances == 0) == (r.n_active == 0)


def test_resolution_ladder_is_aspect_exact(spark):
    rows = _rows(spark, "multimodal_resolution_ladder")
    assert {r.target for r in rows} == {224, 336, 448}
    for r in rows:
        # the long side maps exactly onto the target unless upscaling
        if not r.is_upscale:
            assert max(r.out_w, r.out_h) == r.target, r
        assert r.out_w + r.pad_x == r.target
        assert r.out_h + r.pad_y == r.target
        # aspect preserved within integer-floor tolerance
        assert abs(r.out_w * r.height - r.out_h * r.width) <= max(
            r.width, r.height
        )


def test_shard_packing_overshoots_by_at_most_one_blob(spark):
    rows = _rows(spark, "multimodal_shard_packing")
    by_part = defaultdict(list)
    for r in rows:
        by_part[(r.modality, r.pack_bucket)].append(r)
    for part, items in by_part.items():
        items.sort(key=lambda r: r.media_id)
        cum = 0
        shard_bytes = defaultdict(int)
        for r in items:
            assert r.cum_before == cum, part
            shard_bytes[r.shard_in_bucket] += r.n_bytes
            cum += r.n_bytes
        max_blob = max(r.n_bytes for r in items)
        for b in shard_bytes.values():
            # greedy prefix-sum packing: a shard exceeds the target only
            # by (part of) the single blob that closes it
            assert b < 65_536 + max_blob
        # shard ids are dense from 0
        assert sorted(shard_bytes) == list(range(len(shard_bytes)))
