"""Textbook-reference cross-checks for the round-11 multimodal
curation family (VERDICT r11 task 7 — the forward extension of the
r8-r11 pattern).

The oracle-parity suite proves Spark == DuckDB; these tests close the
remaining blind spot by proving the DuckDB oracle == an independent
pure-Python reimplementation, so a wrong constant or off-by-one the
two SQL dialects SHARE (they are generated from one template) cannot
hide: the scene-cut hamming threshold via an explicit popcount loop
(not bit_count), VAD gaps-and-islands via a literal run scanner (not
the seg_id - row_number() key), shard packing via a greedy Python
packer (not a running-total window), the frame-dedup histogram via
dict/set counting, Tukey bitrate fences via a hand-rolled type-7
interpolated quantile, the letterbox ladder via integer math, and the
modality-mix card via plain tallies. DuckDB-only — no Spark session,
so the module runs in seconds.

The Python paths are deliberately NAIVE — per-clip loops, explicit
run-length scans and bit-twiddling — so they share no algebra with the
SQL they check. Stand-in media attributes (duration, fps, modality,
energy) are recomputed from raw text with hashlib, independent of both
engines' sha2/conv paths.

Snapping discipline: where the SQL snaps to the 1e-6 grid
(floor(x * 1e6 + 0.5) / 1e6), the Python reference replicates the
snap; fence/quantile doubles compare at 2e-6 (one grid step), counts
and integer plan columns compare exactly.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import duckdb
import pytest

from tests.conftest import SF_SMOKE
from tests.test_round10_references import _oracle, _snap

# Stand-in constants pinned by the family (multimodal.py); the point of
# this module is that an accidental change to EITHER side (SQL template
# or these values) breaks the cross-check.
N_SAMPLES = 8
CUT_HAMMING = 24
VAD_ACTIVE = 40
HOP_B, WIN_B, BYTES_PER_MS = 80, 160, 2
SHARD_BYTES, PACK_BUCKET = 65_536, 4_096
TARGETS = (224, 336, 448)
MODALITIES = ("text", "image", "audio", "video")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_SMOKE}/documents.parquet'"
    )
    return c


def _hash60(s: str) -> int:
    return int(hashlib.sha256(s.encode()).hexdigest()[:15], 16)


def _hash28(s: str) -> int:
    return int(hashlib.sha256(s.encode()).hexdigest()[:7], 16)


@pytest.fixture(scope="module")
def docs(con) -> list[tuple[int, str]]:
    return con.execute(
        "SELECT doc_id, text FROM documents ORDER BY doc_id"
    ).fetchall()


def _duration_ms(text: str) -> int:
    return 1000 + (len(text.encode()) % 97) * 250


def _frame_hashes(doc_id: int, text: str) -> list[int]:
    """The 8 sampled-frame content hashes, recomputed with hashlib from
    the raw text (independent of sha2/conv/substr SQL)."""
    dur = _duration_ms(text)
    n_chars = len(text)
    out = []
    for i in range(N_SAMPLES):
        ts_ms = (i * dur) // N_SAMPLES
        start0 = ts_ms % max(n_chars - 39, 1)  # substr is 1-based
        out.append(_hash60(text[start0:start0 + 40]))
    return out


def test_scene_cuts_match_popcount_loop(con, docs):
    """multimodal_scene_cut_spans: per-clip cut counts recomputed with
    an explicit popcount loop over consecutive frame-hash XORs — pins
    the >= CUT_HAMMING boundary semantics bit_count() implements."""
    expect = {}
    for doc_id, text in docs:
        if not text.encode():
            continue
        fhs = _frame_hashes(doc_id, text)
        cuts = 0
        for prev, cur in zip(fhs, fhs[1:]):
            x, pop = prev ^ cur, 0
            while x:
                pop += x & 1
                x >>= 1
            if pop >= CUT_HAMMING:
                cuts += 1
        dur = _duration_ms(text)
        expect[doc_id] = (
            dur, N_SAMPLES, cuts, cuts + 1, _snap(dur / (cuts + 1))
        )
    rows = con.execute(_oracle("multimodal_scene_cut_spans")).fetchall()
    assert len(rows) == len(expect)
    for media_id, dur, n_frames, n_cuts, n_scenes, mean_ms in rows:
        e = expect[media_id]
        assert (dur, n_frames, n_cuts, n_scenes) == e[:4], media_id
        assert abs(mean_ms - e[4]) < 2e-6, media_id
    # the threshold must actually separate: some pair below, some above
    assert any(r[3] > 0 for r in rows) and any(r[3] < 7 for r in rows)


def test_frame_dedup_histogram_matches_set_counting(con, docs):
    """multimodal_frame_dedup_rate: within-clip distinct counts and the
    corpus dedup rate via dict/set counting."""
    per_clip, all_hashes, n_clips = [], set(), 0
    for doc_id, text in docs:
        if not text.encode():
            continue
        fhs = _frame_hashes(doc_id, text)
        per_clip.append(len(set(fhs)))
        all_hashes.update(fhs)
        n_clips += 1
    hist = Counter(per_clip)
    corpus_frames = N_SAMPLES * n_clips
    dup_rate = _snap(1.0 - len(all_hashes) / corpus_frames)
    rows = con.execute(_oracle("multimodal_frame_dedup_rate")).fetchall()
    assert {r[0]: r[1] for r in rows} == dict(hist)
    for _, n, share, cf, cd, rate in rows:
        assert cf == corpus_frames and cd == len(all_hashes)
        assert abs(share - _snap(n / n_clips)) < 2e-6
        assert abs(rate - dup_rate) < 2e-6


def test_vad_islands_match_run_scanner(con, docs):
    """multimodal_vad_utterances: utterance boundaries recomputed with
    a literal left-to-right run scanner over the active flags — pins
    the seg_id - row_number() island key's segment semantics."""
    expect = {}
    for doc_id, text in docs:
        n_bytes = len(text.encode())
        if n_bytes == 0:
            continue
        n_chars = len(text)
        segs = []  # (start_ms, end_ms, active)
        for start in range(0, n_bytes, HOP_B):
            s0 = start % max(n_chars - 15, 1)
            active = _hash28(text[s0:s0 + 16]) % 100 >= VAD_ACTIVE
            end_ms = (start + min(WIN_B, n_bytes - start)) // BYTES_PER_MS
            segs.append((start // BYTES_PER_MS, end_ms, active))
        # explicit run scan over consecutive active windows
        runs, cur = [], None  # cur = [n_segs, u_start_ms, u_end_ms]
        for start_ms, end_ms, active in segs:
            if active:
                if cur is None:
                    cur = [1, start_ms, end_ms]
                else:
                    cur[0] += 1
                    cur[2] = end_ms
            elif cur is not None:
                runs.append(cur)
                cur = None
        if cur is not None:
            runs.append(cur)
        n_active = sum(1 for s in segs if s[2])
        expect[doc_id] = (
            len(segs),
            n_active,
            len(runs),
            max((r[0] for r in runs), default=0),
            sum(r[2] - r[1] for r in runs),
            _snap(n_active / len(segs)),
        )
    rows = con.execute(_oracle("multimodal_vad_utterances")).fetchall()
    assert len(rows) == len(expect)
    for mid, n_segments, n_act, n_utt, longest, voiced_ms, ratio in rows:
        e = expect[mid]
        assert (n_segments, n_act, n_utt, longest, voiced_ms) == e[:5], mid
        assert abs(ratio - e[5]) < 2e-6, mid
    # the corpus must exercise both empty and multi-utterance clips
    assert any(r[3] == 0 for r in rows) and any(r[3] >= 2 for r in rows)


def test_shard_packing_matches_greedy_packer(con, docs):
    """multimodal_shard_packing: bin edges recomputed with a greedy
    sequential packer (explicit accumulator per bucket, no window
    algebra) — pins the running-total DIV shard assignment and the
    closes_shard boundary flag."""
    groups: dict[tuple[str, int], list[tuple[int, int]]] = {}
    for doc_id, text in docs:
        key = (MODALITIES[doc_id % 4], doc_id // PACK_BUCKET)
        groups.setdefault(key, []).append((doc_id, len(text.encode())))
    expect = {}
    for (modality, bucket), blobs in groups.items():
        cum = 0
        for media_id, n in sorted(blobs):
            expect[media_id] = (
                modality,
                bucket,
                n,
                cum,
                cum // SHARD_BYTES,
                cum // SHARD_BYTES != (cum + n) // SHARD_BYTES,
            )
            cum += n
    rows = con.execute(_oracle("multimodal_shard_packing")).fetchall()
    assert len(rows) == len(expect)
    for mid, modality, bucket, n, cum_before, shard, closes in rows:
        assert (modality, bucket, n, cum_before, shard, closes) == \
            expect[mid], mid
    # the flag must fire iff some group's bytes cross a shard boundary
    crossings = sum(
        sum(n for _, n in blobs) // SHARD_BYTES for blobs in groups.values()
    )
    assert sum(1 for r in rows if r[6]) == crossings


def _quantile_type7(sorted_xs: list[float], q: float) -> float:
    """Linear-interpolated quantile on (n-1)*q positions — the
    definition Spark percentile() and DuckDB quantile_cont() share."""
    h = (len(sorted_xs) - 1) * q
    lo = math.floor(h)
    if lo + 1 >= len(sorted_xs):
        return sorted_xs[-1]
    return sorted_xs[lo] + (h - lo) * (sorted_xs[lo + 1] - sorted_xs[lo])


def test_bitrate_fences_match_handrolled_quantile(con, docs):
    """multimodal_bitrate_outliers: Tukey fences recomputed from a
    hand-rolled type-7 quantile over the snapped kbps grid, outliers
    counted with a literal comparison loop."""
    by_fps: dict[int, list[float]] = {12: [], 24: [], 30: []}
    for doc_id, text in docs:
        n_bytes = len(text.encode())
        if n_bytes == 0:
            continue
        fps = {0: 12, 1: 24, 2: 30}[doc_id % 3]
        by_fps[fps].append(_snap(n_bytes * 8.0 / _duration_ms(text)))
    rows = con.execute(_oracle("multimodal_bitrate_outliers")).fetchall()
    assert [r[0] for r in rows] == [12, 24, 30]
    for fps, n_clips, q1, q3, iqr, lo, hi, n_out, share in rows:
        xs = sorted(by_fps[fps])
        assert n_clips == len(xs)
        eq1 = _snap(_quantile_type7(xs, 0.25))
        eq3 = _snap(_quantile_type7(xs, 0.75))
        assert abs(q1 - eq1) < 2e-6 and abs(q3 - eq3) < 2e-6
        assert abs(iqr - _snap(eq3 - eq1)) < 2e-6
        elo = _snap(eq1 - 1.5 * (eq3 - eq1))
        ehi = _snap(eq3 + 1.5 * (eq3 - eq1))
        assert abs(lo - elo) < 2e-6 and abs(hi - ehi) < 2e-6
        expect_out = sum(1 for x in xs if x < elo or x > ehi)
        assert n_out == expect_out
        assert abs(share - _snap(expect_out / len(xs))) < 2e-6


def test_resolution_ladder_matches_integer_letterbox(con, docs):
    """multimodal_resolution_ladder: out dims / padding recomputed with
    plain Python integer arithmetic; aspect order must be preserved and
    the long side must hit the target exactly on downscales."""
    expect = {}
    for doc_id, text in docs:
        n_bytes = len(text.encode())
        if n_bytes == 0:
            continue
        w, h = 64 + n_bytes % 193, 64 + doc_id % 157
        for t in TARGETS:
            long_side = max(w, h)
            ow, oh = w * t // long_side, h * t // long_side
            expect[(doc_id, t)] = (
                w, h, ow, oh, t - ow, t - oh, long_side < t
            )
    rows = con.execute(_oracle("multimodal_resolution_ladder")).fetchall()
    assert len(rows) == len(expect)
    for mid, w, h, t, ow, oh, px, py, ups in rows:
        assert (w, h, ow, oh, px, py, ups) == expect[(mid, t)], (mid, t)
        # letterbox invariants the integer math must respect
        assert max(ow, oh) <= t and min(px, py) == 0
        if not ups:
            assert max(ow, oh) == t


def test_modality_mix_matches_plain_tallies(con, docs):
    """multimodal_modality_mix_report: the dataset card recomputed with
    plain per-modality tallies over non-empty blobs (the r12 guard:
    the card's universe == the rest of the family's)."""
    items: Counter = Counter()
    nbytes: Counter = Counter()
    for doc_id, text in docs:
        n = len(text.encode())
        if n == 0:
            continue
        m = MODALITIES[doc_id % 4]
        items[m] += 1
        nbytes[m] += n
    rows = con.execute(_oracle("multimodal_modality_mix_report")).fetchall()
    assert [r[0] for r in rows] == sorted(MODALITIES)
    tot_i, tot_b = sum(items.values()), sum(nbytes.values())
    for m, n_items, total_bytes, i_share, b_share, mean_b in rows:
        assert n_items == items[m] and total_bytes == nbytes[m]
        assert abs(i_share - _snap(items[m] / tot_i)) < 2e-6
        assert abs(b_share - _snap(nbytes[m] / tot_b)) < 2e-6
        assert abs(mean_b - _snap(nbytes[m] / items[m])) < 2e-6
