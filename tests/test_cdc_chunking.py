"""Content-defined chunking: the shift-robustness property, pinned.

The whole point of content-defined boundaries (vs fixed-size) is that an
edit near the head of a payload shifts every byte yet the post-edit chunks
still hash identically. These tests assert that property directly on the
operator, independent of the oracle gate.
"""

from __future__ import annotations

from postgresql_cdc_spark.operators.multimodal import (
    attach_binary,
    content_defined_chunks,
)


def _chunks(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = content_defined_chunks(attach_binary(df))
    got: dict[int, list[tuple[int, int]]] = {}
    for r in out.collect():
        got.setdefault(r.doc_id, []).append((r.chunk_h60, r.chunk_len))
    return got


def test_prefix_shift_realigns(spark):
    # varied (non-periodic) text: a periodic payload has only |period|
    # distinct windows and can legitimately produce zero boundaries
    import random

    rng = random.Random(5)
    words = ["spark", "hash", "agg", "scan", "join", "sort", "row", "col",
             "key", "map", "byte", "chunk", "shard", "merge", "skew"]
    base = " ".join(rng.choice(words) for _ in range(400))
    got = _chunks(spark, [(1, base), (2, "zz " + base)])
    h1 = {h for h, _ in got[1]}
    h2 = {h for h, _ in got[2]}
    shared = h1 & h2
    # everything after the first re-aligned boundary is shared; with
    # ~32-byte expected chunks over ~1.8kB, that is nearly all chunks
    assert len(shared) >= 0.7 * min(len(h1), len(h2)), (
        len(h1), len(h2), len(shared)
    )
    # and chunk lengths reconstruct the full payloads
    assert sum(n for _, n in got[1]) == len(base)
    assert sum(n for _, n in got[2]) == len(base) + 3


def test_fixed_size_would_share_nothing(spark):
    """Contrast baseline: a 3-byte shift puts every fixed 32-byte window on
    different content, so fixed-size chunk hashes share ~nothing — the gap
    content-defined chunking closes."""
    import hashlib
    import random

    rng = random.Random(11)
    words = ["spark", "hash", "agg", "scan", "join", "sort", "row", "col"]
    base = " ".join(rng.choice(words) for _ in range(400)).encode()
    shifted = b"zz " + base
    fixed = lambda b: {  # noqa: E731
        hashlib.md5(b[i:i + 32]).hexdigest() for i in range(0, len(b), 32)
    }
    assert len(fixed(base) & fixed(shifted)) <= 1


def test_short_and_empty_payloads(spark):
    got = _chunks(spark, [(1, "abc"), (2, "")])
    # shorter than the window: one whole-payload chunk; empty: no rows
    assert [n for _, n in got[1]] == [3]
    assert 2 not in got


class TestSceneCutDetect:
    def _run(self, spark, payloads):
        import pandas as pd

        from postgresql_cdc_spark.operators.multimodal import scene_cut_detect

        df = spark.createDataFrame(
            [(i, bytearray(p)) for i, p in enumerate(payloads)],
            "doc_id long, payload binary",
        )
        out = scene_cut_detect(df).collect()
        return {
            r.doc_id: (r.n_full_frames, r.n_cuts, r.cut_frames) for r in out
        }

    def test_flat_frames_no_cuts(self, spark):
        # three identical frames: zero adjacent difference
        got = self._run(spark, [bytes([7]) * 192])
        assert got == {0: (3, 0, "")}

    def test_hard_cut_detected_at_frame_boundary(self, spark):
        # frame sums 0, 0, 64*255: one cut at frame index 2
        p = bytes(64) + bytes(64) + bytes([255]) * 64
        got = self._run(spark, [p])
        assert got == {0: (3, 1, "2")}

    def test_threshold_is_strict(self, spark):
        # adjacent sums differ by exactly 1600 (25 * 64): NOT a cut;
        # 1601 is
        just_under = bytes([0]) * 64 + bytes([25]) * 64
        over = bytes([0]) * 64 + bytes([25]) * 63 + bytes([26])
        got = self._run(spark, [just_under, over])
        assert got[0] == (2, 0, "")
        assert got[1] == (2, 1, "1")

    def test_trailing_partial_frame_excluded(self, spark):
        # 64 + 10 bytes: one full frame, partial tail never scored
        got = self._run(spark, [bytes([9]) * 74])
        assert got == {0: (1, 0, "")}

    def test_short_payload_zero_frames(self, spark):
        got = self._run(spark, [bytes([1]) * 10, b""])
        assert got == {0: (0, 0, ""), 1: (0, 0, "")}
