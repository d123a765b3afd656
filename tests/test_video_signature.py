"""Property tests for the MPEG-7 video-signature similarity
(``pipeline/video_signature.py`` — the vf_signature algorithm over decoded
frames, replacing round-3's mean-frame-correlation stand-in; reference
usage: ``clip_segmentation/code/extract_clips.py:97-107``).

The metric's load-bearing invariances, each asserted:

* identity: a clip matched with itself -> EVERY frame matches;
* robustness: mild pixel noise / small spatial shift keeps most matches;
* temporal shift: a shared subsequence at constant offset -> matched
  count ~= the overlap length (the Hough offset vote);
* discrimination: unrelated content and scene-shuffled clips -> few
  matches (the diversity samplers depend on this gap);
* the similarity value is an integer frame count like the filter's
  'X frames matching' line, and the decoded-frame backends return it.
"""

from __future__ import annotations

import numpy as np
import pytest

from acav100m_tpu.pipeline.video_signature import (
    GRID,
    N_FEATURES,
    fine_signatures,
    luma_grid,
    matched_frames,
    signature_similarity,
)


def scene(rng, t, h=48, w=64, base=None):
    """Structured frames: a static random background + slow global fade
    (so per-frame signatures are stable within a scene but scene-specific)."""
    bg = base if base is not None else rng.randint(0, 255, (h, w, 3))
    fade = np.linspace(0.9, 1.1, t)[:, None, None, None]
    f = np.clip(bg[None] * fade, 0, 255)
    return f.astype(np.uint8)


class TestLumaGrid:
    def test_shape_and_exact_block_means(self):
        rng = np.random.RandomState(0)
        frames = rng.randint(0, 255, (3, 64, 64)).astype(np.uint8)
        g = luma_grid(frames)
        assert g.shape == (3, GRID, GRID)
        # 64/32 = 2x2 blocks: exact means
        want = frames.astype(np.float32).reshape(3, 32, 2, 32, 2).mean((2, 4))
        np.testing.assert_allclose(g, want, rtol=1e-6)

    def test_small_frames_upsampled(self):
        g = luma_grid(np.zeros((2, 8, 8, 3), np.uint8))
        assert g.shape == (2, GRID, GRID)


class TestFineSignatures:
    def test_ternary_and_shape(self):
        rng = np.random.RandomState(1)
        sig = fine_signatures(rng.randint(0, 255, (5, 40, 40, 3)))
        assert sig.shape == (5, N_FEATURES)
        assert set(np.unique(sig)) <= {0, 1, 2}

    def test_deterministic(self):
        rng = np.random.RandomState(2)
        frames = rng.randint(0, 255, (4, 40, 40, 3))
        np.testing.assert_array_equal(fine_signatures(frames),
                                      fine_signatures(frames))

    def test_unrelated_frames_are_distant(self):
        """Unrelated content measures far above the candidate threshold —
        the gap that makes matched_frames discriminative."""
        rng = np.random.RandomState(3)
        a = fine_signatures(scene(rng, 8))
        b = fine_signatures(scene(rng, 8))
        dist = np.abs(a.astype(int)[:, None] - b.astype(int)[None]).sum(-1)
        from acav100m_tpu.pipeline.video_signature import L1_THRESHOLD

        assert dist.min() > L1_THRESHOLD


class TestMatchedFrames:
    def test_identity_matches_every_frame(self):
        rng = np.random.RandomState(4)
        frames = scene(rng, 12)
        assert signature_similarity(frames, frames) == 12

    def test_noise_robustness(self):
        rng = np.random.RandomState(5)
        frames = scene(rng, 12)
        noisy = np.clip(
            frames.astype(np.int16) + rng.randint(-8, 9, frames.shape), 0, 255
        ).astype(np.uint8)
        assert signature_similarity(frames, noisy) >= 10

    def test_temporal_shift_counts_overlap(self):
        """b = a shifted by 5 frames: the consistent-offset vote finds the
        shared subsequence, not scattered coincidences."""
        rng = np.random.RandomState(6)
        a = scene(rng, 20)
        b = a[5:]
        m = signature_similarity(a, b)
        assert 13 <= m <= 17  # overlap is 15 frames (+-1 jitter band)

    def test_unrelated_clips_low(self):
        rng = np.random.RandomState(7)
        a = scene(rng, 16)
        b = scene(rng, 16)
        assert signature_similarity(a, b) <= 2

    def test_scene_shuffle_low_consistency(self):
        """Same scenes in a different order: frame pairs exist, but no
        single offset aligns them — detectmode=full semantics."""
        rng = np.random.RandomState(8)
        scenes = [scene(rng, 6) for _ in range(4)]
        a = np.concatenate(scenes)
        b = np.concatenate([scenes[2], scenes[0], scenes[3], scenes[1]])
        m_shuffled = signature_similarity(a, b)
        m_aligned = signature_similarity(a, a)
        assert m_aligned == 24
        assert m_shuffled <= 8  # at most ~one scene's worth aligns

    def test_empty_inputs(self):
        empty = np.zeros((0, 32, 32, 3), np.uint8)
        rng = np.random.RandomState(9)
        assert signature_similarity(empty, scene(rng, 4)) == 0


class TestBackendWiring:
    def test_array_backend_similarity_is_matched_count(self, tmp_path):
        from acav100m_tpu.pipeline.clip_segmentation import ArrayVideoBackend

        rng = np.random.RandomState(10)
        frames = scene(rng, 10)
        other = scene(rng, 10)
        be = ArrayVideoBackend(frames, fps=10.0)
        pa = be.extract_clip(0.0, 1.0, tmp_path / "a.npy")
        pb = be.extract_clip(0.0, 1.0, tmp_path / "b.npy")
        np.save(tmp_path / "c.npy", other)
        same = be.similarity(pa, pb)
        diff = be.similarity(pa, str(tmp_path / "c.npy"))
        assert same == 10.0 and float(same).is_integer()
        assert diff <= 2

    def test_segment_video_uses_signature(self, tmp_path):
        """End-to-end wire-through: diversity sampling over real signature
        similarities still produces <=3 valid clips."""
        from acav100m_tpu.pipeline.clip_segmentation import (
            ArrayVideoBackend,
            segment_video,
        )

        rng = np.random.RandomState(11)
        fps = 4
        scenes = [scene(rng, 15 * fps, h=32, w=32) for _ in range(4)]
        frames = np.concatenate(scenes)
        be = ArrayVideoBackend(frames, fps=float(fps))
        clips, paths = segment_video(
            be, tmp_path, "vid0", num_clips=3, rng=np.random.RandomState(0)
        )
        assert 1 <= len(paths) <= 3
        for s, e in clips:
            assert abs((e - s) - 10.0) < 1e-6
