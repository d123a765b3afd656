"""ffmpeg-dependent paths, gated on the binary (absent from this image).

Round-1 VERDICT weak #9: scdet parsing, stream-copy clip extraction,
signature similarity, and FfmpegCliDecoder were implemented but never
executed against a real ffmpeg. These smoke tests run the moment an image
ships the binary (reference paths: clip_segmentation/code/extract_clips.py
:54-107, feature_extraction/code/data/video.py:69-163).
"""

import shutil
import subprocess

import numpy as np
import pytest

HAS_FFMPEG = shutil.which("ffmpeg") is not None and shutil.which("ffprobe") is not None

pytestmark = pytest.mark.skipif(not HAS_FFMPEG, reason="ffmpeg binary not in image")


@pytest.fixture(scope="module")
def scene_video(tmp_path_factory):
    """~6 s synthetic mp4 with three hard cuts (solid-color scenes)."""
    path = tmp_path_factory.mktemp("vids") / "scenes.mp4"
    w = h = 64
    fps = 10
    frames = []
    for color in ((255, 0, 0), (0, 255, 0), (0, 0, 255)):
        block = np.zeros((20, h, w, 3), np.uint8)
        block[..., 0], block[..., 1], block[..., 2] = color
        # mild noise so the encoder keeps real frames
        block = np.clip(
            block.astype(np.int16)
            + np.random.RandomState(color[0]).randint(-8, 8, block.shape),
            0, 255,
        ).astype(np.uint8)
        frames.append(block)
    raw = np.concatenate(frames).tobytes()
    subprocess.run(
        [shutil.which("ffmpeg"), "-y", "-v", "error",
         "-f", "rawvideo", "-pix_fmt", "rgb24", "-s", f"{w}x{h}",
         "-r", str(fps), "-i", "-",
         "-f", "lavfi", "-i", f"sine=frequency=440:duration={60 / fps}",
         "-shortest", "-pix_fmt", "yuv420p", str(path)],
        input=raw, check=True,
    )
    return path


class TestFfmpegBackend:
    def test_duration(self, scene_video):
        from acav100m_tpu.pipeline.clip_segmentation import FfmpegVideoBackend

        d = FfmpegVideoBackend(scene_video).duration()
        assert 5.0 < d < 7.0

    def test_scdet_parsing_finds_cuts(self, scene_video):
        from acav100m_tpu.pipeline.clip_segmentation import FfmpegVideoBackend

        backend = FfmpegVideoBackend(scene_video)
        boundaries, scores = backend.detect_shots(threshold=5.0)
        assert len(boundaries) == len(scores)
        assert len(boundaries) >= 2  # two hard cuts at ~2 s and ~4 s
        assert all(0.0 < b < 7.0 for b in boundaries)
        assert any(abs(b - 2.0) < 0.5 for b in boundaries)
        assert any(abs(b - 4.0) < 0.5 for b in boundaries)

    def test_stream_copy_extraction(self, scene_video, tmp_path):
        from acav100m_tpu.pipeline.clip_segmentation import FfmpegVideoBackend

        out = tmp_path / "clip.mp4"
        FfmpegVideoBackend(scene_video).extract_clip(1.0, 3.0, out)
        assert out.is_file() and out.stat().st_size > 0
        d = FfmpegVideoBackend(out).duration()
        # -c copy cuts on keyframes; allow slack
        assert 0.5 < d < 4.0

    def test_signature_similarity_self_vs_other(self, scene_video, tmp_path):
        from acav100m_tpu.pipeline.clip_segmentation import FfmpegVideoBackend

        backend = FfmpegVideoBackend(scene_video)
        a = tmp_path / "a.mp4"
        b = tmp_path / "b.mp4"
        backend.extract_clip(0.0, 2.0, a)
        backend.extract_clip(4.0, 6.0, b)
        same = FfmpegVideoBackend(a).similarity(a, a)
        diff = FfmpegVideoBackend(a).similarity(a, b)
        assert same >= diff  # matched frame count: identical >= disjoint scenes

    def test_segment_video_end_to_end(self, scene_video, tmp_path):
        import random

        from acav100m_tpu.pipeline.clip_segmentation import (
            FfmpegVideoBackend,
            segment_video,
        )

        clips, paths = segment_video(
            FfmpegVideoBackend(scene_video), tmp_path, "scenes",
            num_clips=2, clip_duration=1.0, rng=random.Random(98052),
        )
        assert len(paths) <= 2
        for p in paths:
            assert p.endswith(".mp4")


class TestFfmpegCliDecoder:
    def test_decode_mp4_contract(self, scene_video):
        from acav100m_tpu.data.video import FfmpegCliDecoder

        dec = FfmpegCliDecoder(size=64, sample_rate=16000)
        out = dec.decode_path(scene_video)
        assert out is not None
        assert out["frames"].shape[1:] == (64, 64, 3)
        assert out["frames"].shape[0] >= 50
        assert out["sample_rate"] == 16000
        assert out["audio"].size > 16000  # several seconds of mono audio
        assert 8.0 < out["video_fps"] < 12.0

    def test_decode_bytes(self, scene_video):
        from acav100m_tpu.data.video import FfmpegCliDecoder

        dec = FfmpegCliDecoder(size=64)
        out = dec(scene_video.read_bytes())
        assert out is not None and out["frames"].ndim == 4
