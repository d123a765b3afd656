"""The COMPLETE pipeline — stages 1→6 — on real compressed media.

Drives ``examples/run_raw_video_pipeline.py``: synthesized multi-scene
mpeg4+AAC videos -> metadata filter -> offline download -> native-scdet
segmentation + stream-copy clips -> tar bundling -> SlowFast/VGGish
extraction -> SGD k-means -> batched greedy MI selection -> output.csv.
No stage is stubbed; the media is real compressed video+audio throughout.

Reference counterpart: the six stage directories of
``/root/reference/README.md`` run in sequence (which upstream could only
do on a GPU fleet with ffmpeg/yt-dlp installed).
"""

from __future__ import annotations

import csv
import sys
from pathlib import Path

import pytest

from acav100m_tpu.data import native_av

if not native_av.available():  # pragma: no cover - image ships the libs
    pytest.skip("native avio library unavailable", allow_module_level=True)

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))


class TestRawVideoPipeline:
    @pytest.fixture(scope="class")
    def result(self, tmp_path_factory):
        from run_raw_video_pipeline import run

        return run(
            tmp_path_factory.mktemp("raw_e2e"),
            n_videos=2, scenes=3, scene_seconds=11.0, fps=8.0, size=64,
            batch_size=4, ncentroids=3, subset_ratio=0.75,
            log=lambda *a: None,
        )

    def test_stage1_filters_engineered_rejects(self, result):
        kept, total = result["filtered"]
        assert (kept, total) == (2, 5)  # 2 real videos; gaming/short/keyword out

    def test_stage2_downloads_every_kept_row(self, result):
        assert result["downloaded"] == (2, 2)

    def test_stage3_finds_the_scene_cuts(self, result):
        # 3 scenes -> cuts at 11 s and 22 s -> two >=10 s shots per video
        # (the trailing shot has no closing boundary — reference
        # extract_clips.py:65-70 drops it too)
        clips = result["clips"]
        assert len(clips) == 4
        for p in clips:
            assert Path(p).stat().st_size > 0 and p.endswith(".mp4")
        starts = sorted(int(Path(p).stem.rsplit("_", 1)[1]) for p in clips)
        assert starts == [0, 0, 11, 11]

    def test_stream_copied_clips_decode_with_audio(self, result):
        dec = native_av.decode(path=result["clips"][0], size=64,
                               sample_rate=16000)
        assert dec is not None and dec["frames"].shape[0] > 0
        assert abs(float(dec["duration"]) - 10.0) < 2.5  # keyframe-snapped
        assert len(dec["audio"]) > 0

    def test_stage4_extracts_every_clip(self, result):
        assert len(result["features"]) == 2  # two shards

    def test_stage6_selects_a_strict_subset(self, result):
        rows = list(csv.reader(result["csv"].read_text().splitlines()))
        assert len(rows) == result["selected"]
        assert 0 < len(rows) < 4  # strict subset of the 4 clips
        clip_names = {Path(p).name for p in result["clips"]}
        for shard, filename, vid, segment in rows:
            assert shard.startswith("shard-")
            assert filename in clip_names
            assert filename.startswith(vid)
            start, end = (float(x) for x in segment.strip("[]").split(","))
            assert end - start == pytest.approx(10.0)
