"""The FULL compressed-media contract executed natively — video AND audio.

Round-3 close of the last stage-3/4 execution gap (PARITY "mp4 audio"):
the image has no ffmpeg binary and no PyAV, but it ships the FFmpeg 5.1
libraries + headers, so ``native/avio.cc`` links them directly. These
tests generate REAL mp4 fixtures (mpeg4 video + AAC audio, native
libavcodec encoders — no egress), then exercise:

* decode fidelity: frames correlate with the source, AAC audio round-trips
  the exact tone frequency, swresample hits the requested rate;
* in-memory (tar-member) decode == file decode;
* scdet-equivalent scene scores locate an engineered cut;
* stage 3 on the native backend: SBD + threshold annealing + keyframe-
  snapped stream-copy clip extraction (``-c copy`` semantics);
* stages 3→4 end-to-end with REAL audio: segment → bundle → extraction
  driver → VGGish features computed from decoded AAC (tones of different
  frequency produce distinguishable audio embeddings — the assertion the
  OpenCV path could never make).

Reference counterparts: PyAV decode ``feature_extraction/code/data/
video.py:69-163``; ffmpeg scdet/copy ``clip_segmentation/code/
extract_clips.py:54-94``.
"""

from __future__ import annotations

import io
import json
import tarfile
from pathlib import Path

import numpy as np
import pytest

from acav100m_tpu.data import native_av

if not native_av.available():  # pragma: no cover - image ships the libs
    pytest.skip("native avio library unavailable", allow_module_level=True)

from acav100m_tpu.data.video import (  # noqa: E402
    NativeAvDecoder,
    get_decoder,
    prepare_clip,
)

SIZE, FPS, SECONDS, SR = 64, 8.0, 5, 16000


def synth_video_frames(n, size=SIZE, phase=0):
    """Smooth moving gradient that survives lossy mpeg4."""
    t = np.arange(n)[:, None, None] + phase
    y = np.arange(size)[None, :, None]
    x = np.arange(size)[None, None, :]
    r = 127 + 100 * np.sin(2 * np.pi * (x + 3 * t) / size)
    g = 127 + 100 * np.cos(2 * np.pi * (y + 2 * t) / size)
    b = 127 + 100 * np.sin(2 * np.pi * (x + y - t) / size)
    return np.stack(
        [np.broadcast_to(c, (n, size, size)) for c in (r, g, b)], axis=-1
    ).astype(np.uint8)


def tone(freq, seconds=SECONDS, sr=SR, amp=0.5):
    t = np.arange(int(sr * seconds)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def encode_fixture(path, n_frames=int(FPS * SECONDS), freq=440.0,
                   fps=FPS, frames=None, audio=None):
    if frames is None:
        frames = synth_video_frames(n_frames)
    if audio is None:
        audio = tone(freq, seconds=n_frames / fps)
    assert native_av.encode_mp4(path, frames, fps=fps, audio=audio,
                                sample_rate=SR)
    return frames, audio


def peak_freq(audio, sr):
    spec = np.abs(np.fft.rfft(audio))
    return np.fft.rfftfreq(len(audio), 1.0 / sr)[int(spec.argmax())]


class TestNativeDecode:
    def test_roundtrip_video_and_audio(self, tmp_path):
        path = tmp_path / "fix.mp4"
        frames, audio = encode_fixture(path, freq=440.0)
        dec = native_av.decode(path=path, size=SIZE, sample_rate=SR)
        assert dec is not None
        assert dec["frames"].shape == (len(frames), SIZE, SIZE, 3)
        assert dec["video_fps"] == pytest.approx(FPS, rel=0.05)
        corr = np.corrcoef(
            frames.astype(np.float32).ravel(),
            dec["frames"].astype(np.float32).ravel(),
        )[0, 1]
        assert corr > 0.95, f"video decode correlation {corr}"
        # AAC round-trips the tone
        assert len(dec["audio"]) == pytest.approx(len(audio), rel=0.1)
        assert peak_freq(dec["audio"], SR) == pytest.approx(440.0, abs=3.0)

    def test_resample_rates(self, tmp_path):
        """swresample honors the requested output rate (VGGish 16 k /
        eval 44.1 k paths)."""
        path = tmp_path / "fix.mp4"
        encode_fixture(path, freq=440.0)
        for target in (8000, 44100):
            dec = native_av.decode(path=path, size=0, sample_rate=target)
            assert len(dec["audio"]) == pytest.approx(
                SECONDS * target, rel=0.1)
            assert peak_freq(dec["audio"], target) == pytest.approx(
                440.0, abs=5.0)

    def test_buffer_decode_equals_file_decode(self, tmp_path):
        """Tar members decode from memory — byte-identical to file path."""
        path = tmp_path / "fix.mp4"
        encode_fixture(path)
        from_file = native_av.decode(path=path, size=SIZE, sample_rate=SR)
        from_buf = native_av.decode(data=path.read_bytes(), size=SIZE,
                                    sample_rate=SR)
        np.testing.assert_array_equal(from_file["frames"], from_buf["frames"])
        np.testing.assert_array_equal(from_file["audio"], from_buf["audio"])

    def test_scene_scores_locate_cut(self, tmp_path):
        n = int(FPS * SECONDS)
        scene_a = synth_video_frames(n)
        scene_b = np.ascontiguousarray(255 - synth_video_frames(n, phase=17)[:, ::-1])
        path = tmp_path / "two_scene.mp4"
        encode_fixture(path, frames=np.concatenate([scene_a, scene_b]),
                       audio=tone(440, seconds=2 * SECONDS))
        dec = native_av.decode(path=path, size=0, sample_rate=0,
                               with_scores=True)
        scores = dec["scene_scores"]
        assert int(np.argmax(scores)) == n, (
            f"cut at frame {n} not the max score (argmax "
            f"{int(np.argmax(scores))})")
        # scdet semantics: scores in [0, 100], quiescent frames near zero
        assert 0 <= scores.max() <= 100
        assert float(np.median(scores)) < scores.max() / 4

    def test_video_only_and_garbage(self, tmp_path):
        path = tmp_path / "noaudio.mp4"
        assert native_av.encode_mp4(path, synth_video_frames(8), fps=FPS)
        dec = native_av.decode(path=path, size=SIZE, sample_rate=SR)
        assert dec["frames"].shape[0] == 8 and len(dec["audio"]) == 0
        assert native_av.decode(data=b"not a video") is None

    def test_sampled_decode_matches_temporal_sampling(self, tmp_path):
        """Decode-side uniform sampling is bit-identical to decoding all
        frames then applying temporal_sampling (the floor-linspace rule,
        reference video.py:53-57) — only the sampled frames pay
        sws_scale + storage."""
        from acav100m_tpu.data.video import temporal_sampling

        path = tmp_path / "fix.mp4"
        encode_fixture(path, n_frames=40)
        full = native_av.decode(path=path, size=SIZE, sample_rate=0)
        for n in (1, 7, 32):
            samp = native_av.decode(path=path, size=SIZE, sample_rate=0,
                                    sample_frames=n)
            np.testing.assert_array_equal(
                temporal_sampling(full["frames"], n), samp["frames"])
        # asking for >= total frames keeps everything
        samp = native_av.decode(path=path, size=SIZE, sample_rate=0,
                                sample_frames=40)
        assert samp["frames"].shape[0] == 40

    def test_sampled_decoder_preserves_duration_semantics(self, tmp_path):
        """NativeAvDecoder(sample_frames=n) reports an effective fps so
        prepare_clip's skip-shorter rule still sees the true duration."""
        path = tmp_path / "fix.mp4"
        encode_fixture(path)  # 5 s clip
        dec = NativeAvDecoder(size=SIZE, sample_rate=SR, sample_frames=8)
        out = dec(path.read_bytes())
        assert out["frames"].shape[0] == 8
        inferred = out["frames"].shape[0] / out["video_fps"]
        assert inferred == pytest.approx(SECONDS, rel=0.1)
        # a 5 s clip must NOT be skipped by the 2.5 s rule
        clip = prepare_clip(out, num_frames=8, skip_shorter_seconds=2.5,
                            audio_samples=SR * SECONDS)
        assert clip is not None

    def test_max_frames_bounds_video_decode(self, tmp_path):
        path = tmp_path / "fix.mp4"
        encode_fixture(path)
        dec = native_av.decode(path=path, size=SIZE, sample_rate=0,
                               max_frames=7)
        assert dec["frames"].shape[0] == 7


class TestNativeAvDecoderBackend:
    def test_decoder_protocol(self, tmp_path):
        path = tmp_path / "fix.mp4"
        encode_fixture(path, freq=660.0)
        dec = NativeAvDecoder(size=SIZE, sample_rate=SR)
        assert dec.available
        out = dec(path.read_bytes())
        assert out["frames"].shape[1:] == (SIZE, SIZE, 3)
        assert peak_freq(out["audio"], SR) == pytest.approx(660.0, abs=3.0)
        clip = prepare_clip(out, num_frames=8,
                            audio_samples=SR * SECONDS)
        assert clip is not None and clip["frames"].shape[0] == 8
        # REAL audio flowed through (not the silent-audio delta)
        assert float(np.abs(clip["audio"]).max()) > 0.1
        assert clip["valid_samples"] > 0.8 * SR * SECONDS

    def test_auto_prefers_native(self):
        assert isinstance(get_decoder("auto", size=SIZE), NativeAvDecoder)


class TestStage3Native:
    def test_sbd_and_stream_copy_extraction(self, tmp_path):
        """Stage 3 on the native backend: SBD finds the cut; extracted
        clips are stream-copied (decodable, keyframe-snapped)."""
        from acav100m_tpu.pipeline.clip_segmentation import (
            NativeAvVideoBackend,
            segment_video,
        )

        n = int(FPS * SECONDS)
        video = np.concatenate([
            synth_video_frames(n),
            np.ascontiguousarray(255 - synth_video_frames(n, phase=23)[:, ::-1]),
        ])
        src = tmp_path / "video.mp4"
        encode_fixture(src, frames=video, audio=tone(330, seconds=2 * SECONDS))

        backend = NativeAvVideoBackend(src)
        assert backend.duration() == pytest.approx(2 * SECONDS, rel=0.1)
        boundaries, scores = backend.detect_shots(threshold=10.0)
        assert any(abs(b - SECONDS) < 2 / FPS for b in boundaries), (
            f"cut at t={SECONDS}s not detected: {boundaries}")

        clips, paths = segment_video(
            backend, tmp_path / "clips", "video", num_clips=2,
            clip_duration=4.0, threshold=10.0,
        )
        assert 1 <= len(paths) <= 2
        for p in paths:
            out = native_av.decode(path=p, size=0, sample_rate=SR)
            assert out is not None and out["frames"].shape[0] > 0
            # stream copy keeps the audio stream too
            assert len(out["audio"]) > 0
            assert peak_freq(out["audio"], SR) == pytest.approx(330, abs=5)

    def test_remux_is_keyframe_snapped_stream_copy(self, tmp_path):
        src = tmp_path / "fix.mp4"
        encode_fixture(src)
        dst = tmp_path / "clip.mp4"
        assert native_av.remux_clip(src, dst, start=1.5, duration=2.0)
        out = native_av.decode(path=dst, size=0, sample_rate=SR)
        # -ss -c copy snaps back to the previous keyframe: the clip is at
        # least the requested duration, at most one GOP longer
        dur = out["frames"].shape[0] / FPS
        assert 2.0 - 1 / FPS <= dur <= 2.0 + 12 / FPS + 1 / FPS

    def test_open_video_backend_auto(self, tmp_path):
        from acav100m_tpu.pipeline.clip_segmentation import (
            NativeAvVideoBackend,
            open_video_backend,
        )

        src = tmp_path / "fix.mp4"
        encode_fixture(src)
        assert isinstance(open_video_backend(src), NativeAvVideoBackend)


def make_av_shards(out_dir: Path, freqs, seconds=SECONDS, num_shards=1):
    """REAL mpeg4+AAC mp4 members + stage-3 shard jsons."""
    out_dir.mkdir(parents=True, exist_ok=True)
    n = int(FPS * seconds)
    per_shard = [freqs[si::num_shards] for si in range(num_shards)]
    count = 0
    for si, shard_freqs in enumerate(per_shard):
        meta = []
        with tarfile.open(out_dir / f"shard-{si:06d}.tar", "w") as tf:
            for freq in shard_freqs:
                import tempfile

                with tempfile.NamedTemporaryFile(suffix=".mp4") as f:
                    encode_fixture(Path(f.name), n_frames=n, freq=freq)
                    data = Path(f.name).read_bytes()
                fname = f"clip_{si:03d}_{count:03d}.mp4"
                count += 1
                info = tarfile.TarInfo(fname)
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
                meta.append({"filename": fname, "id": f"vid{count:06d}",
                             "segment": [0.0, float(seconds)]})
        (out_dir / f"shard-{si:06d}.json").write_text(json.dumps(meta))
    return str(out_dir / "shard-000000.tar")


class TestAvAlignment:
    def test_audio_start_zero_on_plain_fixture(self, tmp_path):
        path = tmp_path / "fix.mp4"
        encode_fixture(path)
        dec = native_av.decode(path=path, size=SIZE, sample_rate=SR)
        # pre-0 samples are trimmed (reference _align_audio_frames,
        # video.py:152-163); a plain encode starts at ~0
        assert dec["audio_start"] >= 0.0
        assert dec["audio_start"] == pytest.approx(0.0, abs=0.05)

    def test_snapped_stream_copy_keeps_av_events_in_sync(self, tmp_path):
        """A/V sync through keyframe-snapped stream copy: the remux rebases
        every stream by ONE shared origin (ffmpeg's -avoid_negative_ts,
        extract_clips.py:88-94) — per-stream rebasing would skew the clip's
        audio against its video. Source has a visual hard cut AND an audio
        tone change at the same instant; after cutting a window whose start
        snaps to an earlier keyframe, both events must land on the same
        clip-relative time."""
        fps, seconds = 8.0, 8
        n = int(fps * seconds)
        half = n // 2
        fa = synth_video_frames(half)
        fb = 255 - synth_video_frames(half, phase=37)  # luma flip at cut
        frames = np.concatenate([fa, fb])
        audio = np.concatenate(
            [tone(220.0, seconds=seconds / 2), tone(1760.0, seconds=seconds / 2)]
        )
        src = tmp_path / "src.mp4"
        assert native_av.encode_mp4(src, frames, fps=fps, audio=audio,
                                    sample_rate=SR)
        out = tmp_path / "clip.mp4"
        # window [3, 7): the t=4 s event sits inside; start snaps backward
        assert native_av.remux_clip(src, out, 3.0, 4.0)
        dec = native_av.decode(path=out, size=SIZE, sample_rate=SR,
                               with_scores=True)
        assert dec["audio_start"] >= 0.0
        assert dec["frames"].shape[0] > 0 and len(dec["audio"]) > 0
        t_video = float(dec["frame_times"][int(np.argmax(dec["scene_scores"]))])
        # audio event: first 100 ms window whose dominant tone is the high one
        sr, a = SR, dec["audio"]
        win = int(0.1 * sr)
        t_audio = None
        for s0 in range(0, len(a) - win, win // 2):
            if peak_freq(a[s0:s0 + win], sr) > 900.0:
                t_audio = dec["audio_start"] + (s0 + win / 2) / sr
                break
        assert t_audio is not None, "tone transition not found in clip"
        assert abs(t_video - t_audio) < 0.2, (
            f"A/V events diverged: video cut at {t_video:.3f}s, "
            f"audio transition at {t_audio:.3f}s"
        )


class TestWorkerPoolWithNativeDecode:
    def test_spawned_decode_workers_load_the_native_lib(self, tmp_path):
        """Production decode runs in spawned worker processes — each child
        must pickle the NativeAvDecoder config and CDLL the library
        independently, and every mp4 clip must arrive exactly once."""
        import functools

        from acav100m_tpu.data.meta import load_metadata
        from acav100m_tpu.data.tar_dataset import make_loader

        make_av_shards(tmp_path / "tars", freqs=[440.0, 880.0, 660.0, 330.0],
                       num_shards=2)
        shards = sorted((tmp_path / "tars").glob("*.tar"))
        assert len(shards) == 2
        metas, _ = load_metadata(shards)
        dec = NativeAvDecoder(size=SIZE, sample_rate=SR, sample_frames=8)
        prepare = functools.partial(prepare_clip, num_frames=8,
                                    duration=float(SECONDS),
                                    audio_samples=SR * SECONDS)
        seen = []
        for b in make_loader(shards, metas, batch_size=2, decoder=dec,
                             prepare=prepare, num_workers=2, prefetch=2):
            for i in range(len(b["filename"])):
                if b["batch_mask"][i]:
                    seen.append(b["filename"][i])
                    assert b["frames"][i].shape[0] == 8
                    assert float(np.abs(b["audio"][i]).max()) > 0.1
        assert len(seen) == 4 and len(set(seen)) == 4


class TestEvaluationPretrainOnRealMedia:
    def test_pretrain_batches_from_mp4_shard(self, tmp_path):
        """The §2.8 ACAV pretrain dataset contract on REAL compressed
        media: curated mp4+AAC tar -> native decode at 44.1 kHz -> random
        visual window + aligned 2 s audio window -> log-mel 80x128
        (reference data/contrast.py:25-179 used PyAV + torchaudio)."""
        from acav100m_tpu.data.meta import load_metadata
        from acav100m_tpu.evaluation.data import pretrain_batches

        make_av_shards(tmp_path / "tars", freqs=[440.0, 880.0, 1760.0])
        shards = sorted((tmp_path / "tars").glob("*.tar"))
        metas, _ = load_metadata(shards)
        rng = np.random.RandomState(0)
        dec = NativeAvDecoder(size=SIZE, sample_rate=44100)
        batches = list(pretrain_batches(shards, metas, batch_size=3, rng=rng,
                                        num_frames=4, crop=48, decoder=dec))
        assert len(batches) == 1
        b = batches[0]
        assert b["visual"].shape == (3, 4, 48, 48, 3)
        assert b["audio"].shape == (3, 80, 128, 1)
        # real AAC audio reached the log-mel frontend: energy present and
        # different tones produce different spectrograms
        a = b["audio"][..., 0]
        assert float(np.ptp(a)) > 0
        assert not np.allclose(a[0], a[1])


class TestStage4WithRealAudio:
    def test_extraction_audio_features_hear_the_tone(self, tmp_path):
        """Stages 3→4 with REAL AAC audio: the extraction driver decodes
        mp4 members natively and VGGish features distinguish clips by
        their audio content — closing the silent-audio delta of the
        OpenCV-only path."""
        from acav100m_tpu.pipeline import feature_extraction as fe
        from acav100m_tpu.utils.io import load_pickle

        spec = make_av_shards(tmp_path / "clips",
                              freqs=[220.0, 220.0, 3520.0])
        cfg = fe.get_config({
            "data.media.path": spec,
            "data.output.path": str(tmp_path / "features"),
            "data.batch_size": 3,
        })
        saved = fe.run_extraction(
            cfg, decoder=NativeAvDecoder(size=SIZE, sample_rate=SR))
        rows = load_pickle(saved[0])
        assert len(rows) == 3
        rows = sorted(rows, key=lambda r: r["filename"])
        adims = [
            rows[0]["audio_features"][0]["array"][f"layer_{i}"].shape[-1]
            for i in range(5)
        ]
        assert adims == [64, 128, 256, 512, 128]
        emb = [np.asarray(r["audio_features"][0]["array"]["layer_4"],
                          np.float32).ravel() for r in rows]
        assert all(float(np.abs(e).mean()) > 0 for e in emb)

        def cos(a, b):
            return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

        same, diff = cos(emb[0], emb[1]), cos(emb[0], emb[2])
        assert same > diff + 0.01, (
            f"audio embeddings don't separate 220 Hz vs 3520 Hz: "
            f"same-tone cos {same}, cross-tone cos {diff}")
