"""Synthetic clip shards for pipeline tests (the reference's missing
``samples_tiny`` fixtures, rebuilt as npz clips)."""

import io
import json
import tarfile
from pathlib import Path

import numpy as np


def make_clip_npz(rng, num_frames=32, size=64, sr=16000, seconds=10.0,
                  klass=0):
    """One synthetic clip: class-tinted noise video + class-toned audio."""
    frames = rng.randint(0, 60, (num_frames, size, size, 3)).astype(np.uint8)
    frames[..., klass % 3] += np.uint8(120 + 20 * (klass % 4))
    t = np.arange(int(sr * seconds)) / sr
    freq = 220.0 * (1 + klass)
    audio = (0.4 * np.sin(2 * np.pi * freq * t)
             + 0.05 * rng.randn(len(t))).astype(np.float32)
    buf = io.BytesIO()
    np.savez(buf, frames=frames, audio=audio, sample_rate=sr,
             video_fps=num_frames / seconds)
    return buf.getvalue()


def make_shards(out_dir, num_shards=2, clips_per_shard=4, seed=0,
                num_frames=32, size=64, num_classes=4):
    """Write shard-XXXXXX.tar + .json pairs; returns the brace spec path."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(seed)
    count = 0
    for si in range(num_shards):
        tar_path = out_dir / f"shard-{si:06d}.tar"
        meta = []
        with tarfile.open(tar_path, "w") as tf:
            for ci in range(clips_per_shard):
                fname = f"clip_{si:03d}_{ci:03d}.npz"
                data = make_clip_npz(
                    rng, num_frames=num_frames, size=size,
                    klass=count % num_classes,
                )
                info = tarfile.TarInfo(fname)
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
                meta.append(
                    {
                        "filename": fname,
                        "id": f"vid{si:03d}{ci:03d}",
                        "segment": [float(ci), float(ci) + 10.0],
                    }
                )
                count += 1
        (out_dir / f"shard-{si:06d}.json").write_text(json.dumps(meta))
    spec = out_dir / ("shard-{000000..%06d}" % (num_shards - 1))
    return str(spec)


def marking_decoder(data, marker_dir):
    """decode_npz that also drops a marker file per decode — lets tests
    count how many clips the worker processes have decoded so far."""
    import uuid

    from acav100m_tpu.data.video import decode_npz

    Path(marker_dir).joinpath(uuid.uuid4().hex).touch()
    return decode_npz(data)
