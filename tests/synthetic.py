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


def crash_once_decoder(data, marker_path, crash_after=3):
    """decode_npz that HARD-KILLS its worker process (``os._exit`` — no
    exception, no queue message) on the ``crash_after``-th in-process decode,
    once globally (guarded by a marker file shared across processes). Tests
    the pooled loader's liveness detection + exactly-once shard requeue."""
    import os

    from acav100m_tpu.data.video import decode_npz

    global _CRASH_COUNT
    try:
        _CRASH_COUNT += 1
    except NameError:
        _CRASH_COUNT = 1
    marker = Path(marker_path)
    if _CRASH_COUNT >= crash_after and not marker.exists():
        marker.touch()
        os._exit(1)
    return decode_npz(data)


def make_pyslowfast_state_dict(rng):
    """Deterministic torch-style state dict for the REAL SlowFast-R50
    two-pathway topology (PySlowFast module names, numpy values) — the
    input contract of ``convert_pyslowfast_state_dict``."""
    import numpy as np

    from acav100m_tpu.models.slowfast import BETA_INV, STAGE_BLOCKS

    sd = {}

    def add_bn(prefix, c):
        sd[f"{prefix}.weight"] = (1 + 0.01 * rng.randn(c)).astype(np.float32)
        sd[f"{prefix}.bias"] = (0.01 * rng.randn(c)).astype(np.float32)
        sd[f"{prefix}.running_mean"] = (0.01 * rng.randn(c)).astype(np.float32)
        sd[f"{prefix}.running_var"] = (1 + 0.1 * np.abs(rng.randn(c))).astype(np.float32)

    sd["s1.pathway0_stem.conv.weight"] = (0.05 * rng.randn(64, 3, 1, 7, 7)).astype(np.float32)
    add_bn("s1.pathway0_stem.bn", 64)
    sd["s1.pathway1_stem.conv.weight"] = (0.05 * rng.randn(8, 3, 5, 7, 7)).astype(np.float32)
    add_bn("s1.pathway1_stem.bn", 8)
    for i, fc in enumerate([8, 32, 64, 128]):
        sd[f"s{i + 1}_fuse.conv_f2s.weight"] = (0.05 * rng.randn(fc * 2, fc, 7, 1, 1)).astype(np.float32)
        add_bn(f"s{i + 1}_fuse.bn", fc * 2)
    slow_in = [80, 320, 640, 1280]
    slow_out = [256, 512, 1024, 2048]
    slow_inner = [64, 128, 256, 512]
    slow_kt = [1, 1, 3, 3]
    for si in range(4):
        for pw in (0, 1):
            div = 1 if pw == 0 else BETA_INV
            cin = slow_in[si] if pw == 0 else (slow_out[si - 1] // BETA_INV if si else 8)
            cout, cinn = slow_out[si] // div, slow_inner[si] // div
            kt = slow_kt[si] if pw == 0 else 3
            for bi in range(STAGE_BLOCKS[si]):
                pre = f"s{si + 2}.pathway{pw}_res{bi}"
                bin_ = cin if bi == 0 else cout
                sd[f"{pre}.branch2.a.weight"] = (0.05 * rng.randn(cinn, bin_, kt, 1, 1)).astype(np.float32)
                add_bn(f"{pre}.branch2.a_bn", cinn)
                sd[f"{pre}.branch2.b.weight"] = (0.05 * rng.randn(cinn, cinn, 1, 3, 3)).astype(np.float32)
                add_bn(f"{pre}.branch2.b_bn", cinn)
                sd[f"{pre}.branch2.c.weight"] = (0.05 * rng.randn(cout, cinn, 1, 1, 1)).astype(np.float32)
                add_bn(f"{pre}.branch2.c_bn", cout)
                if bi == 0:
                    sd[f"{pre}.branch1.weight"] = (0.05 * rng.randn(cout, bin_, 1, 1, 1)).astype(np.float32)
                    add_bn(f"{pre}.branch1_bn", cout)
    return sd
