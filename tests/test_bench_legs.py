"""Smoke the bench's measurement legs in-process (CPU mesh, toy shapes).

`bench.py` is a driver deliverable — an API drift that only surfaces in
the end-of-round TPU run is too late. These call the leg functions
directly at tiny shapes; the numbers are meaningless on CPU, the shapes
and key sets are the contract.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_bench_pretrain_smoke():
    from bench import bench_pretrain

    out = bench_pretrain(smoke=True)
    assert out["t_pretrain_step_ms"] > 0
    assert out["pretrain_clips_per_sec"] > 0
    assert out["pretrain_batch"] == 8


def test_bench_scale_select_smoke():
    from bench import bench_scale_select

    out = bench_scale_select(v=2000, batch=128)
    assert out["scale_select_step_ms"] > 0
    assert out["scale_select_scan_clips_per_sec"] > 0
    assert out["scale_select_projected_140M_scan_minutes"] > 0


def test_bench_mp4_decode_smoke():
    from bench import bench_mp4_decode

    out = bench_mp4_decode(size=64, seconds=2, fps=8.0, sample_frames=4)
    if out is None:  # native lib unavailable in this image
        return
    assert set(out) == {"full", "sampled_4"}
    assert all(v > 0 for v in out.values())
