"""Smoke the bench's measurement legs in-process (CPU mesh, toy shapes).

`bench.py` is a driver deliverable — an API drift that only surfaces in
the end-of-round TPU run is too late. These call the leg functions
directly at tiny shapes; the numbers are meaningless on CPU, the shapes
and key sets are the contract.

Round-4 additions (VERDICT missing #1): the bench must deliver its JSON
artifact no matter what — `BenchState` budget/skip/emit logic is
unit-tested with a fake clock, and a subprocess test SIGTERMs a running
smoke bench and asserts a valid JSON line still appears on stdout.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


class TestBenchState:
    def _state(self, budget=100.0):
        from bench import BenchState

        clock = FakeClock()
        return BenchState(budget_s=budget, now=clock, smoke=False), clock

    def test_optional_leg_skipped_when_budget_tight(self):
        st, clock = self._state(budget=100.0)
        clock.t = 50.0  # remaining 50 < mp4_decode estimate (90)
        ran = []
        out = st.run_leg("mp4_decode", lambda: ran.append(1))
        assert out is None and not ran
        assert st.legs_skipped == ["mp4_decode"]

    def test_required_leg_runs_past_budget(self):
        st, clock = self._state(budget=10.0)
        clock.t = 999.0
        st.run_leg("extract_timeit", lambda: st.headline.update(
            {"t_extract": 0.01}), required=True)
        assert st.legs_done == ["extract_timeit"]

    def test_leg_exception_recorded_not_fatal(self):
        st, _ = self._state(budget=10_000.0)  # ample: reach the leg body

        def boom():
            raise RuntimeError("kaput")

        assert st.run_leg("e2e", boom) is None
        assert "RuntimeError: kaput" in st.detail["e2e_error"]
        assert st.legs_done == []

    def test_payload_full_headline(self):
        st, _ = self._state()
        st.headline.update(
            {"t_extract": 0.002, "t_cluster": 0.0005, "t_select": 0.0005})
        p = st.payload()
        assert p["value"] == round(1.0 / 0.003, 3)
        assert p["unit"] == "clips/sec/chip"
        assert p["detail"]["status"] == "complete"
        json.dumps(p)  # must be JSON-serializable

    def test_payload_partial_falls_back_to_extract(self):
        st, _ = self._state()
        st.headline["t_extract"] = 0.004
        p = st.payload(status="partial")
        assert p["value"] == 250.0
        assert "PARTIAL" in p["metric"]
        assert p["detail"]["status"] == "partial"

    def test_payload_no_headline_still_valid(self):
        st, _ = self._state()
        st.detail["build_models_error"] = "x"
        p = st.payload(status="partial")
        assert p["value"] == 0.0
        json.dumps(p)

    def test_emit_is_single_shot(self, capsys):
        st, _ = self._state()
        st.headline["t_extract"] = 0.01
        st.emit()
        st.emit()
        out = capsys.readouterr().out.strip().splitlines()
        assert len(out) == 1
        json.loads(out[0])

    def test_env_budget_honored(self, monkeypatch):
        from bench import BenchState

        monkeypatch.setenv("ACAV_BENCH_BUDGET_S", "42.5")
        st = BenchState()
        assert st.budget_s == 42.5


@pytest.mark.slow
def test_bench_sigterm_emits_json():
    """SIGTERM a running smoke bench; a valid one-line JSON artifact must
    still appear on stdout with rc=0 (the round-3 failure mode: driver
    timeout killed the bench ~1600 s in and no JSON ever printed)."""
    env = dict(os.environ)
    env.update({
        "ACAV_BENCH_SMOKE": "1",
        "JAX_PLATFORMS": "cpu",
        "ACAV_BENCH_BUDGET_S": "3600",
    })
    proc = subprocess.Popen(
        [sys.executable, str(REPO / "bench.py")],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, cwd=REPO,
    )
    try:
        time.sleep(10)  # mid build/compile of the first leg
        proc.send_signal(signal.SIGTERM)
        out, err = proc.communicate(timeout=300)
    except Exception:
        proc.kill()
        raise
    assert proc.returncode == 0, err.decode()[-2000:]
    lines = [l for l in out.decode().splitlines() if l.startswith("{")]
    assert lines, f"no JSON on stdout; stderr tail: {err.decode()[-2000:]}"
    payload = json.loads(lines[-1])
    assert {"metric", "value", "unit", "vs_baseline", "detail"} <= set(payload)
    assert payload["detail"]["status"] in ("partial", "complete")
    if payload["detail"]["status"] == "partial":
        assert payload["detail"]["interrupted_by"] in ("SIGTERM", "SIGALRM")


def test_bench_watchdog_emits_when_signals_cannot():
    """The failure mode signals can't cover: the main thread parked inside
    ONE native call for the whole budget (observed live: a hung TPU-tunnel
    RPC blocked `jax.devices()` for 20+ minutes — Python only runs signal
    handlers between bytecodes, so the SIGALRM/SIGTERM emitters never
    fired). Simulated here by BLOCKING those signals at the OS level and
    sleeping past the budget; only the watchdog daemon thread can emit."""
    code = (
        "import signal, sys, time\n"
        "sys.path.insert(0, sys.argv[1])\n"
        "from bench import BenchState\n"
        "st = BenchState(budget_s=2.0)\n"
        "st.install_signal_emitters()\n"
        "st.install_watchdog(grace_s=1.0)\n"
        "signal.pthread_sigmask(signal.SIG_BLOCK,\n"
        "    {signal.SIGTERM, signal.SIGALRM, signal.SIGINT})\n"
        "time.sleep(120)  # 'hung native call' stand-in\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code, str(REPO)],
        capture_output=True, timeout=60, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr.decode()[-2000:]
    lines = [l for l in proc.stdout.decode().splitlines()
             if l.startswith("{")]
    assert lines, "watchdog did not emit"
    payload = json.loads(lines[-1])
    assert payload["detail"]["status"] == "partial"
    assert payload["detail"]["interrupted_by"] == "watchdog_thread"


@pytest.mark.slow
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
