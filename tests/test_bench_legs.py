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
    def _state(self, budget=100.0, tmp_path=None):
        from bench import BenchState

        assert tmp_path is not None  # pytest tmp_path: auto-cleaned
        clock = FakeClock()
        detail = Path(tmp_path) / "BENCH_DETAIL.json"
        return (BenchState(budget_s=budget, now=clock, smoke=False,
                           detail_path=detail), clock)

    def test_optional_leg_skipped_when_budget_tight(self, tmp_path):
        st, clock = self._state(tmp_path=tmp_path, budget=100.0)
        clock.t = 50.0  # remaining 50 < mp4_decode estimate (90)
        ran = []
        out = st.run_leg("mp4_decode", lambda: ran.append(1))
        assert out is None and not ran
        assert st.legs_skipped == ["mp4_decode"]

    def test_required_leg_runs_past_budget(self, tmp_path):
        st, clock = self._state(tmp_path=tmp_path, budget=10.0)
        clock.t = 999.0
        st.run_leg("extract_timeit", lambda: st.headline.update(
            {"t_extract": 0.01}), required=True)
        assert st.legs_done == ["extract_timeit"]

    def test_leg_exception_recorded_not_fatal(self, tmp_path):
        st, _ = self._state(tmp_path=tmp_path, budget=10_000.0)  # ample: reach the leg body

        def boom():
            raise RuntimeError("kaput")

        assert st.run_leg("e2e", boom) is None
        assert "RuntimeError: kaput" in st.detail["e2e_error"]
        assert st.legs_done == []

    def test_payload_full_headline(self, tmp_path):
        st, _ = self._state(tmp_path=tmp_path)
        st.headline.update(
            {"t_extract": 0.002, "t_cluster": 0.0005, "t_select": 0.0005})
        p = st.payload()
        assert p["value"] == round(1.0 / 0.003, 3)
        assert p["unit"] == "clips/sec/chip"
        assert p["detail"]["status"] == "complete"
        json.dumps(p)  # must be JSON-serializable

    def test_payload_partial_falls_back_to_extract(self, tmp_path):
        st, _ = self._state(tmp_path=tmp_path)
        st.headline["t_extract"] = 0.004
        p = st.payload(status="partial")
        assert p["value"] == 250.0
        assert "PARTIAL" in p["metric"]
        assert p["detail"]["status"] == "partial"

    def test_payload_no_headline_still_valid(self, tmp_path):
        st, _ = self._state(tmp_path=tmp_path)
        st.detail["build_models_error"] = "x"
        p = st.payload(status="partial")
        assert p["value"] == 0.0
        json.dumps(p)

    def test_emit_is_single_shot(self, capsys, tmp_path):
        st, _ = self._state(tmp_path=tmp_path)
        st.headline["t_extract"] = 0.01
        st.emit()
        st.emit()
        out = capsys.readouterr().out.strip().splitlines()
        assert len(out) == 1
        json.loads(out[0])

    def test_env_budget_honored(self, monkeypatch, tmp_path):
        from bench import BenchState

        monkeypatch.setenv("ACAV_BENCH_BUDGET_S", "42.5")
        st = BenchState(detail_path=tmp_path / "d.json")
        assert st.budget_s == 42.5

    # -- compact stdout line + sidecar (round-4 VERDICT task 1/6) --------

    def _populate_every_leg(self, st):
        """Fill detail with EVERY field a full non-smoke run produces —
        mirrored from the real BENCH_r04 artifact plus the round-5
        additions (passes markers, flops cross-check, suspect flags). The
        compact line must stay inside the driver's tail window with all
        of this present."""
        st.headline.update({"t_extract": 0.0021672, "t_cluster": 2.74e-05,
                            "t_select": 3.8e-06})
        st.legs_done += [
            "build_models", "extract_timeit", "extract_cost_analysis",
            "kmeans", "select_timeit", "parity_select_timeit", "mp4_decode",
            "e2e", "pretrain", "int8_extract", "scale_select", "per_stage"]
        st.legs_skipped += []
        st.detail.update({
            "extract_batch": 256, "extract_dtype": "bfloat16",
            "baseline_anchor": "estimated 16 clips/sec/GPU x 5x target "
                               "(reference publishes no throughput numbers)",
            "t_extract_ms": 2.167, "device": "TPU v5 lite0",
            "extract_flops_per_batch": 42866550243328.0,
            "extract_hbm_bytes_per_batch": 271548579840.0,
            "mfu_peak_assumption": "TPU v5 lite: 197.0 TFLOP/s bf16",
            "achieved_tflops": 77.3, "mfu_pct": 39.2,
            "extract_hbm_util_pct": 59.8,
            "t_cluster_ms": 0.0274, "t_select_ms": 0.0038,
            "select_mode_note": "t_select_ms is the TPU-scaled B=1024/"
                                "k=205 mode; bit-match-eligible runs use "
                                "the reference config B=20/k=4 in f64 "
                                "(t_select_parity_*), a different "
                                "algorithmic trajectory (see PARITY.md)",
            "t_select_parity_B20_k4_f64_ms": 0.2494,
            "mp4_decode_clips_per_sec_per_core": {"full": 5.855,
                                                  "sampled_32": 28.14},
            "mp4_decode_passes": {"full": [5.855, 5.2, 4.9],
                                  "sampled_32": [28.14, 27.0, 22.3]},
            "mp4_decode_note": "native FFmpeg-library decode (video+AAC "
                               "audio, 10 s 256p mpeg4 clip, 16 kHz mono "
                               "out); best-of-3, all passes recorded",
            "e2e_clips_per_sec": 3.22,
            "e2e_note": "tar->decode pool->H2D->extract wall clock; on "
                        "this tunneled dev chip H2D is the floor",
            "h2d_gbps": 0.0701, "h2d_gbps_passes": [0.0701, 0.065, 0.042],
            "h2d_note": "best-of-3, all passes recorded; tunnel weather, "
                        "not PCIe",
            "host_pipeline_clips_per_sec_by_workers": {"0": 91.5, "1": 62.3,
                                                       "2": 58.1},
            "host_pipeline_passes_by_workers": {"0": [91.5, 88.2, 47.1],
                                                "1": [62.3, 60.0, 31.5],
                                                "2": [58.1, 55.5, 28.0]},
            "host_cores": 1,
            "host_note": "host legs are best-of-N passes, all passes "
                         "recorded (shared dev rigs show bursty CPU-steal "
                         "noise on identical passes); with 1 core the 1/2-"
                         "worker points exercise the pool path "
                         "oversubscribed (IPC overhead bound), not scaling",
            "e2e_workers": 0, "e2e_projected_clips_per_sec": 10.11,
            "e2e_bottleneck_leg": "h2d",
            "e2e_legs_clips_per_sec": {"host_pipeline": 91.5, "h2d": 10.11,
                                       "device_extract": 461.45},
            "e2e_overlap_efficiency": 0.319,
            "t_pretrain_step_ms": 49.492, "pretrain_clips_per_sec": 1293.1,
            "pretrain_batch": 64, "pretrain_mfu_pct": 24.1,
            "pretrain_hbm_util_pct": 142.1,
            "pretrain_step_flops": 2.35e12, "pretrain_fwd_flops": 1.8e12,
            "pretrain_step_fwd_flops_ratio": 1.31,
            "pretrain_note": "contrastive pretrain step (3D-R50+2D-R50+"
                             "InfoNCE, global batch 64, 8x112^2, bf16 "
                             "compute); at this rate one epoch over the "
                             "100M-clip ACAV100M takes 21.5 chip-hours",
            "suspect": [
                "pretrain_hbm_util_pct=142.1 > 100% of the HBM wall is "
                "physically impossible: XLA 'bytes accessed' is an "
                "HLO-level operand-byte overcount, not measured HBM "
                "traffic — treat as an upper bound, not a utilization",
                "pretrain_step_fwd_flops_ratio=1.31 outside the fwd+bwd "
                "[2,4.5] band: step-counted flops unreliable, "
                "pretrain_mfu_pct derived from them is not a fact",
                "mfu_pct=101.0 > 100% of the MXU wall is "
                "physically impossible: counted flops or dt is wrong",
            ],
            "t_extract_int8_ms": 1.899, "int8_speedup_vs_bf16": 1.141,
            "int8_note": "int8 s2..s5 convs on both pathways, static "
                         "one-batch calibration; documented-numerics mode",
            "scale_select_v": 10_000_000, "scale_select_batch": 4096,
            "scale_select_init_s": 35.2, "scale_select_step_ms": 11.1,
            "scale_select_scan_clips_per_sec": 369000.0,
            "scale_select_projected_140M_scan_minutes": 6.3,
            "per_stage_ms": {f"s{i}_{p}": {"ms": 1.0, "mfu_pct": 40.0,
                                           "hbm_util_pct": 50.0,
                                           "bound": "hbm",
                                           "roofline_pct": 50.0}
                             for i in range(1, 6)
                             for p in ("slow", "fast", "fuse")},
            "interrupted_by": "SIGALRM", "interrupted_at_s": 1200.4,
        })

    def test_compact_line_fits_driver_tail_window(self, tmp_path):
        """Round-4 VERDICT task 1: the FINAL stdout line must parse inside
        the driver's 2000-char tail window with EVERY leg populated —
        rounds 3-4 lost the headline to payload growth. Budget < 1500."""
        st, _ = self._state(tmp_path=tmp_path)
        self._populate_every_leg(st)
        line = json.dumps(st.payload_compact(status="partial"))
        assert len(line) < 1500, f"compact line {len(line)} chars:\n{line}"
        p = json.loads(line)
        assert {"metric", "value", "unit", "vs_baseline",
                "value_parity_trajectory", "detail"} <= set(p)
        d = p["detail"]
        assert d["mfu_pct"] == 39.2
        assert d["extract_hbm_util_pct"] == 59.8
        assert d["t_extract_ms"] == 2.167
        assert d["t_cluster_ms"] == 0.0274
        assert d["t_select_ms"] == 0.0038
        assert d["t_select_parity_B20_k4_f64_ms"] == 0.2494
        assert d["status"] == "partial"
        assert d["legs_done"] == 12 and d["legs_skipped"] == 0
        assert d["detail_file"] == "BENCH_DETAIL.json"
        assert d["interrupted_by"] == "SIGALRM"
        # suspect flags survive compaction as short claims
        assert len(d["suspect"]) == 3
        assert all(len(s) < 100 for s in d["suspect"])
        assert "pretrain_hbm_util_pct=142.1 > 100% of the HBM wall is " \
               "physically impossible" in d["suspect"][0]

    def test_both_selection_mode_headlines(self, tmp_path):
        """Round-4 VERDICT task 6: the reference-trajectory (B=20/k=4 f64)
        composition is first-class next to the TPU-scaled one."""
        st, _ = self._state(tmp_path=tmp_path)
        st.headline.update({"t_extract": 0.002, "t_cluster": 0.0005,
                            "t_select": 0.0005})
        st.detail["t_select_parity_B20_k4_f64_ms"] = 0.25
        p = st.payload()
        assert p["value"] == round(1.0 / 0.003, 3)
        assert p["value_parity_trajectory"] == round(
            1.0 / (0.002 + 0.0005 + 0.00025), 3)
        c = st.payload_compact()
        assert c["value_parity_trajectory"] == p["value_parity_trajectory"]

    def test_emit_writes_sidecar_and_compact_stdout(self, capsys, tmp_path):
        st, _ = self._state(tmp_path=tmp_path)
        self._populate_every_leg(st)
        st.emit()
        out = capsys.readouterr().out.strip().splitlines()
        assert len(out) == 1 and len(out[0]) < 1500
        compact = json.loads(out[0])
        full = json.loads(st.detail_path.read_text())
        # same headline, full detail a superset of the compact scalars
        assert full["value"] == compact["value"]
        assert full["value_parity_trajectory"] == \
               compact["value_parity_trajectory"]
        assert full["detail"]["pretrain_note"]  # sidecar keeps the prose
        for k in ("mfu_pct", "t_extract_ms", "t_cluster_ms"):
            assert full["detail"][k] == compact["detail"][k]

    def test_emit_sidecar_serialization_error_cannot_sink_stdout(
            self, capsys, tmp_path):
        """Round-5 review: a non-JSON-serializable detail value used to
        raise out of emit() (only OSError was caught), skipping the stdout
        line AND the signal handler's os._exit — the exact lost-artifact
        failure the emitter exists to prevent. Sidecar failures must be
        isolated from the compact line."""
        st, _ = self._state(tmp_path=tmp_path)
        st.headline["t_extract"] = 0.01
        st.detail["poison"] = object()  # sidecar-only key: not COMPACT
        st.emit()
        out = capsys.readouterr().out.strip().splitlines()
        assert len(out) == 1
        payload = json.loads(out[0])
        assert payload["value"] == 100.0  # headline intact
        assert not st.detail_path.exists()  # sidecar lost, disclosed below
        assert st.emitted

    def test_emit_compact_assembly_error_falls_back_to_minimal_line(
            self, capsys, tmp_path):
        """If even the compact payload can't serialize (a poisoned
        COMPACT_KEY), emit() must still print SOME parseable JSON line and
        mark itself emitted rather than raise."""
        st, _ = self._state(tmp_path=tmp_path)
        st.headline["t_extract"] = 0.01
        st.detail["mfu_pct"] = object()  # COMPACT_KEY: breaks json.dumps
        st.emit()
        out = capsys.readouterr().out.strip().splitlines()
        assert len(out) == 1
        payload = json.loads(out[0])
        assert payload["detail"]["status"] == "emit_error"
        assert "TypeError" in payload["detail"]["error"]
        assert st.emitted

    def test_emit_masks_signals_during_critical_section(self, monkeypatch,
                                                        capsys, tmp_path):
        """ADVICE r4 medium: the SIGTERM/SIGALRM handler itself calls
        emit(); a signal landing while the main thread holds the
        non-reentrant emit lock would self-deadlock. emit() therefore
        masks those signals across the locked section — asserted here at
        print time (inside the lock), with the mask restored after."""
        import builtins
        import signal as sigmod

        st, _ = self._state(tmp_path=tmp_path)
        st.headline["t_extract"] = 0.01
        before = sigmod.pthread_sigmask(sigmod.SIG_BLOCK, set())
        masks = []
        real_print = builtins.print

        def spy_print(*a, **k):
            masks.append(sigmod.pthread_sigmask(sigmod.SIG_BLOCK, set()))
            return real_print(*a, **k)

        monkeypatch.setattr(builtins, "print", spy_print)
        st.emit()
        monkeypatch.undo()
        assert masks, "emit printed nothing"
        for m in masks:
            assert {sigmod.SIGTERM, sigmod.SIGALRM,
                    sigmod.SIGINT} <= set(m)
        after = sigmod.pthread_sigmask(sigmod.SIG_BLOCK, set())
        assert set(after) == set(before)  # mask restored on exit

    def test_emit_survives_unwritable_sidecar(self, capsys, tmp_path):
        st, _ = self._state(tmp_path=tmp_path / "nodir" / "deeper")
        st.headline["t_extract"] = 0.01
        st.emit()  # sidecar open() fails (missing parent) — line must land
        out = capsys.readouterr().out.strip().splitlines()
        assert len(out) == 1
        assert json.loads(out[0])["value"] == 100.0


@pytest.mark.slow
def test_bench_sigterm_emits_json(tmp_path):
    """SIGTERM a running smoke bench; a valid one-line JSON artifact must
    still appear on stdout with rc=0 (the round-3 failure mode: driver
    timeout killed the bench ~1600 s in and no JSON ever printed)."""
    env = dict(os.environ)
    env.update({
        "ACAV_BENCH_SMOKE": "1",
        "JAX_PLATFORMS": "cpu",
        "ACAV_BENCH_BUDGET_S": "3600",
        "ACAV_BENCH_DETAIL": str(tmp_path / "BENCH_DETAIL.json"),
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
    assert len(lines[-1]) < 1500  # must parse inside the driver tail window
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
        "st = BenchState(budget_s=2.0, detail_path=sys.argv[2])\n"
        "st.install_signal_emitters()\n"
        "st.install_watchdog(grace_s=1.0)\n"
        "signal.pthread_sigmask(signal.SIG_BLOCK,\n"
        "    {signal.SIGTERM, signal.SIGALRM, signal.SIGINT})\n"
        "time.sleep(120)  # 'hung native call' stand-in\n"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        proc = subprocess.run(
            [sys.executable, "-c", code, str(REPO),
             str(Path(td) / "BENCH_DETAIL.json")],
            capture_output=True, timeout=60, cwd=REPO,
        )
    assert proc.returncode == 0, proc.stderr.decode()[-2000:]
    lines = [l for l in proc.stdout.decode().splitlines()
             if l.startswith("{")]
    assert lines, "watchdog did not emit"
    payload = json.loads(lines[-1])
    assert payload["detail"]["status"] == "partial"
    assert payload["detail"]["interrupted_by"] == "watchdog_thread"


def test_roofline_suspects():
    """>100% of either wall is flagged, never published as fact (round-4
    VERDICT weak #1: 142% HBM util went out unmarked)."""
    from bench import _roofline_suspects

    assert _roofline_suspects("a", 50.0, "b", 80.0) == []
    assert _roofline_suspects("a", None, "b", None) == []
    sus = _roofline_suspects("pretrain_mfu_pct", 101.0,
                             "pretrain_hbm_util_pct", 142.1)
    assert len(sus) == 2
    assert sus[0].startswith("pretrain_mfu_pct=101.0")
    assert sus[1].startswith("pretrain_hbm_util_pct=142.1")
    assert all("physically impossible" in s for s in sus)
    # compact-line truncation keeps the claim readable
    assert all(len(s.split(":")[0]) < 100 for s in sus)


@pytest.mark.slow
def test_bench_pretrain_smoke():
    from bench import bench_pretrain

    out = bench_pretrain(smoke=True)
    assert out["t_pretrain_step_ms"] > 0
    assert out["pretrain_clips_per_sec"] > 0
    assert out["pretrain_batch"] == 8
    # the roofline sanity contract: a suspect list always present, and the
    # step/fwd flops cross-check computed whenever the backend counts flops
    assert isinstance(out["suspect"], list)
    if out.get("pretrain_step_flops") and out.get("pretrain_fwd_flops"):
        assert out["pretrain_step_fwd_flops_ratio"] > 0


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
    assert set(out) == {"full", "sampled_4", "passes"}
    passes = out.pop("passes")
    assert all(v > 0 for v in out.values())
    # variance markers: every rate is a best-of-3 with all passes recorded
    assert set(passes) == {"full", "sampled_4"}
    for label, rates in passes.items():
        assert len(rates) == 3 and max(rates) == out[label]
