"""Stage-3 executable parity: the reference's OWN ``extract_clips.py``
driven against ``pipeline.clip_segmentation.segment_video``.

``clip_segmentation/code/extract_clips.py`` is pure stdlib+numpy except for
four subprocess surfaces (ffprobe duration, ffmpeg scdet SBD, ffmpeg clip
extraction, ffmpeg signature similarity).  Those four are injected with
deterministic fakes — the SAME fake tables on both sides — so what is
compared is everything else: the threshold-annealing loop (×1.2 until
>= num_clips valid shots or threshold >= 100, extract_clips.py:199-213),
valid-clip center-cropping (:65-78), the mean-clip fallback (:215-223),
short-video num_clips halving (:191-197), and all five samplers including
their RNG consumption order and file save/delete bookkeeping (:252-335).

RNG unification: the reference consumes the global ``random`` module
(seeded 98052 per process, run.py:42); the repo consumes an injected
``random.Random(98052)`` — identical Mersenne streams given identical call
sequences, so sampler parity also proves the two sides make the same
sequence of sample/shuffle calls.

Reference quirks this pins (both sides reproduce them):

* ``diversity`` shuffles the PATH list before building the similarity
  matrix but returns intervals indexed into the UNshuffled clip list —
  kept files and kept intervals are decoupled (:305,333);
* ``cut_random_clips`` samples ``num_clips`` (not ``cut_random_clips``)
  and then applies a no-op cut (:257-259);
* when annealing empties the SBD output, the previous round's valid clips
  are retained (:206-208).
"""

from __future__ import annotations

import math
import random
from pathlib import Path

import numpy as np
import pytest

from tests import reference_oracle as ro

REF_CODE = ro.REFERENCE / "clip_segmentation" / "code"

pytestmark = pytest.mark.skipif(
    not (REF_CODE / "extract_clips.py").is_file(),
    reason="reference clip_segmentation not present",
)

SEED = 98052  # reference run.py:42


def ref_module():
    return ro.import_stage("clip_segmentation", ["extract_clips"])[
        "extract_clips"
    ]


# -- shared fake ffmpeg surfaces ----------------------------------------------

class Scenario:
    """Deterministic stand-in for one video: a duration plus scdet events
    (time, score); SBD at threshold t reports the events with score >= t
    (scdet's own contract — the filter only logs above-threshold changes)."""

    def __init__(self, duration, events):
        self.duration = float(duration)
        self.events = [(float(t), float(s)) for t, s in events]

    def sbd(self, threshold):
        hits = [(t, s) for t, s in self.events if s >= float(threshold)]
        return [t for t, _ in hits], [s for _, s in hits]


def _clip_id(path) -> int:
    return int(Path(path).stem.rsplit("_", 1)[1])


def fake_similarity(path_a, path_b) -> float:
    """Symmetric integer 'matched frames' keyed on the clip start ints the
    filenames carry ({name}_{int(start):03d}.mp4 on both sides)."""
    lo, hi = sorted((_clip_id(path_a), _clip_id(path_b)))
    return float((lo * 7919 + hi * 104729) % 199)


class FakeBackend:
    """The repo-side injection: same scenario + similarity tables."""

    def __init__(self, scenario):
        self.scenario = scenario

    def duration(self):
        return self.scenario.duration

    def detect_shots(self, threshold):
        return self.scenario.sbd(threshold)

    def extract_clip(self, start, end, out_path):
        Path(out_path).touch()
        return str(out_path)

    def similarity(self, path_a, path_b):
        return fake_similarity(path_a, path_b)


class patched_reference:
    """Swap the reference module's four subprocess surfaces for the fakes;
    restore on exit (the module object is cached across tests)."""

    def __init__(self, scenario):
        self.scenario = scenario

    def __enter__(self):
        ref = ref_module()
        self._ref = ref
        self._saved = {
            name: getattr(ref, name)
            for name in ("get_clip_duration", "run_sbd", "extract_clip",
                         "compute_perceptual_similarity")
        }
        ref.get_clip_duration = lambda path: self.scenario.duration
        ref.run_sbd = lambda path, thr: self.scenario.sbd(thr)

        def extract_clip(sb, in_filepath, out_filepath):
            Path(out_filepath).touch()

        ref.extract_clip = extract_clip
        ref.compute_perceptual_similarity = fake_similarity
        return ref

    def __exit__(self, *exc):
        for name, fn in self._saved.items():
            setattr(self._ref, name, fn)
        return False


# -- scenarios ----------------------------------------------------------------

def scen_rich():
    """12 boundaries at threshold 10 -> 9 valid >=10 s shots, no annealing;
    center-cropped starts all land on distinct ints (no filename
    collisions, which neither side disambiguates)."""
    return Scenario(140.0, [
        (12.0, 55.0), (14.0, 12.0), (30.0, 80.0), (41.0, 30.0),
        (55.0, 22.0), (58.0, 11.0), (71.0, 95.0), (83.5, 45.0),
        (97.0, 60.0), (99.0, 15.0), (113.0, 33.0), (126.0, 70.0),
    ])


def scen_anneal():
    """Three annealing rounds: score-11 events every 1 s kill all gaps at
    threshold 10; score-13 events every 5 s still leave nothing >=10 s at
    12; only at 14.4 do the four score-90 boundaries yield 4 valid."""
    events = [(float(t), 11.0) for t in range(1, 90)]
    events += [(t + 0.5, 13.0) for t in range(2, 90, 5)]
    events += [(35.25, 90.0), (50.25, 90.0), (70.25, 90.0), (95.25, 90.0)]
    return Scenario(110.0, events)


def scen_empty():
    """No boundaries at any threshold -> anneal to 100 -> mean-clip
    fallback [17.5, 27.5]."""
    return Scenario(45.0, [])


def scen_short():
    """duration 50 <= first clip_duration_threshold of [60, 120] ->
    num_clips = ceil(3 / 2^(2-1)) = 2."""
    return Scenario(50.0, [(12.0, 55.0), (30.0, 80.0), (41.0, 30.0)])


# -- the parity harness -------------------------------------------------------

def run_both(scenario, tmp_path, *, num_clips=3, sampling="diversity_greedy",
             cut_random_clips=None, calc_diversity_with_sum=False,
             clip_duration_threshold=(60.0,)):
    from acav100m_tpu.pipeline.clip_segmentation import segment_video

    ref_dir = tmp_path / "ref"
    repo_dir = tmp_path / "repo"
    ref_dir.mkdir()
    repo_dir.mkdir()
    video = tmp_path / "video.mp4"
    video.touch()  # reference main() requires the input path to exist

    with patched_reference(scenario) as ref:
        random.seed(SEED)
        ref_clips, ref_paths = ref.main(
            str(video), str(ref_dir),
            threshold=10.0, clip_duration=10.0,
            clip_duration_threshold=list(clip_duration_threshold),
            force_duration=True, num_clips=num_clips, force_num_clips=True,
            anneal_factor=1.2, sampling=sampling,
            cut_random_clips=cut_random_clips,
            calc_diversity_with_sum=calc_diversity_with_sum,
        )

    repo_clips, repo_paths = segment_video(
        FakeBackend(scenario), repo_dir, "video",
        num_clips=num_clips, threshold=10.0, clip_duration=10.0,
        clip_duration_threshold=clip_duration_threshold,
        force_duration=True, force_num_clips=True, anneal_factor=1.2,
        sampling=sampling, cut_random_clips=cut_random_clips,
        calc_diversity_with_sum=calc_diversity_with_sum,
        rng=random.Random(SEED),
    )

    assert [list(map(float, c)) for c in repo_clips] == \
           [list(map(float, c)) for c in ref_clips]
    assert [Path(p).name for p in repo_paths] == \
           [Path(p).name for p in ref_paths]
    # file bookkeeping (saves + deletes) left the same set on disk
    assert sorted(p.name for p in repo_dir.iterdir()) == \
           sorted(p.name for p in ref_dir.iterdir())
    return repo_clips


SAMPLINGS = ["random", "diversity", "diversity_greedy",
             "random_then_diversity", "random1_then_diversity"]


class TestDriverParity:
    @pytest.mark.parametrize("sampling", SAMPLINGS)
    def test_rich_all_samplings(self, tmp_path, sampling):
        clips = run_both(scen_rich(), tmp_path, sampling=sampling)
        assert len(clips) == 3

    def test_diversity_sum_variant(self, tmp_path):
        run_both(scen_rich(), tmp_path, sampling="diversity",
                 calc_diversity_with_sum=True)

    def test_diversity_cut_random_clips_quirk(self, tmp_path):
        run_both(scen_rich(), tmp_path, sampling="diversity",
                 cut_random_clips=5)

    @pytest.mark.parametrize("sampling", ["diversity_greedy", "random"])
    def test_annealing_trajectory(self, tmp_path, sampling):
        clips = run_both(scen_anneal(), tmp_path, sampling=sampling)
        assert len(clips) == 3

    def test_mean_clip_fallback(self, tmp_path):
        clips = run_both(scen_empty(), tmp_path)
        assert clips == [[17.5, 27.5]]

    def test_short_video_halving(self, tmp_path):
        clips = run_both(scen_short(), tmp_path,
                         clip_duration_threshold=(60.0, 120.0))
        assert len(clips) == 2

    def test_num_clips_one(self, tmp_path):
        clips = run_both(scen_rich(), tmp_path, num_clips=1)
        assert len(clips) == 1

    def test_fewer_valid_than_requested(self, tmp_path):
        # quirk pinned: asking for more clips than any threshold yields
        # does NOT return the richest round — each nonempty SBD round
        # OVERWRITES valid_clips, so annealing to 100 leaves only the
        # last nonempty round's set (here threshold ~89: the lone
        # score-95 boundary at t=71 -> one clip [30.5, 40.5]); both
        # sides agree exactly (extract_clips.py:202-213)
        clips = run_both(scen_rich(), tmp_path, num_clips=20)
        assert clips == [[30.5, 40.5]]


# -- pure-function fuzz against the reference's own implementations ----------

class TestPureFunctionParity:
    def test_valid_clips_and_mean_clip(self):
        from acav100m_tpu.pipeline import clip_segmentation as cs

        ref = ref_module()
        rng = np.random.RandomState(0)
        for _ in range(200):
            n = int(rng.randint(0, 12))
            sb = sorted(float(x) for x in rng.uniform(0.5, 120.0, size=n))
            for force in (False, True):
                assert cs.get_valid_clips(list(sb), 10.0, force) == \
                       ref.get_valid_clips(list(sb), 10.0, force)
        for full in (10.0, 17.3, 45.0, 600.0):
            assert cs.get_mean_clip(full, 10.0) == ref.get_mean_clip(full, 10.0)

    def test_samplers(self):
        from acav100m_tpu.pipeline import clip_segmentation as cs

        ref = ref_module()
        rng = np.random.RandomState(1)
        for trial in range(60):
            n = int(rng.randint(2, 12))
            sim = rng.randint(0, 200, size=(n, n)).astype(np.float64)
            sim = sim + sim.T
            np.fill_diagonal(sim, 0.0)
            k = int(rng.randint(1, n + 1))
            assert cs.calc_pairwise_distance(sim.copy(), k) == \
                   ref.calc_pairwise_distance(sim.copy(), k)
            assert cs.calc_sum_of_pairwise_distance(sim.copy(), k) == \
                   ref.calc_sum_of_pairwise_distance(sim.copy(), k)
