"""Executable parity for the retrieval oracle measures and GpuMI.

Runs the reference's OWN ``correspondence_retrieval/code/measures/
custom_measure.py``, ``mutual_information.py`` and ``mi_gpu.py`` (CPU
torch) as oracles for the repo's ``retrieval.measures`` and
``ops.mi.GreedySelector``:

* ``CustomMeasure`` (agreed-pair counting with per-clustering
  normalisation) == repo ``AgreementMeasure`` on identical subsets,
  including the reference's ``agreed_dict`` incremental (only-last)
  bookkeeping equalling its own fresh recomputation;
* ``MutualInformation`` (mean pairwise sklearn score, all five entries
  of its MEASURES table) == repo ``SklearnMIMeasure`` kinds
  mi/ami/nmi/fm/arand;
* ``EfficientGpuMI`` (full-candidate-pool batch+mem hybrid, the
  reference's single-winner-per-round GPU measure) greedy trajectory ==
  repo ``GreedySelector(scorer='mem')`` — identical pick sequence and
  scores at f64.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests import reference_oracle as ro

pytestmark = pytest.mark.skipif(
    not ro.has_reference(), reason="/root/reference not present"
)


def _mods():
    return ro.import_stage(
        "correspondence_retrieval",
        ("clustering", "measures.custom_measure",
         "measures.mutual_information", "measures.efficient",
         "measures.mi_gpu"),
    )


def make_clusterings(mods, A: np.ndarray, C: int):
    cl = mods["clustering"]
    return [cl.Clustering(C, list(A[:, d])) for d in range(A.shape[1])]


def make_assignments(v=40, d=4, c=4, seed=0):
    return np.random.RandomState(seed).randint(0, c, size=(v, d))


class TestCustomMeasureParity:
    def test_scores_match(self):
        from acav100m_tpu.retrieval.measures import AgreementMeasure

        mods = _mods()
        cm_mod = mods["measures.custom_measure"]
        A = make_assignments()
        clusterings = make_clusterings(mods, A, 4)
        ref = cm_mod.CustomMeasure(clusterings)
        pairs = list(ref.get_combination())
        mine = AgreementMeasure(A, pairs)

        rng = np.random.RandomState(1)
        for n in (2, 3, 7, 15):
            idx = list(rng.choice(A.shape[0], size=n, replace=False))
            want, _ = ref.get_measure(idx)
            got = mine.score(idx)
            np.testing.assert_allclose(got, want, rtol=1e-12, err_msg=str(idx))

    def test_incremental_agreed_dict_matches_fresh(self):
        """The reference's only-last incremental path (custom_measure.py:
        55-67,75-88): growing the subset one index at a time through
        agreed_dict equals a fresh full recomputation — and the repo."""
        from acav100m_tpu.retrieval.measures import AgreementMeasure

        mods = _mods()
        cm_mod = mods["measures.custom_measure"]
        A = make_assignments(seed=2)
        clusterings = make_clusterings(mods, A, 4)
        ref_inc = cm_mod.CustomMeasure(clusterings)
        ref_fresh = cm_mod.CustomMeasure(clusterings)
        mine = AgreementMeasure(A, list(ref_inc.get_combination()))

        subset = [0, 9]
        agreed_dict = {}
        for nxt in (17, 3, 25, 31):
            subset.append(nxt)
            inc, agreed_dict = ref_inc.get_measure(subset, agreed_dict=agreed_dict)
            fresh, _ = ref_fresh.get_measure(subset)
            np.testing.assert_allclose(inc, fresh, rtol=1e-12)
            np.testing.assert_allclose(mine.score(subset), fresh, rtol=1e-12)


class TestSklearnMIParity:
    @pytest.mark.parametrize("ref_name,kind", [
        ("mutual_info", "mi"),
        ("adjusted_mutual_info", "ami"),
        ("normalized_mutual_info", "nmi"),
        ("fowlkes_mallows", "fm"),
        ("adjusted_rand", "arand"),
    ])
    def test_mean_pairwise_scores_match(self, ref_name, kind):
        from acav100m_tpu.retrieval.measures import get_oracle_measure

        mods = _mods()
        mi_mod = mods["measures.mutual_information"]
        A = make_assignments(seed=3)
        clusterings = make_clusterings(mods, A, 4)
        ref = mi_mod.MutualInformation(clusterings, measure_type=ref_name)
        pairs = list(ref.get_combination())
        mine = get_oracle_measure(kind, A, pairs)
        rng = np.random.RandomState(4)
        for n in (2, 5, 12):
            idx = list(rng.choice(A.shape[0], size=n, replace=False))
            want, _ = ref.get_measure(idx)
            got = mine.score(idx)
            np.testing.assert_allclose(got, want, rtol=1e-10, err_msg=str(idx))


class TestGpuMITrajectoryParity:
    def test_greedy_trajectory_matches_modulo_tie_order(self):
        """Reference EfficientGpuMI rounds == repo GreedySelector
        (scorer='mem') scores, with picks equal MODULO argmax tie order.

        Quirk pinned (root cause of round 3's red test): at this scale
        many candidates tie BIT-EXACTLY at the round maximum (measured:
        15 of 58 candidates after seeding — candidates touching the
        seeded cells identically score identically), and ``torch.topk``
        breaks ties in an implementation-defined order (observed: id 34)
        while the repo's ``jnp.argmax`` takes the first index (id 4).
        A pick-sequence equality is therefore ill-posed. The well-posed
        parity claim, asserted here per round:

        * the reference's pick always attains the repo's round maximum
          (it is a member of the repo's argmax tie class), and
        * replaying the reference's picks into the repo cache keeps the
          score trajectories equal to f64 rounding.
        """
        from acav100m_tpu.ops.mi import GreedySelector

        mods = _mods()
        gpu_mod = mods["measures.mi_gpu"]
        eff_mod = mods["measures.efficient"]
        v, d, c = 60, 4, 6
        A = make_assignments(v, d, c, seed=5)
        clusterings = make_clusterings(mods, A, c)
        combos = [(a, b) for a in range(d) for b in range(a + 1, d)]
        rounds = 8
        seeds = [7, 23]  # seeded cache: from the all-eps empty cache,
        # EVERY candidate scores bit-identically (one v-wide tie class)

        with ro.f64_measures(eff_mod):
            ref = gpu_mod.EfficientGpuMI(clusterings, device="cpu")
            ref.init(combos, list(range(v)))  # identity order: pos == id
            ref.add_samples(list(seeds))
            for pos in sorted(seeds, reverse=True):
                ref.remove_idx_all(pos)  # folding leaves them in the pool
            ref_picks, ref_scores = [], []
            for _ in range(rounds):
                score, cid, _ = ref.calc_measure()
                ref_picks.append(int(cid))
                ref_scores.append(float(score))

        with jax.enable_x64(True):
            sel = GreedySelector(A, combos, ncentroids=c, kind="mi",
                                 scorer="mem", dtype=jnp.float64)
            sel.add_samples(seeds)
            for rnd, (pick, want) in enumerate(zip(ref_picks, ref_scores)):
                scores = np.array(sel.scores())  # writable copy
                scores[~sel.active] = -np.inf
                best = float(scores.max())
                # the reference's pick is in the repo's argmax tie class
                assert scores[pick] >= best - 1e-9 * max(1.0, abs(best)), (
                    rnd, pick, float(scores[pick]), best)
                # and both sides agree on its score
                np.testing.assert_allclose(scores[pick], want, rtol=1e-9,
                                           err_msg=f"round {rnd}")
                sel.add_samples([pick])  # replay the reference's choice

    def test_reference_folds_start_indices_by_position(self):
        """Executed quirk pin: retrieval ``EfficientMemMI.add_samples``
        indexes ``candidates['N']`` by POSITION (mem_mi.py:141-150), and
        the driver excludes start indices from the candidate list
        (optimization/efficient.py:20), so ``run(subset_size,
        start_indices)`` folds ``candidates[pos]`` — an arbitrary
        candidate — NOT the start sample itself. The repo's
        ``fold_start=True`` folds the actual start sample (deliberate
        divergence, PARITY.md)."""
        import torch

        mods = _mods()
        gpu_mod = mods["measures.mi_gpu"]
        v, d, c = 20, 3, 4
        A = make_assignments(v, d, c, seed=6)
        clusterings = make_clusterings(mods, A, c)
        combos = [(0, 1), (0, 2), (1, 2)]
        start = [0]
        candidates = [i for i in range(v) if i not in start]  # 0 excluded

        ref = gpu_mod.EfficientGpuMI(clusterings, device="cpu")
        ref.init(combos, candidates)
        before = {k: ref.cache[k].clone() for k in ("N", "n")}
        ref.add_samples(start)  # folds candidates[0] == sample id 1
        dN = ref.cache["N"] - before["N"]
        np.testing.assert_allclose(
            (ref.cache["n"] - before["n"]).numpy(), 1.0)
        folded_cells = dN.nonzero()[:, 0].tolist()
        assert len(folded_cells) == len(combos)
        for p, (a, b) in enumerate(combos):
            cell = dN[p].nonzero()[0].tolist()
            # the folded contingency cell is sample id 1's pair, not id 0's
            assert cell == [A[1, a], A[1, b]], (p, cell)
        assert not all(
            dN[p].nonzero()[0].tolist() == [A[0, a], A[0, b]]
            for p, (a, b) in enumerate(combos)
        )
