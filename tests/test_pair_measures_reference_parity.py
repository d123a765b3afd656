"""Executable parity for the retrieval pair-counting measures.

Runs the reference's OWN ``correspondence_retrieval/code/measures/
efficient_pair.py`` (CPU torch) as the oracle for the repo's
``ops.mi.calc_fm / calc_rand / calc_arand``:

* formula kernels: on identical integer contingency tables the
  reference's ``_calc_pair_stats`` + ``calc_FM`` / ``calc_Rand`` /
  ``calc_ARand`` equal the repo's scorers to f64 precision;
* quirk pins, executed not assumed:
  - ``FowlkesMallowsScore.get_last`` MULTIPLIES the cache by the
    candidate tables (``efficient_pair.py:48-50``) where the base class
    ADDS (``efficient.py:111-116``) — the reference's FM/Rand greedy
    trajectories are therefore driven by elementwise-masked tables, not
    by what-if-added contingency tables. The repo keeps the additive
    semantics for all kinds (deliberate divergence, PARITY.md);
  - ``AdjustedRandScore`` (marked TODO upstream) produces NaN scores on
    its own eps-initialised cache (``tensor_calc_combination`` rounds
    the eps margins to zero -> 0/0 chance term); the repo's ``arand``
    is finite on the identical state via ``ensure_nonzero``.
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


def _ep():
    return ro.import_stage(
        "correspondence_retrieval", ("measures.efficient_pair",)
    )["measures.efficient_pair"]


class FakeClustering:
    """Minimal stand-in for retrieval ``Clustering`` (efficient.py:20-27
    reads only ``ncentroids`` and ``ind2cen``)."""

    def __init__(self, col, ncentroids):
        self.ncentroids = ncentroids
        self.ind2cen = np.asarray(col)


def make_measure(cls, A: np.ndarray, C: int, combos):
    import torch

    m = cls([FakeClustering(A[:, d], C) for d in range(A.shape[1])])
    m.device = torch.device("cpu")
    m.init(combos, list(range(A.shape[0])))
    return m


def make_last(rng, w=7, p=5, c=4):
    """Integer contingency tables with consistent margins, the additive
    ``last`` convention (W,P,C,C)/(W,P,C)/(W,P): a = sum over axis 2,
    b = sum over axis 3 (efficient.py:64-72)."""
    N = rng.randint(0, 5, size=(w, p, c, c)).astype(np.float64)
    a = N.sum(axis=2)
    b = N.sum(axis=3)
    n = N.sum(axis=(2, 3))
    return {"N": N, "a": a, "b": b, "n": n}


class TestPairFormulaKernels:
    def test_fm_rand_arand_match_f64(self):
        import torch

        from acav100m_tpu.ops import mi as omi

        ep = _ep()
        rng = np.random.RandomState(0)
        last_np = make_last(rng)
        last_t = {k: torch.from_numpy(v) for k, v in last_np.items()}

        s_ab = ep.tensor_calc_combination(last_t["N"], 2).sum(dim=[-1, -2])
        s_a = ep.tensor_calc_combination(last_t["a"], 2).sum(dim=-1)
        s_b = ep.tensor_calc_combination(last_t["b"], 2).sum(dim=-1)
        nc = ep.tensor_calc_combination(last_t["n"], 2)
        stats = ep.FowlkesMallowsScore._calc_pair_stats(
            None, s_ab, s_a, s_b, nc)
        ref_fm = ep.FowlkesMallowsScore.calc_FM(None, stats).numpy()
        ref_rand = ep.RandScore.calc_Rand(None, stats).numpy()

        ref_arand = ep.AdjustedRandScore.calc_ARand(None, last_t).numpy()

        with jax.enable_x64(True):
            last_j = {k: jnp.asarray(v) for k, v in last_np.items()}
            got_fm = np.asarray(omi.calc_fm(last_j))
            got_rand = np.asarray(omi.calc_rand(last_j))
            got_arand = np.asarray(omi.calc_arand(last_j))

        np.testing.assert_allclose(got_fm, ref_fm, rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(got_rand, ref_rand, rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(got_arand, ref_arand, rtol=1e-12, atol=1e-12)


class TestExecutedQuirks:
    C = 4
    COMBOS = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]

    def _assignments(self, v=30, d=4, seed=0):
        return np.random.RandomState(seed).randint(0, self.C, size=(v, d))

    def test_fm_get_last_is_multiplicative(self):
        import torch

        ep = _ep()
        A = self._assignments()
        m = make_measure(ep.FowlkesMallowsScore, A, self.C, self.COMBOS)
        m.add_samples([0, 5])
        got = m.get_last()
        mult = {k: m.cache[k].unsqueeze(0) * m.candidates[k]
                for k in m.candidates}
        add = {k: m.cache[k].unsqueeze(0) + m.candidates[k]
               for k in m.candidates}
        for k in ("N", "a", "b", "n"):
            assert torch.equal(got[k], mult[k]), k
        assert not torch.equal(got["N"], add["N"])
        # the greedy round runs to completion on those masked tables
        score, idx, n_sel = m.calc_measure()
        assert np.isfinite(score)

    def test_rand_greedy_runs_on_multiplicative_tables(self):
        ep = _ep()
        A = self._assignments(seed=1)
        m = make_measure(ep.RandScore, A, self.C, self.COMBOS)
        m.add_samples([2, 9])
        score, idx, n_sel = m.calc_measure()
        assert np.isfinite(score)

    def test_arand_reference_is_nan_repo_is_finite(self):
        """The reference's TODO AdjustedRandScore: eps-margins round to
        zero pair counts -> 0/0 chance term -> NaN scores for every
        candidate, so its greedy argmax is over NaNs. The repo's arand
        scorer on the IDENTICAL selected-set state is finite."""
        from acav100m_tpu.ops import mi as omi

        ep = _ep()
        A = self._assignments(seed=2)
        selected = [0, 5]
        m = make_measure(ep.AdjustedRandScore, A, self.C, self.COMBOS)
        m.add_samples(selected)
        scores = m._calc_score(m.get_last())
        assert bool(np.isnan(scores.numpy()).any())

        with jax.enable_x64(True):
            cache = omi.init_cache(len(self.COMBOS), self.C, dtype=jnp.float64)
            pairs_all = jnp.asarray(omi.pair_assignments(A, self.COMBOS))
            cache = omi.add_candidates_to_cache(
                cache, jnp.take(pairs_all, jnp.asarray(selected), axis=0),
                self.C)
            candidates = [i for i in range(A.shape[0]) if i not in selected]
            got = omi.score_candidates_full(
                cache, jnp.take(pairs_all, jnp.asarray(candidates), axis=0),
                self.C, kind="arand")
        assert bool(np.isfinite(np.asarray(got)).all())
