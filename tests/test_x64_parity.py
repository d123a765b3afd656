"""x64 parity mode for selection numerics.

The reference computes the contingency cache in float64 (its eps constant is
``np.finfo('float64').eps``, ``subset_selection/code/measures/mi.py:25``);
SURVEY.md section 7 flags fp32 argmax flips as a bit-match blocker. These
tests cover the ``dtype='float64'`` selector mode (local
``jax.experimental.enable_x64`` scope — the rest of the process stays f32)
and quantify the fp32-vs-fp64 selection flip rate on a 10k-candidate
problem (VERDICT round 1, task 5).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acav100m_tpu.ops import mi
from acav100m_tpu.pipeline.subset_selection import compare_dtypes


def _problem(v=10_000, d=4, c=8, seed=0):
    rng = np.random.RandomState(seed)
    # correlated clusterings so MI gains are non-trivial: a latent label
    # plus per-view noise
    latent = rng.randint(0, c, size=v)
    cols = [(latent + rng.randint(0, 2, size=v)) % c for _ in range(d)]
    assignments = np.stack(cols, axis=1)
    pairs = [(i, j) for i in range(d) for j in range(i + 1, d)]
    return assignments, pairs, c


class TestX64Mode:
    def test_cache_dtype_is_float64_without_global_x64(self):
        assert not jax.config.jax_enable_x64  # precondition: global x64 off
        assignments, pairs, c = _problem(v=64)
        sel = mi.BatchGreedySelector(
            assignments, pairs, ncentroids=c, batch_size=16,
            selection_size=4, seed=0, dtype="float64",
        )
        assert sel.cache["N"].dtype == jnp.float64
        sel.run_greedy(subset_size=12)
        assert sel.cache["N"].dtype == jnp.float64
        # f64 contingency counts are exact integers (+ eps fill)
        n_mat = np.asarray(sel.cache["N"]) - mi.EPS
        np.testing.assert_allclose(n_mat, np.round(n_mat), atol=1e-9)

    def test_f64_deterministic(self):
        assignments, pairs, c = _problem(v=256, seed=3)
        runs = []
        for _ in range(2):
            sel = mi.BatchGreedySelector(
                assignments, pairs, ncentroids=c, batch_size=32,
                selection_size=4, seed=7, dtype="float64",
            )
            s, g, _, _ = sel.run_greedy(subset_size=40)
            runs.append((s, g))
        assert runs[0][0] == runs[1][0]
        np.testing.assert_array_equal(runs[0][1], runs[1][1])

    def test_greedy_selector_f64(self):
        assignments, pairs, c = _problem(v=128, seed=5)
        sel = mi.GreedySelector(assignments, pairs, ncentroids=c,
                                dtype="float64")
        s, gains, _, _ = sel.run_greedy(subset_size=10, start_indices=[0])
        assert sel.cache["N"].dtype == jnp.float64
        assert len(s) == 9  # reference mi.py:161 loops to subset_size - 1
        assert np.all(np.isfinite(gains))

    def test_f64_scores_match_numpy_float64_oracle(self):
        """The x64 mem-scorer reproduces a pure-numpy float64 incremental MI
        to near machine precision (f32 does not)."""
        assignments, pairs, c = _problem(v=96, seed=9)
        pa = mi.pair_assignments(assignments, pairs)  # (V,P,2)
        selected = list(range(20))
        sel64 = mi.GreedySelector(assignments, pairs, ncentroids=c,
                                  dtype="float64")
        sel64.add_samples(selected)
        got = sel64.scores()

        # numpy float64 oracle: full-table MI of cache + one candidate
        P = len(pairs)
        N = np.full((P, c, c), mi.EPS)
        for s in selected:
            for p in range(P):
                N[p, pa[s, p, 0], pa[s, p, 1]] += 1.0
        want = np.zeros(pa.shape[0])
        for wi in range(pa.shape[0]):
            Nw = N.copy()
            for p in range(P):
                Nw[p, pa[wi, p, 0], pa[wi, p, 1]] += 1.0
            a = Nw.sum(axis=1)  # (P,C) sums over first cluster axis
            b = Nw.sum(axis=2)
            n = a.sum(axis=-1)
            mis = []
            for p in range(P):
                t = Nw[p] / n[p] * (
                    np.log(Nw[p]) + np.log(n[p])
                    - (np.log(a[p])[None, :] + np.log(b[p])[:, None])
                )
                mis.append(t.sum())
            want[wi] = np.mean(mis)
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


class TestFlipRate:
    def test_flip_rate_10k_candidates(self):
        """fp32 and fp64 selections agree on a 10k-candidate problem; the
        quantified flip rate is the bit-match risk estimate (VERDICT task 5).
        """
        assignments, pairs, c = _problem(v=10_000, d=4, c=8, seed=1)
        report = compare_dtypes(
            assignments, pairs, ncentroids=c, subset_size=2000,
            batch_size=512, selection_size=16, keep_unselected=False,
        )
        # identical candidate order, near-tie flips only: overwhelmingly
        # stable in practice; bounds are loose so real drift still passes
        # while regressions (e.g. f32 cache accidentally used for both) fail
        assert report["rounds"] >= 100
        assert report["subset_overlap"] >= 0.9
        assert report["flip_rate"] <= 0.5
        assert report["max_gain_diff"] < 1e-2
        # surfaced in the test log for PARITY.md
        print("fp32-vs-fp64 selection report:", report)
