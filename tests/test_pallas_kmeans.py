"""Pallas fused k-means kernel vs the XLA reference path (interpret mode
on CPU; the same kernel compiles on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from acav100m_tpu.ops import kmeans
from acav100m_tpu.ops.pallas.kmeans_kernel import fused_assign_update


def setup_state(rng, m=3, k=8, d=16, count=10000):
    dims = [d] * m
    state = kmeans.init_state(jax.random.PRNGKey(0), dims, k, d)
    centers = jnp.asarray(rng.randn(m, k, d).astype(np.float32))
    counts = jnp.asarray(
        rng.randint(0, 400, (m, k)).astype(np.float32)
    )
    return state._replace(
        centers=centers, counts=counts, count=jnp.asarray(count, jnp.int32)
    )


class TestFusedKernel:
    @pytest.mark.parametrize("b", [128, 100])  # aligned and ragged tiles
    def test_matches_xla_path(self, b):
        rng = np.random.RandomState(0)
        m, k, d = 3, 8, 16
        state = setup_state(rng, m, k, d)
        batch = jnp.asarray(rng.randn(m, b, d).astype(np.float32))
        threshold = jnp.maximum(state.count.astype(jnp.float32) / k, 0.0) ** 0.7

        best_x, mean_x = kmeans.calc_best(
            state, batch, key=jax.random.PRNGKey(1), initial_rounds=0
        )
        counts_x = kmeans._segment_counts(best_x, k)
        deltas_x = kmeans._segment_deltas(best_x, batch, k)

        best_p, counts_p, deltas_p, mean_p = fused_assign_update(
            state.centers, state.counts, batch, threshold,
            tile_b=64, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(best_p), np.asarray(best_x))
        np.testing.assert_allclose(np.asarray(counts_p), np.asarray(counts_x),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(deltas_p), np.asarray(deltas_x),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(mean_p), np.asarray(mean_x),
                                   rtol=1e-4, atol=1e-4)

    def test_train_step_pallas_matches(self):
        rng = np.random.RandomState(1)
        m, k, d, b = 2, 4, 8, 64
        state = setup_state(rng, m, k, d)
        batch = jnp.asarray(rng.randn(m, b, d).astype(np.float32))
        sx, mx = kmeans.train_step(state, batch, 0.01, jax.random.PRNGKey(2))
        # interpret-mode pallas via monkeypatched kernel flag
        import acav100m_tpu.ops.pallas.kmeans_kernel as kk

        orig = kk.fused_assign_update

        def interp(*args, **kwargs):
            kwargs["interpret"] = True
            return orig(*args, **kwargs)

        kk.fused_assign_update = interp
        try:
            sp, mp = kmeans.train_step(
                state, batch, 0.01, jax.random.PRNGKey(2), use_pallas=True
            )
        finally:
            kk.fused_assign_update = orig
        np.testing.assert_allclose(np.asarray(sp.centers), np.asarray(sx.centers),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(sp.counts), np.asarray(sx.counts))
        np.testing.assert_allclose(np.asarray(mp), np.asarray(mx), rtol=1e-4)
