import numpy as np
import jax
import jax.numpy as jnp
import pytest

from acav100m_tpu.ops import kmeans
from acav100m_tpu.runtime import get_mesh


def make_blobs(rng, n, d, k, scale=0.05):
    means = rng.randn(k, d) * 4.0
    labels = rng.randint(0, k, size=n)
    x = means[labels] + scale * rng.randn(n, d)
    return x.astype(np.float32), labels, means


def train_on_blobs(state, x_stacked, batch_size=64, epochs=3, seed=0,
                   axis_name=None, step_fn=None, shuffle=True):
    # per-epoch shuffling mirrors the reference's buffer shuffle
    # (clustering/code/data/shuffle.py)
    n = x_stacked.shape[1]
    key = jax.random.PRNGKey(seed)
    shuffle_rng = np.random.RandomState(seed)
    for epoch in range(epochs):
        lr = 0.05
        order = shuffle_rng.permutation(n) if shuffle else np.arange(n)
        for i in range(0, n - batch_size + 1, batch_size):
            key, sub = jax.random.split(key)
            batch = jnp.asarray(x_stacked[:, order[i : i + batch_size]])
            if step_fn is not None:
                state, _ = step_fn(state, batch, jnp.float32(lr), sub)
            else:
                state, _ = kmeans.train_step(state, batch, lr, sub)
    return state


def purity(best, labels, k):
    total = 0
    for c in range(k):
        members = labels[best == c]
        if len(members):
            total += np.bincount(members).max()
    return total / len(labels)


class TestKMeansCore:
    def test_recovers_blobs_multi_clustering(self):
        rng = np.random.RandomState(0)
        k = 8
        x1, y1, _ = make_blobs(rng, 512, 16, k)
        x2, y2, _ = make_blobs(rng, 512, 10, k)
        dmax = 16
        stacked = np.stack(
            [x1, kmeans.pad_features(x2, dmax)], axis=0
        )  # (2, N, 16)
        state = kmeans.init_state(jax.random.PRNGKey(2), [16, 10], k, dmax)
        state = train_on_blobs(state, stacked, epochs=10, seed=2)
        best = np.asarray(kmeans.assign_step(state, jnp.asarray(stacked)))
        assert purity(best[0], y1, k) > 0.9
        assert purity(best[1], y2, k) > 0.9

    def test_padding_is_exact(self):
        rng = np.random.RandomState(1)
        x, _, _ = make_blobs(rng, 256, 10, 4)
        sp = kmeans.pad_features(x, 16)[None]  # (1, N, 16)
        su = x[None]  # (1, N, 10)
        state_p = kmeans.init_state(jax.random.PRNGKey(0), [10], 4, 16)
        # unpadded twin with identical init on the real dims
        state_u = kmeans.init_state(jax.random.PRNGKey(0), [10], 4, 10)
        state_u = state_u._replace(centers=state_p.centers[..., :10])
        state_p = train_on_blobs(state_p, sp, epochs=2)
        state_u = train_on_blobs(state_u, su, epochs=2)
        np.testing.assert_allclose(
            np.asarray(state_p.centers)[..., :10],
            np.asarray(state_u.centers),
            rtol=1e-5,
            atol=1e-6,
        )
        np.testing.assert_array_equal(
            np.asarray(state_p.centers)[..., 10:], 0.0
        )

    def test_warmup_assigns_randomly(self):
        state = kmeans.init_state(jax.random.PRNGKey(0), [4], 4, 4)
        batch = jnp.ones((1, 32, 4))
        best, _ = kmeans.calc_best(
            state, batch, key=jax.random.PRNGKey(3), initial_rounds=10
        )
        # identical points get different assignments during warmup
        assert len(np.unique(np.asarray(best))) > 1

    def test_lr_fallback(self):
        # all samples in one cluster, lr=1.0 -> fallback must trigger
        state = kmeans.init_state(jax.random.PRNGKey(0), [4], 4, 4)
        state = state._replace(count=jnp.asarray(1000, jnp.int32))
        batch = jnp.asarray(np.ones((1, 16, 4), np.float32))
        new_state, _ = kmeans.train_step(state, batch, lr=1.0)
        assert int(new_state.fallback) == 1
        # centers stay finite and bounded by data scale
        assert np.all(np.abs(np.asarray(new_state.centers)) <= 1.0 + 1e-6)

    def test_count_tracks_samples(self):
        state = kmeans.init_state(jax.random.PRNGKey(0), [4], 4, 4)
        batch = jnp.zeros((1, 8, 4))
        state, _ = kmeans.train_step(state, batch, 0.01)
        state, _ = kmeans.train_step(state, batch, 0.01)
        assert int(state.count) == 16

    def test_lr_schedule(self):
        assert kmeans.lr_schedule(0) == pytest.approx(0.01)
        assert kmeans.lr_schedule(4) == pytest.approx(0.01)
        assert kmeans.lr_schedule(5) == pytest.approx(0.001)

    def test_attrs_roundtrip(self):
        state = kmeans.init_state(jax.random.PRNGKey(0), [4, 6], 4, 6)
        dt = kmeans.get_attrs(state, lr=0.01)
        state2 = kmeans.load_attrs(dt)
        np.testing.assert_array_equal(
            np.asarray(state.centers), np.asarray(state2.centers)
        )
        assert int(state2.count) == 0


class TestShardedKMeans:
    def test_sharded_matches_single_device(self):
        mesh = get_mesh()
        n_dev = mesh.shape["data"]
        assert n_dev == 8, "tests expect the 8-virtual-device CPU mesh"
        rng = np.random.RandomState(2)
        k = 4
        x, _, _ = make_blobs(rng, 64, 8, k)
        stacked = jnp.asarray(x[None])  # (1, 64, 8)
        # start past warmup so assignment is deterministic
        base = kmeans.init_state(jax.random.PRNGKey(0), [8], k, 8)
        base = base._replace(count=jnp.asarray(10_000, jnp.int32))

        single, _ = kmeans.train_step(
            base, stacked, 0.01, key=jax.random.PRNGKey(1)
        )
        step = kmeans.make_sharded_train_step(mesh)
        sharded, _ = step(base, stacked, jnp.float32(0.01), jax.random.PRNGKey(1))
        np.testing.assert_allclose(
            np.asarray(single.centers),
            np.asarray(sharded.centers),
            rtol=1e-5,
            atol=1e-6,
        )
        np.testing.assert_array_equal(
            np.asarray(single.counts), np.asarray(sharded.counts)
        )
        assert int(sharded.count) == int(single.count)

    def test_sharded_trains_to_same_purity(self):
        mesh = get_mesh()
        rng = np.random.RandomState(3)
        k = 8
        x, y, _ = make_blobs(rng, 512, 16, k)
        stacked = x[None]
        state = kmeans.init_state(jax.random.PRNGKey(0), [16], k, 16)
        step = kmeans.make_sharded_train_step(mesh)
        state = train_on_blobs(state, stacked, epochs=5, step_fn=step)
        best = np.asarray(kmeans.assign_step(state, jnp.asarray(stacked)))
        assert purity(best[0], y, k) > 0.9
