"""Mesh-sharded MI selection equals the single-device path."""

import numpy as np
import pytest

from acav100m_tpu.ops import mi
from acav100m_tpu.runtime import get_mesh
from .test_mi import random_problem


class TestShardedSelection:
    def test_batch_selector_sharded_matches(self):
        mesh = get_mesh()
        rng = np.random.RandomState(0)
        assignments, pairs, _ = random_problem(rng, v=64)
        kwargs = dict(ncentroids=8, batch_size=16, selection_size=4, seed=3)
        single = mi.BatchGreedySelector(assignments, pairs, **kwargs)
        sharded = mi.BatchGreedySelector(assignments, pairs, mesh=mesh, **kwargs)
        s1, g1, _, _ = single.run_greedy(16, [0])
        s2, g2, _, _ = sharded.run_greedy(16, [0])
        assert s1 == s2
        np.testing.assert_allclose(g1, g2, rtol=1e-4)

    def test_greedy_selector_sharded_matches(self):
        mesh = get_mesh()
        rng = np.random.RandomState(1)
        # v=60 not divisible by 8 -> exercises the padding path
        assignments, pairs, _ = random_problem(rng, v=60)
        single = mi.GreedySelector(assignments, pairs, ncentroids=8)
        sharded = mi.GreedySelector(assignments, pairs, ncentroids=8, mesh=mesh)
        s1, _, _, _ = single.run_greedy(12, [0])
        s2, _, _, _ = sharded.run_greedy(12, [0])
        assert s1 == s2
        # padded rows must never be selected
        assert all(i < 60 for i in s2)
