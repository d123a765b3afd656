"""Unit tests for the shared disk init-tree cache (`utils/init_cache.py`).

The cache replaces repeated flax random-init forward passes (the
dominant host-side cost of `build_models` / `init_pretrain` on
1-core rigs) with validated msgpack loads; every failure path must be
fail-open — a broken cache may cost time, never correctness.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acav100m_tpu.utils.init_cache import cached_init, init_cache_path


@pytest.fixture()
def cache_root(tmp_path, monkeypatch):
    monkeypatch.setenv("ACAV_PARAM_INIT_CACHE", str(tmp_path))
    return tmp_path


def _tree():
    return {"w": jnp.arange(6, dtype=jnp.float32).reshape(3, 2),
            "b": jnp.ones((2,), jnp.bfloat16)}


def test_miss_populates_then_hit_skips_init(cache_root):
    ident = {"name": "t", "v": 1}
    calls = []

    def init_fn():
        calls.append(1)
        return _tree()

    out1 = cached_init("t", ident, init_fn)
    assert calls == [1]
    assert init_cache_path("t", ident).is_file()

    out2 = cached_init("t", ident, init_fn)
    # eval_shape traces init_fn without executing side effects on the
    # committed device path, but our init_fn's append is a Python side
    # effect of tracing — so assert on VALUES, not call count.
    for k in ("w", "b"):
        np.testing.assert_array_equal(np.asarray(out2[k], np.float32),
                                      np.asarray(out1[k], np.float32))
        assert out2[k].dtype == out1[k].dtype


def test_ident_change_is_a_miss(cache_root):
    a = cached_init("t", {"v": 1}, _tree)
    p1 = init_cache_path("t", {"v": 1})
    p2 = init_cache_path("t", {"v": 2})
    assert p1 != p2
    cached_init("t", {"v": 2}, _tree)
    assert p1.is_file() and p2.is_file()
    del a


def test_stale_shape_falls_back_to_real_init(cache_root):
    ident = {"v": 3}
    cached_init("t", ident, lambda: {"w": jnp.zeros((4, 4))})
    # Same ident now maps to a DIFFERENT structure (simulates a model
    # edit without an ident bump): validation must reject + re-init.
    out = cached_init("t", ident, _tree)
    assert tuple(out["w"].shape) == (3, 2)
    assert tuple(out["b"].shape) == (2,)


def test_corrupt_file_falls_back(cache_root):
    ident = {"v": 4}
    cached_init("t", ident, _tree)
    path = init_cache_path("t", ident)
    path.write_bytes(b"\x00garbage not msgpack")
    out = cached_init("t", ident, _tree)
    np.testing.assert_array_equal(
        np.asarray(out["w"]),
        np.arange(6, dtype=np.float32).reshape(3, 2))


def test_bounded_eviction_keeps_newest_per_name(cache_root):
    """Round-5 review: ident churn (key/shape/library bumps) orphaned
    ~200 MB entries forever (observed 4.3 GB / 21 files). Writes now keep
    only the newest KEEP_PER_NAME siblings per model name — enough for
    legitimately-coexisting configs (bf16 + int8 builds), bounded growth."""
    import os
    import time

    from acav100m_tpu.utils.init_cache import KEEP_PER_NAME

    paths = []
    for v in range(KEEP_PER_NAME + 3):
        cached_init("t", {"v": v}, _tree)
        p = init_cache_path("t", {"v": v})
        # distinct mtimes on coarse filesystems, all in the PAST so the
        # final write below is unambiguously the newest sibling
        t = time.time() - 100 + v
        os.utime(p, (t, t))
        paths.append(p)
    cached_init("t", {"v": 99}, _tree)  # triggers eviction on write
    survivors = sorted(cache_root.glob("**/t-*.msgpack"))
    assert len(survivors) == KEEP_PER_NAME
    assert init_cache_path("t", {"v": 99}).is_file()  # newest kept
    assert not paths[0].is_file()  # oldest evicted
    # other model names untouched
    cached_init("other", {"v": 1}, _tree)
    assert init_cache_path("other", {"v": 1}).is_file()


def test_values_roundtrip_bitexact(cache_root):
    ident = {"v": 5}
    key = jax.random.PRNGKey(7)

    def init_fn():
        return {"w": jax.random.normal(key, (16, 8), jnp.float32)}

    first = cached_init("t", ident, init_fn)
    second = cached_init("t", ident, init_fn)
    np.testing.assert_array_equal(np.asarray(first["w"]),
                                  np.asarray(second["w"]))
