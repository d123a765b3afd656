"""Disk cache for flax random-init parameter trees.

Flax init of a production-size model runs a real forward pass — hundreds
of eagerly dispatched ops, measured 60-700 s on 1-core/tunneled rigs —
for a tree that is a pure function of (model config, PRNG key, library
versions). Cache the serialized bytes the way the XLA compile cache
caches executables. Loads are validated against a fresh
``jax.eval_shape`` of the same init (tree structure + shapes + dtypes),
so stale entries fall back to the real init; every failure path is
fail-open (cache problems can slow a build, never break it).

Users: ``pipeline.feature_extraction.build_models`` (stage-4 SlowFast +
VGGish) and ``evaluation.train.init_pretrain`` (the §2.8 Contrast
pretrain model).
"""

from __future__ import annotations

import hashlib
import json
import os
from pathlib import Path
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp


# newest entries kept per model name on write; older siblings are evicted
# (each is 100s of MB and ident churn otherwise grows the dir unboundedly)
KEEP_PER_NAME = 4


def init_cache_path(name: str, ident: Dict) -> Optional[Path]:
    """Cache file for one init tree; ``ident`` must capture everything
    that shapes tree structure or values (config, key data, versions)."""
    digest = hashlib.sha256(
        json.dumps(ident, sort_keys=True).encode()).hexdigest()[:20]
    root = os.environ.get("ACAV_PARAM_INIT_CACHE")
    base = Path(root) if root else Path(__file__).resolve().parents[2]
    return base / ".param_init_cache" / f"{name}-{digest}.msgpack"


def cached_init(name: str, ident: Dict, init_fn: Callable):
    """``init_fn() -> tree``, memoized on disk (validated, fail-open)."""
    import flax.serialization as fser

    try:
        cache_file = init_cache_path(name, ident)
    except Exception:
        cache_file = None
    if cache_file is not None and cache_file.is_file():
        try:
            shapes = jax.eval_shape(init_fn)  # trace only, no compile
            tree = fser.from_bytes(shapes, cache_file.read_bytes())
            ok = all(
                tuple(a.shape) == tuple(b.shape) and a.dtype == b.dtype
                for a, b in zip(jax.tree_util.tree_leaves(shapes),
                                jax.tree_util.tree_leaves(tree))
            )
            if ok:
                return jax.tree_util.tree_map(jnp.asarray, tree)
        except Exception:
            pass  # stale/corrupt entry: fall through to real init
    tree = init_fn()
    if cache_file is not None:
        try:
            cache_file.parent.mkdir(parents=True, exist_ok=True)
            tmp = cache_file.with_suffix(".tmp")
            tmp.write_bytes(fser.to_bytes(tree))
            tmp.replace(cache_file)  # atomic: concurrent builds race safely
            # bounded eviction: entries are 100s of MB each and every
            # ident change (key, shape, library bump) orphans the previous
            # one — without eviction the dir grows unboundedly (observed
            # 4.3 GB / 21 entries). Keep the newest KEEP_PER_NAME per
            # model so legitimately-coexisting configs (the bench's bf16
            # AND int8 builds of the same model) don't thrash each other.
            # Best-effort: a concurrent reader of an evicted entry falls
            # open to a real init.
            siblings = sorted(
                cache_file.parent.glob(f"{name}-*.msgpack"),
                key=lambda p: p.stat().st_mtime, reverse=True)
            for old in siblings[KEEP_PER_NAME:]:
                try:
                    old.unlink()
                except OSError:
                    pass
        except Exception:
            pass
    return tree
