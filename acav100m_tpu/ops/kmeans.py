"""Mini-batch SGD k-means, TPU-native.

Functional rebuild of the reference's ``KMeans``
(``clustering/code/sgd_clustering.py:10-129``) with the same algorithm:

* centers init ``rand * 1e-5``;
* the first ``initial_rounds * k`` samples are assigned uniformly at random;
* distances ``-2*C@x^T + |x|^2 + |c|^2``; underused centers
  (``counts < (count/k)**p``) get distances divided by ``r`` (reinit);
* update: scatter-added counts/deltas,
  ``centers <- centers*(1 - counts*lr) + sum(lr*x)``, with the lr fallback
  ``lr = 0.5/max_count`` whenever ``lr*max_count >= 1``;
* distributed: counts/deltas are summed across devices (the reference
  all-reduces via NCCL; here a ``psum`` inside ``shard_map``).

TPU-first differences:

* **All clusterings run fused.** The reference runs 10 independent
  ``KMeans`` objects (one per model layer), each a tiny K=32 matmul. Here
  the per-layer states are stacked into one ``(M, K, Dmax)`` tensor with
  feature dims zero-padded to ``Dmax``; assignment is ONE batched einsum on
  the MXU, and updates are one ``segment_sum``. Zero padding is exact: it
  contributes nothing to distances or deltas.
* Pure functions over a ``KMeansState`` pytree: jit/shard_map/checkpoint
  (orbax) compose for free. No ``torch_scatter`` — ``jax.ops.segment_sum``.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P


class KMeansState(NamedTuple):
    """Stacked state for M simultaneous clusterings."""

    centers: jnp.ndarray  # (M, K, Dmax) f32
    counts: jnp.ndarray  # (M, K) f32
    count: jnp.ndarray  # () i32 — total samples seen (global)
    fallback: jnp.ndarray  # () i32 — times the lr fallback triggered
    d_mask: jnp.ndarray  # (M, Dmax) f32 — 1 on real feature dims


def init_state(
    key: jax.Array,
    dims: Sequence[int],
    k: int,
    dmax: Optional[int] = None,
) -> KMeansState:
    """Initialize M clusterings with feature dims ``dims`` (padded to dmax).

    Mirrors ``KMeans.__init__`` centers init (``sgd_clustering.py:24``);
    the reference then all-reduces so all ranks share the same random
    centers (``:88-92``) — in single-controller JAX the state is simply one
    (replicated) array.
    """
    dims = list(dims)
    m = len(dims)
    if dmax is None:
        dmax = max(dims)
    centers = jax.random.uniform(key, (m, k, dmax), dtype=jnp.float32) * 1e-5
    d_mask = np.zeros((m, dmax), dtype=np.float32)
    for i, d in enumerate(dims):
        d_mask[i, :d] = 1.0
    d_mask = jnp.asarray(d_mask)
    centers = centers * d_mask[:, None, :]
    return KMeansState(
        centers=centers,
        counts=jnp.zeros((m, k), dtype=jnp.float32),
        count=jnp.zeros((), dtype=jnp.int32),
        fallback=jnp.zeros((), dtype=jnp.int32),
        d_mask=d_mask,
    )


def pad_features(batch: np.ndarray, dmax: int) -> np.ndarray:
    """(..., D) -> (..., dmax) zero-padded (host-side helper)."""
    d = batch.shape[-1]
    if d == dmax:
        return batch
    pad = [(0, 0)] * (batch.ndim - 1) + [(0, dmax - d)]
    return np.pad(batch, pad)


def _distances(state: KMeansState, batch: jnp.ndarray) -> jnp.ndarray:
    """(M, B, Dmax) -> (M, K, B) squared euclidean distances."""
    # -2 * C @ x^T + |x|^2 + |c|^2   (sgd_clustering.py:72-74)
    cx = jnp.einsum(
        "mkd,mbd->mkb",
        state.centers,
        batch,
        preferred_element_type=jnp.float32,
    )
    x2 = jnp.sum(batch * batch, axis=-1)  # (M, B)
    c2 = jnp.sum(state.centers * state.centers, axis=-1)  # (M, K)
    return -2.0 * cx + x2[:, None, :] + c2[:, :, None]


def calc_best(
    state: KMeansState,
    batch: jnp.ndarray,
    key: Optional[jax.Array] = None,
    initial_rounds: int = 10,
    reinit: Tuple[float, float] = (0.7, 5.0),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Assign each sample to its best center.

    batch: (M, B, Dmax) — the same B samples viewed by M clusterings (each
    with its own feature slice, already padded).
    Returns (best (M, B) int32, mean min-distance (M,) f32).

    Matches ``KMeans.calc_best`` (``sgd_clustering.py:63-79``) including
    random assignment during warmup and the underuse-reinit discount.
    """
    m, k, _ = state.centers.shape
    b = batch.shape[1]
    real = _distances(state, batch)
    p, r = reinit
    count_f = state.count.astype(jnp.float32)
    threshold = jnp.maximum(count_f / k, 0.0) ** p  # scalar
    underused = state.counts < threshold  # (M, K)
    real = jnp.where(underused[:, :, None], real / r, real)
    if key is None:
        key = jax.random.PRNGKey(0)
    rand = jax.random.uniform(key, (m, k, b), dtype=jnp.float32)
    warmup = state.count < initial_rounds * k
    distances = jnp.where(warmup, rand, real)
    best = jnp.argmin(distances, axis=1).astype(jnp.int32)  # (M, B)
    min_d = jnp.min(distances, axis=1)  # (M, B)
    return best, jnp.mean(min_d, axis=-1)


def _segment_counts(best: jnp.ndarray, k: int) -> jnp.ndarray:
    """(M, B) assignments -> (M, K) counts via one-hot sum (MXU-friendly)."""
    onehot = jax.nn.one_hot(best, k, dtype=jnp.float32)  # (M, B, K)
    return jnp.sum(onehot, axis=1)


def _segment_deltas(best: jnp.ndarray, batch: jnp.ndarray, k: int) -> jnp.ndarray:
    """Sum of samples per center: (M, K, Dmax) — einsum == scatter_add."""
    onehot = jax.nn.one_hot(best, k, dtype=batch.dtype)  # (M, B, K)
    return jnp.einsum(
        "mbk,mbd->mkd", onehot, batch, preferred_element_type=jnp.float32
    )


def train_step(
    state: KMeansState,
    batch: jnp.ndarray,
    lr: jnp.ndarray,
    key: Optional[jax.Array] = None,
    initial_rounds: int = 10,
    reinit: Tuple[float, float] = (0.7, 5.0),
    axis_name: Optional[str] = None,
    global_batch: Optional[int] = None,
    use_pallas: bool = False,
) -> Tuple[KMeansState, jnp.ndarray]:
    """One mini-batch update. batch: (M, B_local, Dmax).

    Inside ``shard_map`` pass ``axis_name`` — counts/deltas are psum'd,
    reproducing the reference's all-reduce (``sgd_clustering.py:113-127``).
    ``use_pallas=True`` routes the post-warmup assign+scatter through the
    fused Pallas kernel (one HBM read of the batch instead of two).
    Returns (new_state, mean min-distance per clustering (M,)).
    """
    m, k, _ = state.centers.shape
    b_local = batch.shape[1]

    if use_pallas:
        assert reinit[1] == 5.0, "pallas kernel hardcodes the /5 discount"
        from .pallas.kmeans_kernel import fused_assign_update

        threshold = jnp.maximum(
            state.count.astype(jnp.float32) / k, 0.0
        ) ** reinit[0]

        def fused_branch(_):
            best, counts, deltas, mean_dist = fused_assign_update(
                state.centers, state.counts, batch, threshold
            )
            return counts, deltas, mean_dist

        def warmup_branch(_):
            best, mean_dist = calc_best(state, batch, key, initial_rounds, reinit)
            return (
                _segment_counts(best, k),
                _segment_deltas(best, batch, k),
                mean_dist,
            )

        warmup = state.count < initial_rounds * k
        counts, deltas_raw, mean_dist = jax.lax.cond(
            warmup, warmup_branch, fused_branch, None
        )
    else:
        best, mean_dist = calc_best(state, batch, key, initial_rounds, reinit)
        counts = _segment_counts(best, k)
        deltas_raw = _segment_deltas(best, batch, k)
    if axis_name is not None:
        counts = jax.lax.psum(counts, axis_name)
        deltas_raw = jax.lax.psum(deltas_raw, axis_name)
        b_global = global_batch if global_batch is not None else (
            b_local * jax.lax.axis_size(axis_name)
        )
    else:
        b_global = global_batch if global_batch is not None else b_local

    # lr fallback (sgd_clustering.py:116-119): per-clustering max count
    max_count = jnp.max(counts, axis=-1, keepdims=True)  # (M, 1)
    lr = jnp.asarray(lr, dtype=jnp.float32)
    need_fallback = max_count * lr >= 1.0
    eff_lr = jnp.where(need_fallback, 0.5 / jnp.maximum(max_count, 1.0), lr)
    fallback = state.fallback + jnp.any(need_fallback).astype(jnp.int32)

    new_counts = state.counts + counts
    centers = state.centers * (1.0 - counts * eff_lr)[:, :, None]
    centers = centers + deltas_raw * eff_lr[:, :, None]
    centers = centers * state.d_mask[:, None, :]

    new_state = KMeansState(
        centers=centers,
        counts=new_counts,
        count=state.count + jnp.asarray(b_global, dtype=jnp.int32),
        fallback=fallback,
        d_mask=state.d_mask,
    )
    return new_state, mean_dist


def assign_step(
    state: KMeansState,
    batch: jnp.ndarray,
    reinit: Tuple[float, float] = (0.7, 5.0),
) -> jnp.ndarray:
    """Inference-time assignment (phase B): pure argmin, no randomness.

    The reference reuses ``calc_best`` for assignment
    (``run_clustering.py:180-272``) — after training ``count`` is far past
    warmup so the random branch never triggers, but the reinit discount DOES
    still apply; keep it for parity.
    """
    best, _ = calc_best(
        state, batch, key=jax.random.PRNGKey(0), initial_rounds=0, reinit=reinit
    )
    return best


def lr_schedule(epoch: int) -> float:
    """Reference schedule: ``0.1 ** (2 + epoch // 5)``
    (``run_clustering.py:165-168``)."""
    return 0.1 ** (2 + epoch // 5)


def get_attrs(state: KMeansState, lr=None, initial_rounds=10, reinit=(0.7, 5.0)):
    """Checkpoint dict mirroring ``KMeans.get_attrs``
    (``sgd_clustering.py:34-46``), stacked over clusterings."""
    return {
        "centers": np.asarray(state.centers),
        "counts": np.asarray(state.counts),
        "count": int(state.count),
        "fallback": int(state.fallback),
        "d_mask": np.asarray(state.d_mask),
        "lr": lr,
        "initial_rounds": initial_rounds,
        "reinit": tuple(reinit),
        "sequential": False,
    }


def load_attrs(dt) -> KMeansState:
    return KMeansState(
        centers=jnp.asarray(dt["centers"]),
        counts=jnp.asarray(dt["counts"]),
        count=jnp.asarray(dt["count"], dtype=jnp.int32),
        fallback=jnp.asarray(dt.get("fallback", 0), dtype=jnp.int32),
        d_mask=jnp.asarray(dt["d_mask"]),
    )


def make_sharded_train_step(mesh, axis_name: str = "data",
                            initial_rounds: int = 10,
                            reinit: Tuple[float, float] = (0.7, 5.0),
                            use_pallas: bool = False):
    """jit a shard_map'd train step: batch sharded on B, state replicated.

    XLA turns the psums into ICI all-reduces — the TPU equivalent of the
    reference's NCCL all_reduce of counts/deltas.
    """
    try:  # jax >= 0.6 top-level API; experimental path removed in 0.9
        from jax import shard_map
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    def step(state, batch, lr, key):
        return train_step(
            state, batch, lr, key,
            initial_rounds=initial_rounds, reinit=reinit,
            axis_name=axis_name, use_pallas=use_pallas,
        )

    kwargs = dict(
        mesh=mesh,
        in_specs=(P(), P(None, axis_name, None), P(), P()),
        out_specs=(P(), P()),
    )
    try:  # replication checking: check_vma (jax >= 0.7) / check_rep (older)
        smapped = shard_map(step, check_vma=False, **kwargs)
    except TypeError:  # pragma: no cover - older jax
        smapped = shard_map(step, check_rep=False, **kwargs)
    return jax.jit(smapped)
