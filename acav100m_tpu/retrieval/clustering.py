"""Clustering frontends for retrieval experiments.

Port of ``correspondence_retrieval/code/clustering.py:13-116`` +
``pca.py``: whiten features, then cluster per (view, layer, ncentroids)
with a pluggable algorithm. The reference's frontends were scipy kmeans,
faiss-gpu kmeans, a single-GPU copy of the stage-5 SGD k-means, and PCA
bucketing; here:

* ``sgd`` — the framework's fused ``ops.kmeans`` (the production path);
* ``scipy`` — ``scipy.cluster.vq.kmeans2``;
* ``sklearn`` — Lloyd's (stands in for the faiss-gpu frontend; same
  algorithm, no GPU library);
* ``pca`` — top principal component split into ``ncentroids`` quantile
  buckets.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np


def whiten(features: np.ndarray, eps: float = 1e-8) -> np.ndarray:
    """Per-dim standardization (scipy.cluster.vq.whiten semantics)."""
    std = features.std(axis=0)
    return features / np.maximum(std, eps)


class Clustering:
    """Fitted clustering: ``assign`` maps features -> centroid ids, plus
    the reference's ind2cen/cen2ind-style bookkeeping."""

    def __init__(self, centers: np.ndarray, assignments: np.ndarray):
        self.centers = centers
        self.assignments = assignments  # train-set assignments
        self.ncentroids = centers.shape[0]

    def assign(self, features: np.ndarray) -> np.ndarray:
        d = (
            -2.0 * features @ self.centers.T
            + (features ** 2).sum(-1, keepdims=True)
            + (self.centers ** 2).sum(-1)[None]
        )
        return d.argmin(axis=1)

    def get_assignment(self, idx: int) -> int:
        return int(self.assignments[idx])


def sgd_kmeans(features: np.ndarray, ncentroids: int, seed: int = 0,
               epochs: int = 20, batch_size: int = 64) -> Clustering:
    """Single-view SGD k-means via the stage-5 fused implementation.

    Defaults follow the reference's retrieval frontend
    (``correspondence_retrieval/code/sgd_clustering.py:29-46``): 20 epochs
    of batch-64 updates with lr ``0.1**(2+epoch//5)``, EVERY sample seen
    each epoch (the tail batch runs at its own shape — dropping it starved
    small datasets of most of their updates and produced noise clusters)."""
    import jax
    import jax.numpy as jnp

    from ..ops import kmeans

    v, d = features.shape
    state = kmeans.init_state(jax.random.PRNGKey(seed), [d], ncentroids, d)
    rng = np.random.RandomState(seed)
    key = jax.random.PRNGKey(seed + 1)
    step = jax.jit(kmeans.train_step)
    for epoch in range(epochs):
        order = rng.permutation(v)
        lr = kmeans.lr_schedule(epoch)
        for i in range(0, v, batch_size):
            key, sub = jax.random.split(key)
            batch = jnp.asarray(features[None, order[i : i + batch_size]])
            state, _ = step(state, batch, lr, sub)
    centers = np.asarray(state.centers[0])
    assignments = np.asarray(
        kmeans.assign_step(state, jnp.asarray(features[None]))
    )[0]
    return Clustering(centers, assignments)


def scipy_kmeans(features: np.ndarray, ncentroids: int, seed: int = 0) -> Clustering:
    from scipy.cluster.vq import kmeans2

    centers, labels = kmeans2(
        features.astype(np.float64), ncentroids, minit="++", seed=seed
    )
    return Clustering(centers.astype(np.float32), labels)


def sklearn_kmeans(features: np.ndarray, ncentroids: int, seed: int = 0) -> Clustering:
    from sklearn.cluster import KMeans as SkKMeans

    km = SkKMeans(n_clusters=ncentroids, random_state=seed, n_init=3).fit(features)
    return Clustering(km.cluster_centers_.astype(np.float32), km.labels_)


def pca_clustering(features: np.ndarray, ncentroids: int, seed: int = 0) -> Clustering:
    """Bucket by the top principal component (reference pca.py:6-20)."""
    x = features - features.mean(axis=0)
    _, _, vt = np.linalg.svd(x, full_matrices=False)
    proj = x @ vt[0]
    edges = np.quantile(proj, np.linspace(0, 1, ncentroids + 1)[1:-1])
    labels = np.searchsorted(edges, proj)
    centers = np.stack(
        [
            features[labels == c].mean(axis=0)
            if np.any(labels == c)
            else features.mean(axis=0)
            for c in range(ncentroids)
        ]
    )
    return Clustering(centers.astype(np.float32), labels)


_FRONTENDS = {
    "sgd": sgd_kmeans,
    "scipy": scipy_kmeans,
    "sklearn": sklearn_kmeans,
    "faiss": sklearn_kmeans,  # faiss-gpu stand-in: same Lloyd's algorithm
    "pca": pca_clustering,
}


def cluster_views(
    view_features: Dict[str, np.ndarray],
    ncentroids: int,
    method: str = "sgd",
    seed: int = 0,
    do_whiten: bool = True,
) -> Dict[str, Clustering]:
    """Cluster every (view, layer) feature matrix -> {view: Clustering}."""
    fn = _FRONTENDS[method]
    out = {}
    for i, (view, feats) in enumerate(sorted(view_features.items())):
        feats = np.asarray(feats, dtype=np.float32)
        if do_whiten:
            feats = whiten(feats)
        out[view] = fn(feats, ncentroids, seed=seed + i)
    return out


def assignments_matrix(clusterings: Dict[str, "Clustering"]) -> np.ndarray:
    """(V, D) assignment matrix over sorted view keys."""
    keys = sorted(clusterings)
    return np.stack([clusterings[k].assignments for k in keys], axis=1)
