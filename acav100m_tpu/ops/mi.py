"""Pairwise mutual-information measures over cluster assignments.

Rebuild of the reference measure zoo
(``subset_selection/code/measures/mi.py`` — EfficientMI / EfficientAMI /
EfficientNMI / EfficientMemMI / ConstantMeasure — and ``measures/batch.py``
— EfficientBatchMI, the production measure) as pure jitted functions over a
contingency cache:

    cache: N (P,C,C) eps-filled, a = N.sum(1) (P,C), b = N.sum(2) (P,C),
           n = a.sum(-1) (P)            [mi.py:32-39]

for P cluster pairs over D clusterings of V clips.

TPU-first design decisions
--------------------------
* **No gathers in the hot loop.** Candidate cells are read with one-hot
  einsums (MXU matmuls) instead of ``torch.gather``; candidate contingency
  outer products are ``wpa,wpb->wpab`` einsums exactly like the reference's
  math but batched to thousands of candidates per step (the reference used
  B=20 per GPU memory heuristics; static shapes replace
  ``get_batch_ranges``).
* **Incremental O(W*P) scoring** (the EfficientMemMI trick, mi.py:284-412)
  is the default scorer for plain MI: adding one candidate changes exactly
  one cell per pair, so Sum(N log N) terms update by
  ``- nlogn(x) + nlogn(x+1)``.
* **Static shapes + host pool.** The greedy pool (shuffle, remove-selected,
  keep-unselected) is O(V) numpy bookkeeping on host; the device step
  (score batch -> top-k -> fold winners into cache) is one jit.
"""

from __future__ import annotations

import contextlib
import functools
import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

EPS = float(np.finfo("float64").eps)


def _resolve_dtype(dtype):
    """'float32'/'float64'/jnp dtype -> (jnp dtype, x64 context factory).

    The reference does all contingency math in float64 (its eps is
    ``np.finfo('float64').eps``, measures/mi.py:25); fp32 can flip argmax
    choices on near-tie gains (SURVEY.md section 7, bit-match blocker). The
    x64 parity mode runs the cache + scoring in f64 under a local
    ``jax.enable_x64`` scope so the rest of the process stays
    f32.
    """
    dt = jnp.dtype(dtype) if not isinstance(dtype, str) else jnp.dtype(
        {"float32": jnp.float32, "float64": jnp.float64,
         "bfloat16": jnp.bfloat16}[dtype]
    )
    if dt == jnp.float64:
        return dt, functools.partial(jax.enable_x64, True)
    return dt, contextlib.nullcontext


# -- cache ------------------------------------------------------------------

def init_cache(num_pairs: int, ncentroids: int, dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """eps-filled contingency cache (reference mi.py:32-39)."""
    n_mat = jnp.full((num_pairs, ncentroids, ncentroids), EPS, dtype=dtype)
    a = n_mat.sum(axis=1)
    b = n_mat.sum(axis=2)
    n = a.sum(axis=-1)
    return {"N": n_mat, "a": a, "b": b, "n": n}


def pair_assignments(assignments: np.ndarray, combinations: Sequence[Tuple[int, int]]) -> np.ndarray:
    """(V, D) assignments + P pairs -> (V, P, 2) pair coordinates."""
    comb = np.asarray(list(combinations), dtype=np.int64)  # (P, 2)
    return np.stack(
        [assignments[:, comb[:, 0]], assignments[:, comb[:, 1]]], axis=-1
    ).astype(np.int32)


def _onehots(pairs: jnp.ndarray, ncentroids: int, dtype=jnp.float32):
    """(..., P, 2) int -> two (..., P, C) one-hots."""
    p1 = jax.nn.one_hot(pairs[..., 0], ncentroids, dtype=dtype)
    p2 = jax.nn.one_hot(pairs[..., 1], ncentroids, dtype=dtype)
    return p1, p2


def candidate_tables(pairs: jnp.ndarray, ncentroids: int, dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """One-hot contingency contributions for W candidates.

    pairs: (W, P, 2) -> {'N': (W,P,C,C), 'a': (W,P,C), 'b': (W,P,C),
    'n': (W,P)} (reference mi.py:47-59).
    """
    p1, p2 = _onehots(pairs, ncentroids, dtype)
    n_mat = jnp.einsum("wpa,wpb->wpab", p1, p2, preferred_element_type=dtype)
    a = n_mat.sum(axis=2)
    b = n_mat.sum(axis=3)
    n = b.sum(axis=-1)
    return {"N": n_mat, "a": a, "b": b, "n": n}


def add_candidates_to_cache(
    cache: Dict, pairs: jnp.ndarray, ncentroids: int, weights: Optional[jnp.ndarray] = None
) -> Dict:
    """Fold S selected samples into the cache (reference mi.py:127-148).

    ``weights`` (S,) optionally scales each sample's contribution; pad rows
    are folded with weight 0 so static-shape batches never corrupt the
    contingency counts (the reference used dynamic shapes, batch.py:132-171).
    """
    tables = candidate_tables(pairs, ncentroids, cache["N"].dtype)
    if weights is None:
        return {key: cache[key] + tables[key].sum(axis=0) for key in cache}
    w = weights.astype(cache["N"].dtype)
    out = {}
    for key in cache:
        t = tables[key]
        wk = w.reshape((w.shape[0],) + (1,) * (t.ndim - 1))
        out[key] = cache[key] + (t * wk).sum(axis=0)
    return out


# -- full-table scores (exact ports of the measure math) ---------------------

def calc_mi(last: Dict) -> jnp.ndarray:
    """(W,P,C,C) tables -> (W,P) MI (reference mi.py:85-91)."""
    n_mat = last["N"]
    a = last["a"][:, :, None, :]  # W P 1 C
    b = last["b"][:, :, :, None]  # W P C 1
    n = last["n"][:, :, None, None]
    return (
        n_mat / n * (jnp.log(n_mat) + jnp.log(n) - (jnp.log(a) + jnp.log(b)))
    ).sum(axis=(2, 3))


def calc_entropy(x: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    p = x / n
    return -(p * jnp.log(p)).sum(axis=-1)


def generalized_mean(ha, hb, average_method: str = "arithmetic"):
    if average_method == "max":
        return jnp.maximum(ha, hb)
    if average_method == "min":
        return jnp.minimum(ha, hb)
    return (ha + hb) / 2.0


def calc_emi(last: Dict) -> jnp.ndarray:
    """Expected MI under the hypergeometric model (reference mi.py:217-230)."""
    n_mat = last["N"]
    a = last["a"][:, :, None, :]
    b = last["b"][:, :, :, None]
    n = last["n"][:, :, None, None]
    term1 = n_mat / n * (jnp.log(n_mat) + jnp.log(n) - (jnp.log(a) + jnp.log(b)))
    lg = jax.lax.lgamma
    log_term2 = (
        lg(a + 1) + lg(b + 1) + lg(n - a + 1) + lg(n - b + 1)
        - (lg(n + 1) + lg(n_mat + 1) + lg(a - n_mat + 1) + lg(b - n_mat + 1)
           + lg(n - a - b + n_mat + 1))
    )
    return (term1 * jnp.exp(log_term2)).sum(axis=(2, 3))


def ensure_nonzero(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(x, EPS)


def calc_ami(last: Dict, average_method: str = "arithmetic") -> jnp.ndarray:
    mi = calc_mi(last)
    emi = calc_emi(last)
    ha = calc_entropy(last["a"], last["n"][..., None])
    hb = calc_entropy(last["b"], last["n"][..., None])
    normalizer = generalized_mean(ha, hb, average_method)
    return (mi - emi) / ensure_nonzero(normalizer - emi)


def calc_nmi(last: Dict, average_method: str = "arithmetic") -> jnp.ndarray:
    mi = calc_mi(last)
    ha = calc_entropy(last["a"], last["n"][..., None])
    hb = calc_entropy(last["b"], last["n"][..., None])
    return 2.0 * mi / ensure_nonzero(generalized_mean(ha, hb, average_method))


def calc_constant(last: Dict) -> jnp.ndarray:
    return jnp.ones_like(last["n"])


def _comb2(x: jnp.ndarray) -> jnp.ndarray:
    return x * (x - 1.0) / 2.0


def _pair_stats(last: Dict):
    """Pair-counting sums over the contingency tables
    (reference correspondence_retrieval measures/efficient_pair.py:23-131):
    S_ab = sum comb(N,2), S_a = sum comb(a,2), S_b = sum comb(b,2),
    nc = comb(n,2)."""
    s_ab = _comb2(last["N"]).sum(axis=(2, 3))  # W x P
    s_a = _comb2(last["a"]).sum(axis=-1)
    s_b = _comb2(last["b"]).sum(axis=-1)
    nc = _comb2(last["n"])
    return s_ab, s_a, s_b, nc


def calc_fm(last: Dict) -> jnp.ndarray:
    """Fowlkes-Mallows: TP/sqrt((TP+FP)(TP+FN)) = S_ab/sqrt(S_a*S_b)."""
    s_ab, s_a, s_b, _ = _pair_stats(last)
    return s_ab / jnp.sqrt(ensure_nonzero(s_a * s_b))


def calc_rand(last: Dict) -> jnp.ndarray:
    """Rand index: (TP + TN) / comb(n, 2)."""
    s_ab, s_a, s_b, nc = _pair_stats(last)
    tn = nc - (s_a + s_b - s_ab)
    return (s_ab + tn) / ensure_nonzero(nc)


def calc_arand(last: Dict) -> jnp.ndarray:
    """Adjusted Rand index."""
    s_ab, s_a, s_b, nc = _pair_stats(last)
    expected = s_a * s_b / ensure_nonzero(nc)
    return (s_ab - expected) / ensure_nonzero(0.5 * (s_a + s_b) - expected)


_SCORE_FNS = {
    "mi": lambda last, avg: calc_mi(last),
    "ami": calc_ami,
    "nmi": calc_nmi,
    "constant": lambda last, avg: calc_constant(last),
    "fm": lambda last, avg: calc_fm(last),
    "rand": lambda last, avg: calc_rand(last),
    "arand": lambda last, avg: calc_arand(last),
}


def _pair_mean(scores: jnp.ndarray, pair_weights=None) -> jnp.ndarray:
    """(W, P) -> (W,): plain or weighted mean over pairs (the reference's
    per-layer-pair weighting, correspondence_retrieval pair_weights.py)."""
    if pair_weights is None:
        return scores.mean(axis=-1)
    w = jnp.asarray(pair_weights, dtype=scores.dtype)
    return (scores * w).sum(axis=-1) / jnp.maximum(w.sum(), EPS)


def score_candidates_full(
    cache: Dict,
    pairs: jnp.ndarray,
    ncentroids: int,
    kind: str = "mi",
    average_method: str = "arithmetic",
    pair_weights=None,
) -> jnp.ndarray:
    """Score each candidate as if added alone to the cache -> (W,).

    Builds the full W x P x C x C tables (reference EfficientMI/BatchMI
    path: get_last + _calc_score, mi.py:93-98 + batch.py:123-130), then
    means over pairs.
    """
    tables = candidate_tables(pairs, ncentroids, cache["N"].dtype)
    last = {key: cache[key][None] + tables[key] for key in cache}
    scores = _SCORE_FNS[kind](last, average_method)  # (W, P)
    return _pair_mean(scores, pair_weights)


# -- incremental O(W*P) MI scoring (EfficientMemMI math) ----------------------

def nlogn(x: jnp.ndarray) -> jnp.ndarray:
    return x * jnp.log(x)


def mem_stats(cache: Dict) -> Dict[str, jnp.ndarray]:
    """Scalar-per-pair sums Sum(N log N), Sum(a log a), Sum(b log b)
    (reference mi.py:297-308)."""
    return {
        "NlogN": nlogn(cache["N"]).sum(axis=(-1, -2)),
        "aloga": nlogn(cache["a"]).sum(axis=-1),
        "blogb": nlogn(cache["b"]).sum(axis=-1),
    }


def score_candidates_mem(
    cache: Dict,
    stats: Dict,
    pairs: jnp.ndarray,
    ncentroids: int,
    pair_weights=None,
) -> jnp.ndarray:
    """Incremental MI score for W candidates -> (W,).

    Adding one sample increments exactly one cell (and one row/col margin)
    per pair, so the nlogn sums update by ``-nlogn(x) + nlogn(x+1)`` where x
    is the touched value (reference mi.py:322-381). Cell reads use one-hot
    einsums instead of gathers.
    """
    dtype = cache["N"].dtype
    p1, p2 = _onehots(pairs, ncentroids, dtype)  # (W,P,C)
    n_at = jnp.einsum("pab,wpa,wpb->wp", cache["N"], p1, p2,
                      preferred_element_type=dtype)
    a_at = jnp.einsum("pc,wpc->wp", cache["a"], p2, preferred_element_type=dtype)
    b_at = jnp.einsum("pc,wpc->wp", cache["b"], p1, preferred_element_type=dtype)
    new_nlogn = stats["NlogN"][None] - nlogn(n_at) + nlogn(n_at + 1)
    new_aloga = stats["aloga"][None] - nlogn(a_at) + nlogn(a_at + 1)
    new_blogb = stats["blogb"][None] - nlogn(b_at) + nlogn(b_at + 1)
    n_new = (cache["n"] + 1)[None]  # (1,P)
    scores = new_nlogn / n_new - new_aloga / n_new - new_blogb / n_new + jnp.log(n_new)
    return _pair_mean(scores, pair_weights)


# NB on margin conventions (reference mi.py:85-91 with a=N.sum(dim=1),
# b=N.sum(dim=2)): ``a`` sums over the FIRST cluster axis (so a indexes the
# second view) and ``b`` over the second (indexing the first view). Hence
# a is gathered with p2 and b with p1 above.


# -- batch greedy selection (EfficientBatchMI) --------------------------------

class BatchGreedySelector:
    """Greedy batched MI maximization (reference batch.py:10-260).

    Per iteration: take the next ``batch_size`` candidates from a shuffled
    pool, score each as-if-added-alone, select the ``selection_size`` best,
    fold them into the cache; unselected return to the back of the pool when
    ``keep_unselected``.

    Device work is one jitted step with static (B, k); pool bookkeeping is
    host numpy. ``batch_size`` can be thousands on TPU — the reference's
    GPU-memory chunking (batch.py:56-87) is unnecessary.
    """

    def __init__(
        self,
        assignments: np.ndarray,  # (V, D) ints
        combinations: Sequence[Tuple[int, int]],
        ncentroids: int,
        batch_size: int = 20,
        selection_size: int = 4,
        keep_unselected: bool = True,
        scorer: str = "mem",  # 'mem' (incremental MI) | full-table kinds
        average_method: str = "arithmetic",
        seed: Optional[int] = None,
        rng: Optional[np.random.RandomState] = None,
        pair_weights=None,
        mesh=None,
        dtype=jnp.float32,
    ):
        self.assignments = np.asarray(assignments)
        self.combinations = list(combinations)
        self.C = int(ncentroids)
        self.B = int(batch_size)
        self.k = int(selection_size)
        self.keep_unselected = keep_unselected
        self.scorer = scorer
        self.average_method = average_method
        self.pair_weights = (
            np.asarray(pair_weights, np.float32) if pair_weights is not None else None
        )
        self.rng = rng if rng is not None else np.random.RandomState(seed)
        self.mesh = mesh
        self.dtype, self._x64 = _resolve_dtype(dtype)

        with self._x64():
            pairs_np = pair_assignments(self.assignments, self.combinations)
            self.pairs_all = self._put_pairs(pairs_np)  # (V, P, 2) device-resident
            self.cache = init_cache(len(self.combinations), self.C, dtype=self.dtype)
            self.stats = mem_stats(self.cache)
        self.candidate_ids = np.arange(self.assignments.shape[0], dtype=np.int64)
        self._step = self._build_step()

    def _put_pairs(self, pairs_np: np.ndarray):
        """Candidate pair-coordinates, sharded over the mesh's data axis
        when a mesh is given (SURVEY.md section 7.5: shard the candidate
        dimension across chips; scoring is embarrassingly parallel and the
        top-k merge is a cheap gather XLA inserts)."""
        if self.mesh is None:
            return jnp.asarray(pairs_np)
        from jax.sharding import NamedSharding, PartitionSpec as P

        v = pairs_np.shape[0]
        n = self.mesh.shape["data"]
        if v % n != 0:  # pad to a shardable length with repeats of row 0
            pad = n - v % n
            pairs_np = np.concatenate([pairs_np, np.repeat(pairs_np[:1], pad, 0)])
        return jax.device_put(
            jnp.asarray(pairs_np), NamedSharding(self.mesh, P("data", None, None))
        )

    # -- device step -------------------------------------------------------
    def _build_step(self):
        scorer = self.scorer
        avg = self.average_method
        ncentroids = self.C
        k = self.k
        weights = self.pair_weights

        @jax.jit
        def step(cache, stats, pairs_all, batch_ids, valid_mask):
            pairs = jnp.take(pairs_all, batch_ids, axis=0)  # (B,P,2)
            if scorer == "mem":
                scores = score_candidates_mem(cache, stats, pairs, ncentroids,
                                              pair_weights=weights)
            else:
                scores = score_candidates_full(cache, pairs, ncentroids,
                                               kind=scorer, average_method=avg,
                                               pair_weights=weights)
            # Pad rows (static-shape filler for short tail batches) must
            # never win top-k nor touch the cache: mask their scores to
            # -inf and fold winners with 0-weight when they are pads
            # (reference batch.py:132-171 had dynamic shapes, no pads).
            scores = jnp.where(valid_mask, scores, -jnp.inf)
            top_scores, top_idx = jax.lax.top_k(scores, k)
            winner_valid = jnp.take(valid_mask, top_idx)
            winner_pairs = jnp.take(pairs, top_idx, axis=0)  # (k,P,2)
            new_cache = add_candidates_to_cache(
                cache, winner_pairs, ncentroids, weights=winner_valid
            )
            new_stats = mem_stats(new_cache)
            return new_cache, new_stats, top_idx, top_scores

        return step

    # -- host orchestration --------------------------------------------------
    def shuffle_candidates(self):
        self.rng.shuffle(self.candidate_ids)

    def add_samples(self, ids: Sequence[int]):
        """Seed the cache with start indices (reference batch.py:190-193)."""
        ids = np.asarray(list(ids), dtype=np.int64)
        if ids.size == 0:
            return
        with self._x64():
            pairs = jnp.take(self.pairs_all, jnp.asarray(ids), axis=0)
            self.cache = add_candidates_to_cache(self.cache, pairs, self.C)
            self.stats = mem_stats(self.cache)
        mask = ~np.isin(self.candidate_ids, ids)
        self.candidate_ids = self.candidate_ids[mask]

    def modify_k(self, subset_size: int) -> int:
        """Grow k when B*S/V > k so the loop can terminate
        (reference batch.py:173-188)."""
        v = self.assignments.shape[0]
        term = self.B * subset_size / v
        if self.k < term and not self.keep_unselected:
            self.k = math.ceil(term)
            self._step = self._build_step()
        return self.k

    def run_greedy(self, subset_size: int, start_indices: Sequence[int] = (),
                   verbose: bool = False):
        """Select ``subset_size`` ids. Returns (S, GAIN, timelapse, LOOKUPS)
        like the reference (batch.py:202-260)."""
        import time

        selected: List[int] = []
        gains: List[float] = []
        timelapse: List[float] = []
        lookups: List[int] = []
        self.modify_k(subset_size)
        self.add_samples(list(start_indices))
        while len(selected) < subset_size:
            t0 = time.time()
            self.shuffle_candidates()
            b = min(self.B, len(self.candidate_ids))
            if b == 0:
                break
            batch = self.candidate_ids[:b]
            if b < self.B:  # pad to static shape; pads are masked inside step
                pad = np.full(self.B - b, batch[0], dtype=np.int64)
                batch_dev = np.concatenate([batch, pad])
            else:
                batch_dev = batch
            valid_mask = np.arange(self.B) < b
            with self._x64():
                self.cache, self.stats, top_idx, top_scores = self._step(
                    self.cache, self.stats, self.pairs_all, jnp.asarray(batch_dev),
                    jnp.asarray(valid_mask),
                )
            top_idx = np.asarray(top_idx)
            top_scores = np.asarray(top_scores)
            if b < self.B:
                keep = top_idx < b
                top_idx, top_scores = top_idx[keep], top_scores[keep]
            winner_ids = batch[top_idx]
            selected += winner_ids.tolist()
            gains += top_scores.tolist()
            lookups.append(1)
            timelapse.append(time.time() - t0)
            # pool update (reference batch.py:156-171)
            rest = self.candidate_ids[b:]
            if self.keep_unselected:
                unselected = np.setdiff1d(batch, winner_ids, assume_unique=False)
                self.candidate_ids = np.concatenate([rest, unselected])
            else:
                self.candidate_ids = rest
        # everything folded into the cache, including winners beyond
        # subset_size when modify_k grew k (diagnostics / cache-integrity
        # tests); the returned subset is truncated like the reference's.
        self.folded_ids = list(selected)
        return selected[:subset_size], gains, timelapse, lookups


# -- single-step greedy (EfficientMI.run_greedy semantics) --------------------

class GreedySelector:
    """One-winner-per-iteration greedy over the WHOLE candidate pool.

    Reference ``EfficientMI.run_greedy`` (mi.py:150-192): every iteration
    scores every remaining candidate and takes the argmax. Used by the
    correspondence-retrieval experiments. On TPU the pool is scored with a
    static shape and selected ids are masked to -inf instead of removed.
    """

    def __init__(
        self,
        assignments: np.ndarray,
        combinations: Sequence[Tuple[int, int]],
        ncentroids: int,
        kind: str = "mi",
        average_method: str = "arithmetic",
        scorer: Optional[str] = None,
        pair_weights=None,
        mesh=None,
        dtype=jnp.float32,
    ):
        self.assignments = np.asarray(assignments)
        self.combinations = list(combinations)
        self.C = int(ncentroids)
        self.kind = kind
        self.average_method = average_method
        self.pair_weights = (
            np.asarray(pair_weights, np.float32) if pair_weights is not None else None
        )
        self.mesh = mesh
        self.dtype, self._x64 = _resolve_dtype(dtype)
        # 'mem' scorer valid only for plain MI
        self.scorer = scorer or ("mem" if kind == "mi" else "full")
        pairs_np = pair_assignments(self.assignments, self.combinations)
        self._true_v = pairs_np.shape[0]
        with self._x64():
            self.pairs_all = BatchGreedySelector._put_pairs(self, pairs_np)
            self.cache = init_cache(len(self.combinations), self.C, dtype=self.dtype)
            self.stats = mem_stats(self.cache)
        v = int(self.pairs_all.shape[0])  # includes mesh padding rows
        self.active = np.ones(v, dtype=bool)
        self.active[self._true_v:] = False
        self._step = self._build_step()

    def _build_step(self):
        scorer = self.scorer
        kind = self.kind
        avg = self.average_method
        ncentroids = self.C
        weights = self.pair_weights

        @jax.jit
        def step(cache, stats, pairs_all, active_mask):
            if scorer == "mem":
                scores = score_candidates_mem(cache, stats, pairs_all, ncentroids,
                                              pair_weights=weights)
            else:
                scores = score_candidates_full(
                    cache, pairs_all, ncentroids, kind=kind, average_method=avg,
                    pair_weights=weights,
                )
            scores = jnp.where(active_mask, scores, -jnp.inf)
            idx = jnp.argmax(scores)
            winner = jnp.take(pairs_all, idx[None], axis=0)
            new_cache = add_candidates_to_cache(cache, winner, ncentroids)
            return new_cache, mem_stats(new_cache), idx, scores[idx]

        return step

    def scores(self) -> np.ndarray:
        """Score every candidate against the current cache (diagnostics)."""
        with self._x64():
            if self.scorer == "mem":
                s = score_candidates_mem(self.cache, self.stats, self.pairs_all,
                                         self.C, pair_weights=self.pair_weights)
            else:
                s = score_candidates_full(
                    self.cache, self.pairs_all, self.C, self.kind,
                    self.average_method, pair_weights=self.pair_weights,
                )
        return np.asarray(s)

    def add_samples(self, ids: Sequence[int]):
        ids = np.asarray(list(ids), dtype=np.int64)
        if ids.size == 0:
            return
        with self._x64():
            pairs = jnp.take(self.pairs_all, jnp.asarray(ids), axis=0)
            self.cache = add_candidates_to_cache(self.cache, pairs, self.C)
            self.stats = mem_stats(self.cache)
        self.active[ids] = False

    def run_greedy(self, subset_size: int, start_indices: Sequence[int] = (),
                   verbose: bool = False, fold_start: bool = True):
        """``fold_start`` selects between the reference's two start-index
        semantics: the retrieval suite folds start samples into the cache
        (correspondence_retrieval measures/efficient.py:249) while stage-6
        pool greedy only reserves them output slots — its cache starts empty
        and the singleton never contributes counts
        (subset_selection measures/mi.py:150-173, no add_samples call)."""
        import time

        selected = list(start_indices)
        if fold_start:
            self.add_samples(start_indices)
        else:
            ids = np.asarray(list(start_indices), dtype=np.int64)
            if ids.size:
                self.active[ids] = False
        gains: List[float] = []
        timelapse: List[float] = []
        lookups: List[int] = []
        # reference loops to subset_size - 1 (mi.py:161)
        while len(selected) < subset_size - 1:
            t0 = time.time()
            with self._x64():
                self.cache, self.stats, idx, score = self._step(
                    self.cache, self.stats, self.pairs_all, jnp.asarray(self.active)
                )
            idx = int(idx)
            self.active[idx] = False
            selected.append(idx)
            gains.append(float(score))
            timelapse.append(time.time() - t0)
            lookups.append(0)
        return selected, gains, timelapse, lookups
