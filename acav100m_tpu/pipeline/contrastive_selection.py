"""Alternative subset-selection measure: contrastive alignment ranking.

Port of ``subset_selection/code/measures/contrastive/`` +
``run_contrastive.py`` + ``do_sample.py``: train a small two-projection
contrastive probe on the extracted penultimate features (video layer_4
2304-d, audio layer_4 128-d -> 128-d projections, InfoNCE temperature 0.1,
AdamW with linear warmup-decay), then rank every clip by the inner product
of its aligned projections and keep the top fraction.

TPU-native: the probe trains in one jitted step over device-resident
feature matrices; the reference's spawn + diff_all_gather + manual gradient
all-reduce (module.py:99-103) collapses into SPMD autodiff on a sharded
batch. Post-sampling (sort / dedupe / cut, ``do_sample.py``) is plain
numpy instead of coreutils subprocesses.

The training trajectory replicates the reference's exactly
(oracle-verified in ``tests/test_contrastive_reference_parity.py``):

* torch-``AdamW`` math with ``amsgrad=True``, ``eps=1e-6``, betas
  (0.9, 0.999) and torch's default decoupled ``weight_decay=0.01``
  (``measures/contrastive/contrastive.py:27-35``);
* the lr is set ONCE PER EPOCH from a linear warmup-decay over epochs,
  ``lr_func_linear(epoch+1, num_epochs+1, warmup)`` (``:43-52``);
* gradients are NEVER zeroed — ``train_batch`` runs ``loss.backward();
  optimizer.step()`` with no ``zero_grad`` anywhere
  (``measures/contrastive/contrastive.py:91-99``), so every step's
  ``.grad`` is the running SUM of all gradients so far. ``train_probe``
  reproduces this accumulation by default (``accumulate_grads=True``).
"""

from __future__ import annotations

from functools import partial
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.io import load_pickle, save_output_csv

TEMPERATURE = 0.1
PROJECTION_SIZE = 128


def load_penultimate_features(shard_paths: Sequence) -> Tuple[np.ndarray, np.ndarray, List[Dict]]:
    """Feature pkls -> (video (V, 2304), audio (V, 128), row metas).

    Uses the last layer of the layer extractors (feature_loaders/loader.py).
    """
    vids, auds, metas = [], [], []
    for path in shard_paths:
        try:
            rows = load_pickle(path)
        except Exception as e:
            print(f"skipping unreadable shard {path}: {e}")
            continue
        for row in rows:
            v = row["video_features"][0]["array"]
            a = row["audio_features"][0]["array"]
            if isinstance(v, dict):
                v = v[sorted(v)[-1]]
            if isinstance(a, dict):
                a = a[sorted(a)[-1]]
            vids.append(np.asarray(v, np.float32))
            auds.append(np.asarray(a, np.float32))
            metas.append({"filename": row["filename"], "shard_name": row["shard_name"]})
    if not vids:
        return np.zeros((0, 1)), np.zeros((0, 1)), []
    return np.stack(vids), np.stack(auds), metas


def init_probe(key, video_dim: int, audio_dim: int) -> Dict:
    """torch ``nn.Linear`` default init: weight and bias both uniform in
    (-1/sqrt(fan_in), 1/sqrt(fan_in)) (kaiming_uniform with a=sqrt(5))."""
    kv, kbv, ka, kba = jax.random.split(key, 4)
    bound_v = 1.0 / np.sqrt(video_dim)
    bound_a = 1.0 / np.sqrt(audio_dim)
    uni = lambda k, shape, b: jax.random.uniform(k, shape, minval=-b, maxval=b)
    return {
        "wv": uni(kv, (video_dim, PROJECTION_SIZE), bound_v),
        "bv": uni(kbv, (PROJECTION_SIZE,), bound_v),
        "wa": uni(ka, (audio_dim, PROJECTION_SIZE), bound_a),
        "ba": uni(kba, (PROJECTION_SIZE,), bound_a),
    }


def project(params: Dict, video: jnp.ndarray, audio: jnp.ndarray):
    zv = video @ params["wv"] + params["bv"]
    za = audio @ params["wa"] + params["ba"]
    zv = zv / jnp.maximum(jnp.linalg.norm(zv, axis=-1, keepdims=True), 1e-12)
    za = za / jnp.maximum(jnp.linalg.norm(za, axis=-1, keepdims=True), 1e-12)
    return zv, za


def _log_softmax_xent(logits, labels):
    logz = jax.scipy.special.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    return logz - picked


def probe_loss(params, video, audio, temperature: float = TEMPERATURE):
    """Reference loss: ``(sum_xent(ab) + sum_xent(ba)) / (2B)``
    (module.py:54-74) — identical to the mean of the two directional means."""
    zv, za = project(params, video, audio)
    logits = zv @ za.T / temperature
    labels = jnp.arange(zv.shape[0])
    loss_v = _log_softmax_xent(logits, labels).mean()
    loss_a = _log_softmax_xent(logits.T, labels).mean()
    return (loss_v + loss_a) / 2


def probe_accuracy(params, video, audio, temperature: float = TEMPERATURE):
    """Reference acc: mean of both directions' top-1 rates x100
    (module.py:76-86 via topks_correct)."""
    zv, za = project(params, video, audio)
    logits = zv @ za.T / temperature
    labels = jnp.arange(zv.shape[0])
    top1_v = (jnp.argmax(logits, axis=-1) == labels).sum()
    top1_a = (jnp.argmax(logits.T, axis=-1) == labels).sum()
    return (top1_v + top1_a) / (2 * zv.shape[0]) * 100.0


def lr_func_linear(current_step: int, num_training_steps: int,
                   num_warmup_steps: int = 3) -> float:
    """Linear warmup-decay ramp over EPOCHS (contrastive.py:43-47)."""
    if current_step < num_warmup_steps:
        return float(current_step) / float(max(1, num_warmup_steps))
    return max(0.0, float(num_training_steps - current_step)
               / float(max(1, num_training_steps - num_warmup_steps)))


def adamw_init(params: Dict) -> Dict:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return {"m": zeros, "v": zeros,
            "vmax": jax.tree.map(jnp.zeros_like, params), "t": jnp.zeros(())}


@partial(jax.jit, static_argnames=("b1", "b2", "eps", "weight_decay", "amsgrad"))
def adamw_update(params: Dict, grads: Dict, state: Dict, lr,
                 b1: float = 0.9, b2: float = 0.999, eps: float = 1e-6,
                 weight_decay: float = 0.01, amsgrad: bool = True):
    """Exact ``torch.optim.AdamW`` update (decoupled decay applied to the
    pre-step params, bias-corrected moments, amsgrad max on the RAW second
    moment) with the reference probe's hyperparameters
    (contrastive.py:27-35: betas (0.9, 0.999), eps 1e-6, amsgrad=True,
    torch default weight_decay=0.01)."""
    t = state["t"] + 1.0
    bc1 = 1.0 - b1 ** t
    bc2 = 1.0 - b2 ** t
    m = jax.tree.map(lambda m_, g: b1 * m_ + (1 - b1) * g, state["m"], grads)
    v = jax.tree.map(lambda v_, g: b2 * v_ + (1 - b2) * g * g, state["v"], grads)
    vmax = jax.tree.map(jnp.maximum, state["vmax"], v) if amsgrad else v
    vhat = vmax if amsgrad else v

    def upd(p, m_, vh):
        p = p * (1.0 - lr * weight_decay)
        denom = jnp.sqrt(vh) / jnp.sqrt(bc2) + eps
        return p - (lr / bc1) * m_ / denom

    new_params = jax.tree.map(upd, params, m, vhat)
    return new_params, {"m": m, "v": v, "vmax": vmax, "t": t}


def train_probe(
    video: np.ndarray,
    audio: np.ndarray,
    num_epochs: int = 3,
    batch_size: int = 128,
    base_lr: float = 2e-4,
    warmup_steps: int = 1,
    seed: int = 0,
    params: Optional[Dict] = None,
    accumulate_grads: bool = True,
) -> Dict:
    """Train the probe on the reference's exact trajectory.

    Defaults mirror subset_selection config ``contrastive``
    (config.py:37-44). ``accumulate_grads=True`` is the reference's actual
    (never-zeroed ``.grad``) semantics — see module docstring; pass False
    for a conventional per-batch AdamW. ``params`` injects an initial state
    (used by the parity oracle tests and ``copy_measure``-style resume).
    Tail batches are included, like the reference DataLoader
    (``feature_loaders/loader.py:33-38``, drop_last=False).
    """
    v = video.shape[0]
    batch_size = min(batch_size, v)
    if params is None:
        params = init_probe(jax.random.PRNGKey(seed), video.shape[1], audio.shape[1])
    state = adamw_init(params)
    g_accum = jax.tree.map(jnp.zeros_like, params)

    grad_fn = jax.jit(jax.grad(probe_loss))

    rng = np.random.RandomState(seed)
    video_d = jnp.asarray(video)
    audio_d = jnp.asarray(audio)
    for epoch in range(num_epochs):
        lr = lr_func_linear(epoch + 1, num_epochs + 1, warmup_steps) * base_lr
        order = rng.permutation(v)
        for i in range(0, v, batch_size):
            idx = jnp.asarray(order[i : i + batch_size])
            grads = grad_fn(params, jnp.take(video_d, idx, axis=0),
                            jnp.take(audio_d, idx, axis=0))
            if accumulate_grads:
                g_accum = jax.tree.map(jnp.add, g_accum, grads)
                grads = g_accum
            params, state = adamw_update(params, grads, state, lr)
    return params


def alignment_scores(params: Dict, video: np.ndarray, audio: np.ndarray) -> np.ndarray:
    """Per-clip aligned-projection inner products (the ranking score)."""
    zv, za = project(params, jnp.asarray(video), jnp.asarray(audio))
    return np.asarray(jnp.sum(zv * za, axis=-1))


def rank_and_cut(metas: Sequence[Dict], scores: np.ndarray,
                 subset_ratio: float = 0.2,
                 subset_size: Optional[int] = None,
                 dedupe: bool = True) -> List[Dict]:
    """Sort by score desc, dedupe by filename, cut top-k
    (``do_sample.py:25-177``). Ties break by filename ascending like the
    reference's ``sort -k 1,1gr -k 2``."""
    order = sorted(range(len(metas)),
                   key=lambda i: (-scores[i], metas[i]["filename"]))
    if subset_size is None:
        subset_size = round(subset_ratio * len(metas))
    out, seen = [], set()
    for i in order:
        meta = metas[i]
        key = meta["filename"]
        if dedupe and key in seen:
            continue
        seen.add(key)
        out.append({**meta, "score": float(scores[i])})
        if len(out) >= subset_size:
            break
    return out


def run_contrastive_selection(
    shard_paths: Sequence,
    out_path,
    metas_by_shard: Optional[Dict] = None,
    subset_ratio: float = 0.2,
    subset_size: Optional[int] = None,
    num_epochs: int = 3,
    batch_size: int = 128,
    base_lr: float = 2e-4,
    seed: int = 0,
) -> Tuple[Optional[Path], int]:
    video, audio, metas = load_penultimate_features(shard_paths)
    if len(metas) == 0:
        return None, 0
    params = train_probe(video, audio, num_epochs, batch_size, base_lr, seed=seed)
    scores = alignment_scores(params, video, audio)
    selected = rank_and_cut(metas, scores, subset_ratio, subset_size)
    rows = [{"filename": m["filename"], "shard_name": m["shard_name"]} for m in selected]
    return save_output_csv(rows, metas_by_shard or {}, Path(out_path))


def merge_contrastive_csvs(cache_csvs, out_path, subset_size=None,
                           subset_ratio=0.2, dedupe=True):
    """Merge per-chunk contrastive score csvs, sort by score desc, dedupe,
    cut top-k (reference merge_contrastive.py:16-130 + do_sample.py).

    Expects rows ``shard_name,filename,score``; writes the same format.
    """
    import csv as _csv
    from pathlib import Path as _Path

    rows = []
    for path in cache_csvs:
        with open(path) as f:
            for row in _csv.reader(f):
                if len(row) >= 3:
                    rows.append((row[0], row[1], float(row[2])))
    # score desc, filename asc — the reference's `sort -k 1,1gr -k 2`
    # (merge_contrastive.py:48, oracle-tested)
    rows.sort(key=lambda r: (-r[2], r[1]))
    if subset_size is None:
        subset_size = round(subset_ratio * len(rows))
    out, seen = [], set()
    for shard, fname, score in rows:
        if dedupe and fname in seen:
            continue
        seen.add(fname)
        out.append((shard, fname, score))
        if len(out) >= subset_size:
            break
    out_path = _Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    with open(out_path, "w") as f:
        w = _csv.writer(f)
        for row in out:
            w.writerow(row)
    return out_path, len(out)
