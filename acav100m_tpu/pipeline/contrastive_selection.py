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
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

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
    kv, ka = jax.random.split(key)
    scale_v = 1.0 / np.sqrt(video_dim)
    scale_a = 1.0 / np.sqrt(audio_dim)
    return {
        "wv": jax.random.normal(kv, (video_dim, PROJECTION_SIZE)) * scale_v,
        "bv": jnp.zeros((PROJECTION_SIZE,)),
        "wa": jax.random.normal(ka, (audio_dim, PROJECTION_SIZE)) * scale_a,
        "ba": jnp.zeros((PROJECTION_SIZE,)),
    }


def project(params: Dict, video: jnp.ndarray, audio: jnp.ndarray):
    zv = video @ params["wv"] + params["bv"]
    za = audio @ params["wa"] + params["ba"]
    zv = zv / jnp.maximum(jnp.linalg.norm(zv, axis=-1, keepdims=True), 1e-12)
    za = za / jnp.maximum(jnp.linalg.norm(za, axis=-1, keepdims=True), 1e-12)
    return zv, za


def probe_loss(params, video, audio, temperature: float = TEMPERATURE):
    zv, za = project(params, video, audio)
    logits = zv @ za.T / temperature
    labels = jnp.arange(zv.shape[0])
    loss_v = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    loss_a = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels).mean()
    return (loss_v + loss_a) / 2


def train_probe(
    video: np.ndarray,
    audio: np.ndarray,
    num_epochs: int = 3,
    batch_size: int = 128,
    base_lr: float = 2e-4,
    warmup_steps: int = 1,
    seed: int = 0,
) -> Dict:
    """Defaults mirror subset_selection config ``contrastive``
    (config.py:37-44)."""
    v = video.shape[0]
    batch_size = min(batch_size, v)
    steps_per_epoch = max(v // batch_size, 1)
    total = num_epochs * steps_per_epoch
    schedule = optax.join_schedules(
        [
            optax.linear_schedule(0.0, base_lr, max(warmup_steps, 1)),
            optax.linear_schedule(base_lr, 0.0, max(total - warmup_steps, 1)),
        ],
        [max(warmup_steps, 1)],
    )
    optimizer = optax.adamw(schedule)
    params = init_probe(jax.random.PRNGKey(seed), video.shape[1], audio.shape[1])
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, vb, ab):
        loss, grads = jax.value_and_grad(probe_loss)(params, vb, ab)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.RandomState(seed)
    video_d = jnp.asarray(video)
    audio_d = jnp.asarray(audio)
    for epoch in range(num_epochs):
        order = rng.permutation(v)
        for i in range(0, v - batch_size + 1, batch_size):
            idx = jnp.asarray(order[i : i + batch_size])
            params, opt_state, loss = step(
                params, opt_state, jnp.take(video_d, idx, axis=0),
                jnp.take(audio_d, idx, axis=0),
            )
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
