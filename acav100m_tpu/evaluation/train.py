"""Evaluation-suite training: contrastive pretrain + linear eval.

Rebuild of ``evaluation/code/{contrast_net,classify_net}.py`` +
``utils/lr_policy.py`` + ``models/optimizer.py`` + ``utils/checkpoint.py``:

* lr policies: cosine / linear with linear warmup (lr_policy.py:6-61);
* optimizers: adamw / adam / sgd via optax (models/optimizer.py);
* pretrain loop: global-batch InfoNCE (see ``models.contrast_loss``),
  preemptible ``epoch_latest`` / ``step_latest`` checkpoints
  (contrast_net.py:105-135, 252-270);
* linear eval: frozen backbone (stop_gradient + inference BN — the
  reference's ``torch.no_grad`` backbone, classify.py:255-326), trainable
  ``ClassifyHead``, optimizer over head params only (classify_net.py:87);
* test-time ensembling: per-video score sums over ensemble views
  (utils/meters.py:522-689).

The train step is ONE jitted SPMD program; with a mesh, batches shard over
the data axis and XLA inserts the gradient all-reduce (DDP), the embedding
gather (diff_all_gather) and global BN stats (SyncBN) automatically.
"""

from __future__ import annotations

import math
import time
from pathlib import Path
from typing import (
    Any, Callable, Dict, Iterable, NamedTuple, Optional, Sequence, Tuple,
)

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..utils.io import dump_pickle, load_pickle
from .models import ClassifyHead, Contrast, contrast_loss, strip_heads

DATA_MEAN = (0.45, 0.45, 0.45)
DATA_STD = (0.225, 0.225, 0.225)


# -- lr policies / optimizers --------------------------------------------------

def lr_schedule(policy: str, base_lr: float, total_steps: int,
                warmup_steps: int = 0, warmup_start_lr: float = 0.0,
                end_lr: float = 0.0):
    """optax schedule mirroring utils/lr_policy.py, quirks included
    (oracle-tested in tests/test_aux_reference_parity.py): the LINEAR
    policy's warmup ramps from 0 regardless of ``warmup_start_lr``
    (lr_policy.py:25-27 — only cosine honors it, :29-33), and CONSTANT
    ignores warmup entirely (:35-36)."""
    if policy not in ("cosine", "linear", "constant"):
        raise ValueError(f"unknown lr policy {policy!r}")
    # Implemented directly (not via optax.cosine_decay_schedule /
    # join_schedules) so the values match lr_policy.py to full precision in
    # the ambient dtype — the optax built-ins round through f32 internally,
    # which shows up as ~1e-9 lr deltas that break f64 trajectory parity.
    decay_span = max(total_steps - warmup_steps, 1)

    def schedule(count):
        step = jnp.asarray(count).astype(jnp.result_type(float))
        if policy == "constant":
            return jnp.full_like(step, base_lr)
        warm_frac = step / max(1, warmup_steps) if warmup_steps > 0 else step * 0.0
        if policy == "linear":
            # lr_func_linear (lr_policy.py:44-50): ramp from 0 (ignores
            # warmup_start_lr — reference quirk), then linear decay to 0
            # (end_lr generalizes the decay tail; default 0 == reference).
            decay = jnp.maximum(0.0, (total_steps - step) / decay_span)
            alpha = jnp.where(step < warmup_steps, warm_frac, decay)
            return end_lr + (base_lr - end_lr) * alpha
        # cosine (lr_policy.py:29-33, 53-63): warmup honors warmup_start_lr.
        warm = warmup_start_lr + (base_lr - warmup_start_lr) * warm_frac
        cosf = (jnp.cos(jnp.pi * (step - warmup_steps) / decay_span) + 1.0) * 0.5
        cos_lr = (base_lr - end_lr) * cosf + end_lr
        return jnp.where(step < warmup_steps, warm, cos_lr)

    return schedule


def _bn_param_mask(params, bn: bool):
    """Bool pytree selecting parameters inside (``bn=True``) or outside
    BatchNorm modules.

    The reference splits weight decay by ``'bn' in name`` over torch
    parameter names (models/optimizer.py:18-35: BN params get
    ``BN.WEIGHT_DECAY`` = 0, the rest ``SOLVER.WEIGHT_DECAY``); the flax
    module names carry the same ``*_bn`` components, so matching any path
    component containing "bn" selects the identical split.
    """
    import jax.tree_util as jtu

    def leaf(path, _):
        has = any("bn" in str(getattr(k, "key", k)) for k in path)
        return has if bn else not has

    return jtu.tree_map_with_path(leaf, params)


def scale_by_torch_adam(b1: float = 0.9, b2: float = 0.999,
                        eps: float = 1e-6, amsgrad: bool = False
                        ) -> optax.GradientTransformation:
    """``torch.optim.Adam``'s moment math, exactly (trajectory-parity-tested
    against the reference's own ``construct_optimizer`` in
    tests/test_eval_optimizer_reference_parity.py):

    ``mu <- b1 mu + (1-b1) g``, ``nu <- b2 nu + (1-b2) g^2``,
    ``update = (mu / (1 - b1^t)) / (sqrt(nu_sel) / sqrt(1 - b2^t) + eps)``
    where ``nu_sel`` is the running **uncorrected-moment max** when
    ``amsgrad`` (torch keeps ``max_exp_avg_sq`` of the raw ``exp_avg_sq``,
    unlike some amsgrad variants that max the corrected one).
    """

    def init(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        state = {"mu": zeros, "nu": jax.tree.map(jnp.zeros_like, params),
                 "count": jnp.zeros((), jnp.int32)}
        if amsgrad:
            state["nu_max"] = jax.tree.map(jnp.zeros_like, params)
        return state

    def update(updates, state, params=None):
        del params
        count = state["count"] + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                          state["mu"], updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                          state["nu"], updates)
        bc1 = 1.0 - b1 ** count.astype(jnp.result_type(float))
        bc2 = 1.0 - b2 ** count.astype(jnp.result_type(float))
        new_state = {"mu": mu, "nu": nu, "count": count}
        if amsgrad:
            nu_sel = jax.tree.map(jnp.maximum, state["nu_max"], nu)
            new_state["nu_max"] = nu_sel
        else:
            nu_sel = nu
        out = jax.tree.map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v) / jnp.sqrt(bc2) + eps),
            mu, nu_sel)
        return out, new_state

    return optax.GradientTransformation(init, update)


def scale_by_torch_sgd(momentum: float = 0.9, dampening: float = 0.0,
                       nesterov: bool = True) -> optax.GradientTransformation:
    """``torch.optim.SGD``'s momentum buffer, exactly — including the
    first-step quirk that the buffer is initialized to the RAW gradient
    (``buf = g``, no ``(1 - dampening)`` factor; torch sgd.py) before the
    ``buf <- momentum buf + (1-dampening) g`` recurrence; nesterov output
    is ``g + momentum * buf``."""

    def init(params):
        return {"buf": jax.tree.map(jnp.zeros_like, params),
                "count": jnp.zeros((), jnp.int32)}

    def update(updates, state, params=None):
        del params
        first = state["count"] == 0
        buf = jax.tree.map(
            lambda b, g: jnp.where(
                first, g, momentum * b + (1 - dampening) * g),
            state["buf"], updates)
        if nesterov:
            out = jax.tree.map(lambda g, b: g + momentum * b, updates, buf)
        else:
            out = buf
        return out, {"buf": buf, "count": state["count"] + 1}

    return optax.GradientTransformation(init, update)


def build_optimizer(name: str, schedule, weight_decay: float = 1e-5,
                    bn_weight_decay: float = 0.0, momentum: float = 0.9,
                    dampening: float = 0.0, nesterov: bool = True,
                    eps: float = 1e-6, amsgrad: bool = True
                    ) -> optax.GradientTransformation:
    """Reference-faithful optimizer stack (models/optimizer.py:10-72,
    trajectory-parity-tested vs the torch optimizers it constructs):

    * weight decay split by parameter group — BN params get
      ``bn_weight_decay`` (BN.WEIGHT_DECAY, default 0), the rest
      ``weight_decay`` (SOLVER.WEIGHT_DECAY, default 1e-5);
    * sgd/adam apply COUPLED decay (torch adds ``wd * p`` to the gradient
      before the moment update), adamw DECOUPLED (``p -= lr wd p``);
    * adam/adamw use torch's ``eps = 1e-6`` placement and betas (0.9,
      0.999); adamw defaults to ``amsgrad=True`` (SOLVER.USE_AMSGRAD);
    * sgd is nesterov with dampening 0 (SOLVER.NESTEROV / DAMPENING).
    """
    rest = lambda p: _bn_param_mask(p, bn=False)  # noqa: E731
    bn = lambda p: _bn_param_mask(p, bn=True)  # noqa: E731
    coupled = [optax.add_decayed_weights(weight_decay, mask=rest),
               optax.add_decayed_weights(bn_weight_decay, mask=bn)]
    if name == "adamw":
        return optax.chain(
            scale_by_torch_adam(eps=eps, amsgrad=amsgrad),
            *coupled,  # after the moment update = decoupled, scaled by lr
            optax.scale_by_learning_rate(schedule),
        )
    if name == "adam":
        return optax.chain(
            *coupled,
            scale_by_torch_adam(eps=eps, amsgrad=False),
            optax.scale_by_learning_rate(schedule),
        )
    if name == "sgd":
        return optax.chain(
            *coupled,
            scale_by_torch_sgd(momentum=momentum, dampening=dampening,
                               nesterov=nesterov),
            optax.scale_by_learning_rate(schedule),
        )
    raise ValueError(f"unknown optimizer {name!r}")


# -- train state ------------------------------------------------------------------

class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def normalize_visual(frames: jnp.ndarray) -> jnp.ndarray:
    x = frames.astype(jnp.float32) / 255.0
    return (x - jnp.asarray(DATA_MEAN)) / jnp.asarray(DATA_STD)


def init_pretrain(key, num_frames: int = 8, crop: int = 112,
                  optimizer: Optional[optax.GradientTransformation] = None,
                  dtype=jnp.float32) -> Tuple[Contrast, TrainState, optax.GradientTransformation]:
    """Init runs on the host CPU device (flax init dispatches hundreds of
    small eager ops — each a round trip on a remote/tunneled accelerator;
    the tree transfers in one shot at the first jitted step) and the
    random-init tree is disk-cached like ``build_models``'s
    (``utils.init_cache``; measured ~390 s -> seconds per bench pretrain
    leg on the tunneled v5e)."""
    import contextlib

    import flax

    from ..utils.init_cache import cached_init

    model = Contrast(train=True, dtype=dtype)
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
    init_ctx = (jax.default_device(cpu) if cpu is not None
                else contextlib.nullcontext())
    with init_ctx:
        ckey = jax.device_put(key, cpu) if cpu is not None else key
        visual = jnp.zeros((2, num_frames, crop, crop, 3))
        audio = jnp.zeros((2, 80, 128, 1))
        ident = {
            "name": "contrast_pretrain",
            "num_frames": int(num_frames),
            "crop": int(crop),
            "dtype": str(jnp.dtype(dtype)),
            "key": np.asarray(jax.random.key_data(key)).tolist(),
            "jax": jax.__version__,
            "flax": flax.__version__,
        }
        variables = cached_init(
            "contrast_pretrain", ident,
            lambda: model.init(ckey, visual, audio))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if optimizer is None:
        optimizer = build_optimizer(
            "adamw", lr_schedule("linear", 1e-3, 10000, warmup_steps=2000)
        )
    opt_state = optimizer.init(params)
    state = TrainState(params, batch_stats, opt_state, jnp.zeros((), jnp.int32))
    if cpu is not None and jax.default_backend() != "cpu":
        # move the finished tree to the accelerator ONCE (mirrors
        # build_models): on a cold init cache model.init consumed the
        # CPU-COMMITTED key, so the whole tree comes back committed to the
        # CPU device — and the plain (no-in_shardings) jitted train step
        # then follows the committed inputs and silently runs the full
        # step on the host CPU (round-5 review). The warm-cache path
        # returns uncommitted arrays and never hit this.
        state = jax.device_put(state, jax.devices()[0])
    return model, state, optimizer


def make_pretrain_step(model: Contrast, optimizer, mesh=None):
    """Jitted contrastive train step; batch shardable over the mesh."""

    def loss_fn(params, batch_stats, visual, audio):
        out, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            normalize_visual(visual),
            audio,
            mutable=["batch_stats"],
        )
        zv, za = out
        loss, acc = contrast_loss(zv, za)
        return loss, (updates["batch_stats"], acc)

    def step(state: TrainState, visual, audio):
        (loss, (new_stats, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, visual, audio)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, new_stats, opt_state, state.step + 1)
        return new_state, {"loss": loss, "acc": acc}

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        data = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        return jax.jit(
            step,
            in_shardings=(repl, data, data),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        )
    return jax.jit(step, donate_argnums=(0,))


# -- checkpointing -----------------------------------------------------------------

def save_checkpoint(out_dir, state: TrainState, epoch: int,
                    name: str = "epoch_latest", backend: str = "pickle") -> Path:
    """Preemptible latest-checkpoint save (contrast_net.py:252-270).

    ``backend='orbax'`` writes an async-safe orbax checkpoint directory —
    the TPU-idiomatic multihost format; ``'pickle'`` (default) keeps single
    portable files.
    """
    if backend == "orbax":
        import orbax.checkpoint as ocp

        path = (Path(out_dir) / f"{name}.orbax").resolve()
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": np.asarray(int(state.step)),
            "epoch": np.asarray(epoch),
        }
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path, payload, force=True)
        return path
    payload = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "step": int(state.step),
        "epoch": epoch,
    }
    return dump_pickle(payload, Path(out_dir) / f"{name}.ckpt")


def load_checkpoint(path, optimizer=None) -> Tuple[TrainState, int]:
    path = Path(path)
    if path.suffix == ".orbax" or path.is_dir():
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            dt = ckptr.restore(path.resolve())
    else:
        dt = load_pickle(path)
    state = TrainState(
        params=dt["params"],
        batch_stats=dt["batch_stats"],
        opt_state=dt["opt_state"],
        step=jnp.asarray(dt["step"], jnp.int32),
    )
    return state, int(dt["epoch"])


def load_pretrained_backbone(path) -> Dict:
    """Checkpoint surgery for linear eval: strip projection heads."""
    dt = load_pickle(path)
    return strip_heads({"params": dt["params"], "batch_stats": dt["batch_stats"]})


# -- pretrain loop ------------------------------------------------------------------

def pretrain(
    batches: Iterable[Dict[str, np.ndarray]],
    num_steps: int,
    out_dir=None,
    mesh=None,
    save_period: int = 100,
    base_lr: float = 1e-3,
    warmup_steps: int = 2000,
    num_frames: int = 8,
    crop: int = 112,
    seed: int = 0,
    resume: bool = True,
    log_every: int = 10,
    tb_dir=None,
) -> Tuple[TrainState, list]:
    """The contrast() pretrain loop (contrast_net.py:25-284), step-based.

    Observability follows the reference's meter stack
    (``utils/meters.py:15-221`` ScalarMeter windows + ``logging.py:56-68``
    json stat lines + TensorBoard scalars on demand): windowed
    median/average loss, iter timing, lr — json lines appended to
    ``out_dir/stats.jsonl`` and scalars to ``tb_dir`` when given.
    """
    from ..utils.profiling import IterTimer, Meters, TensorBoardWriter, log_json_stats

    schedule = lr_schedule("linear", base_lr, num_steps, warmup_steps=warmup_steps)
    optimizer = build_optimizer("adamw", schedule)
    model, state, _ = init_pretrain(
        jax.random.PRNGKey(seed), num_frames, crop, optimizer
    )
    start_epoch = 0
    if resume and out_dir is not None:
        latest = Path(out_dir) / "step_latest.ckpt"
        if latest.is_file():
            state, start_epoch = load_checkpoint(latest)
    step_fn = make_pretrain_step(model, optimizer, mesh=mesh)
    history = []
    meters = Meters(window_size=log_every)
    timer = IterTimer(window_size=max(log_every, 2))
    writer = TensorBoardWriter(tb_dir, enabled=tb_dir is not None)
    stats_path = Path(out_dir) / "stats.jsonl" if out_dir is not None else None
    t0 = time.time()
    for i, batch in enumerate(batches):
        if int(state.step) >= num_steps:
            break
        state, metrics = step_fn(
            state, jnp.asarray(batch["visual"]), jnp.asarray(batch["audio"])
        )
        loss = float(metrics["loss"])
        meters.add(loss=loss, acc=float(metrics["acc"]))
        timer.tick()
        if (i + 1) % log_every == 0 and not np.isfinite(loss):
            # NaN check (reference utils/misc.py:9)
            raise FloatingPointError(
                f"loss became non-finite at step {int(state.step)}"
            )
        if (i + 1) % log_every == 0:
            snap = meters.snapshot()
            entry = {
                "step": int(state.step),
                "loss": loss,
                "acc": float(metrics["acc"]),
                "loss_median": meters.medians()["loss"],
                "loss_avg": snap["loss"],
                "lr": float(schedule(int(state.step))),
                "iter_s": timer.mean,
                "time": time.time() - t0,
            }
            history.append(entry)
            log_json_stats({"_type": "train_iter", **entry}, stats_path)
            writer.add_scalars(
                {"train/loss": snap["loss"], "train/acc": snap["acc"],
                 "train/lr": entry["lr"]},
                step=int(state.step),
            )
        if out_dir is not None and (i + 1) % save_period == 0:
            save_checkpoint(out_dir, state, epoch=start_epoch, name="step_latest")
    if out_dir is not None:
        save_checkpoint(out_dir, state, epoch=start_epoch, name="epoch_latest")
        log_json_stats(
            {"_type": "train_done", "step": int(state.step),
             **{f"{k}_global": v for k, v in meters.global_avgs().items()}},
            stats_path,
        )
    writer.close()
    return state, history


# -- linear eval ---------------------------------------------------------------------

def accumulate_ensemble(scores: Dict[int, np.ndarray], logits: np.ndarray,
                        video_indices, method: str = "sum") -> None:
    """Fold one batch of per-clip logits into per-video ensembled scores
    (reference ClassifyTestMeter.update_stats, utils/meters.py:578-614).

    ``max`` maxes actual scores only — the reference maxes against its
    zero-initialized buffer, silently clipping negative logits to 0
    (meters.py:561,603-606); our pipeline ensembles softmax-free logits so
    the sane init is the first view's scores. The dedup of repeated
    (video, clip) views is also not replicated: the loaders enumerate each
    view exactly once.
    """
    for j, vid in enumerate(video_indices):
        vid = int(vid)
        if method == "sum":
            scores[vid] = scores.get(vid, 0.0) + logits[j]
        elif method == "max":
            scores[vid] = (
                np.maximum(scores[vid], logits[j]) if vid in scores
                else np.asarray(logits[j], dtype=np.float64)
            )
        else:
            raise ValueError(f"unsupported ensemble method {method!r}")


def ensemble_topk(scores: Dict[int, np.ndarray],
                  labels_by_video: Dict[int, int],
                  ks: Sequence[int] = (1, 5)) -> Dict[int, float]:
    """Per-video ensembled top-k accuracies in percent (reference
    ClassifyTestMeter.finalize_metrics + metrics.topks_correct)."""
    n = len(scores)
    correct = {k: 0 for k in ks}
    for vid, sc in scores.items():
        order = np.argsort(sc)[::-1]
        label = labels_by_video[vid]
        for k in ks:
            correct[k] += int(label in order[:k])
    return {k: 100.0 * correct[k] / n for k in ks}


def make_feature_fn(backbone_variables: Dict, mode: str = "multimodal"):
    """Frozen-backbone feature extractor (visual / audio / multimodal)."""
    from .models import AudioResNet2D, VisualResNet3D

    visual_net = VisualResNet3D(train=False)
    audio_net = AudioResNet2D(train=False)

    def features(visual, audio):
        outs = []
        if mode in ("visual", "multimodal"):
            v_vars = {
                "params": backbone_variables["params"]["visual_conv"],
                "batch_stats": backbone_variables["batch_stats"]["visual_conv"],
            }
            outs.append(visual_net.apply(v_vars, normalize_visual(visual)))
        if mode in ("audio", "multimodal"):
            a_vars = {
                "params": backbone_variables["params"]["audio_conv"],
                "batch_stats": backbone_variables["batch_stats"]["audio_conv"],
            }
            outs.append(audio_net.apply(a_vars, audio))
        feats = jnp.concatenate(outs, axis=-1)
        return jax.lax.stop_gradient(feats)

    return jax.jit(features)


def linear_eval(
    backbone_variables: Dict,
    train_batches: Iterable[Dict],
    test_batches: Iterable[Dict],
    num_classes: int,
    mode: str = "multimodal",
    num_steps: int = 200,
    base_lr: float = 1e-2,
    seed: int = 0,
    log_every: int = 10,
    cache_features: bool = False,
    stats_path=None,
) -> Dict:
    """Train a linear head on frozen features, test with per-video score
    ensembling. Batches: {visual, audio, label, video_index}.

    ``cache_features``: run the frozen backbone over the train set ONCE and
    train the head for ``num_steps`` on the cached features (the real
    protocol's multi-epoch head training without re-running the backbone
    every step; trades fresh per-epoch augmentation for one fixed draw).
    Returns {top1, top5, history}."""
    from ..utils.profiling import Meters, log_json_stats

    meters = Meters(window_size=log_every)
    feature_fn = make_feature_fn(backbone_variables, mode)
    head = ClassifyHead(num_classes=num_classes, train=True)
    schedule = lr_schedule("cosine", base_lr, num_steps)
    optimizer = build_optimizer("sgd", schedule)

    params = None
    opt_state = None

    @jax.jit
    def head_step(params, opt_state, feats, labels, key):
        def loss_fn(p):
            logits = head.apply(
                {"params": p}, feats, rngs={"dropout": key}
            )
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = (jnp.argmax(logits, -1) == labels).mean() * 100.0
        return params, opt_state, loss, acc

    key = jax.random.PRNGKey(seed)
    history = []
    steps = 0
    if cache_features:
        cached = [
            (feature_fn(jnp.asarray(b["visual"]), jnp.asarray(b["audio"])),
             b["label"])
            for b in train_batches
        ]

        def cycle():
            while cached:
                for feats, labels in cached:
                    yield {"feats": feats, "label": labels}

        train_batches = cycle()
    for batch in train_batches:
        feats = batch["feats"] if "feats" in batch else feature_fn(
            jnp.asarray(batch["visual"]), jnp.asarray(batch["audio"])
        )
        if params is None:
            params = head.init({"params": key, "dropout": key}, feats)["params"]
            opt_state = optimizer.init(params)
        key, sub = jax.random.split(key)
        params, opt_state, loss, acc = head_step(
            params, opt_state, feats, jnp.asarray(batch["label"]), sub
        )
        meters.add(loss=float(loss), acc=float(acc))
        history.append({"loss": float(loss), "acc": float(acc)})
        steps += 1
        if steps % log_every == 0:
            log_json_stats(
                {"_type": "classify_train_iter", "step": steps,
                 **meters.snapshot()},
                stats_path,
            )
        if steps >= num_steps:
            break

    # test: sum ensemble-view scores per video (utils/meters.py:522-689)
    eval_head = ClassifyHead(num_classes=num_classes, train=False)
    score_sums: Dict[int, np.ndarray] = {}
    labels_by_video: Dict[int, int] = {}
    for batch in test_batches:
        feats = feature_fn(jnp.asarray(batch["visual"]), jnp.asarray(batch["audio"]))
        logits = np.asarray(eval_head.apply({"params": params}, feats))
        accumulate_ensemble(score_sums, logits, batch["video_index"])
        for j, vid in enumerate(batch["video_index"]):
            labels_by_video[int(vid)] = int(batch["label"][j])
    if not score_sums:
        return {"top1": 0.0, "top5": 0.0, "history": history, "params": params}
    topk = ensemble_topk(score_sums, labels_by_video, ks=(1, 5))
    result = {
        "top1": topk[1],
        "top5": topk[5],
        "history": history,
        "params": params,
    }
    n = len(score_sums)
    log_json_stats(
        {"_type": "test_epoch", "top1_acc": result["top1"],
         "top5_acc": result["top5"], "num_videos": n},
        stats_path,
    )
    return result
