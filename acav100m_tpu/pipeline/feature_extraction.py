"""Stage 4 — feature extraction (SlowFast + VGGish layer features).

TPU rebuild of ``feature_extraction/code/run_extraction.py:23-134`` with
identical file contracts: tar+json shards in, per-shard ``.pkl`` feature
rows out (schema ``utils.io.make_feature_row``), ``_cache.pkl`` resume
files, >= ``shard_ok_ratio`` partial flush, ``log_*.json`` run manifest.

The compute path is ONE jitted function per batch: normalize ->
pathway-pack -> SlowFast taps, and log-mel -> VGGish taps — audio and video
fused in a single XLA program, batch dim shardable over the mesh. Host side
is the streaming tar loader with prefetch.
"""

from __future__ import annotations

import functools
import time
from collections import OrderedDict, defaultdict
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, build_config
from ..data.meta import load_metadata
from ..data.tar_dataset import Prefetcher, make_loader
from ..data.video import get_decoder, prepare_clip
from ..models import get_model
from ..utils.io import (
    load_shard_caches,
    make_feature_row,
    save_shard_cache,
    save_shard_output,
)
from ..utils.manifests import write_run_manifest
from ..utils.shards import plan_shards

DEFAULTS = {
    "models": ["layer_vggish", "layer_slowfast"],
    "model_types": {
        "audio": ["vggish", "layer_vggish"],
        "visual": ["slowfast", "layer_slowfast"],
    },
    "data": {
        "batch_size": 16,
        "media": {"path": None, "num_frames": 32, "size": 256},
        "output": {"path": "output", "shard_ok_ratio": 0.99},
        "decoder": "npz",
    },
    "computation": {
        "random_seed": 0,
        "index": 0,
        "total": 1,
        "discard_shards": False,
        "dtype": "float32",  # 'bfloat16' runs the conv stacks in bf16
        "num_workers": 0,  # decode worker processes (0 = in-process)
        # multi-host lock-step: pad every rank's loader to the global
        # max iteration count (reference get_length semantics)
        "equalize_length": False,
        # blocked-T schedule for the SlowFast fast pathway (5 ints,
        # s1..s5); None/empty = canonical layout. Bit-identical math —
        # see models/slowfast.py _blocked_temporal_kernel.
        "fast_block": None,
        # fused Pallas bottleneck stages for stride-1 kt=1 slow stages
        "pallas_stages": False,
        # 'int8': slow-pathway stages run int8 convs with statically
        # calibrated activation scales (calibrated on the run's first
        # batch). Documented-numerics throughput mode — NOT
        # bit-match-eligible (models/quant.py).
        "quant": "none",
        # device double-buffering depth: stage H2D transfers for the next
        # N batches on a background thread so transfer rides under the
        # current batch's compute (0 disables; each unit holds one extra
        # staged batch in HBM)
        "device_prefetch": 2,
    },
    "acav": {
        "duration": 10,
        "skip_shorter_ratio": 0.25,
        "save_cache_every": 1,
    },
    "weights": {"slowfast_file": None, "vggish_file": None},
    "log_period": 1,
}


def get_config(overrides: Optional[Dict] = None) -> Config:
    return build_config(DEFAULTS, overrides, strict=True)


def _load_weights_file(wfile, model: str):
    """Converted ``.npz`` flax trees load directly; torch/caffe2 checkpoints
    convert on the fly (``python -m acav100m_tpu convert`` pre-converts,
    docs/WEIGHTS.md)."""
    from ..models import zoo

    wfile = Path(wfile)
    if wfile.suffix == ".npz":
        return zoo.load_flax_npz(wfile)
    sd = zoo.load_torch_checkpoint(wfile)
    if model == "slowfast":
        from ..models.slowfast import convert_pyslowfast_state_dict

        if any("branch2a" in k or k == "conv1_w" for k in sd):
            sd = zoo.caffe2_to_pyslowfast(sd)
        return convert_pyslowfast_state_dict(sd)
    from ..models.vggish import convert_torch_state_dict

    return convert_torch_state_dict(sd)


def _cached_init(name: str, cfg, key, init_fn):
    """init_fn() -> tree, memoized on disk (validated, fail-open) — see
    ``utils.init_cache`` (shared with ``evaluation.train.init_pretrain``).
    The ident captures everything that shapes this stage's tree structure
    or values."""
    import flax

    from ..utils.init_cache import cached_init

    ident = {
        "name": name,
        "fast_block": list(cfg.computation.fast_block or ()),
        "pallas": bool(cfg.computation.pallas_stages),
        "quant": str(cfg.computation.quant or "none"),
        "num_frames": int(cfg.data.media.num_frames or 32),
        "key": np.asarray(jax.random.key_data(key)).tolist(),
        "jax": jax.__version__,
        "flax": flax.__version__,
    }
    return cached_init(name, ident, init_fn)


def build_models(cfg, key: Optional[jax.Array] = None):
    """Instantiate models + params (converted checkpoints when provided).

    Param init runs on the host CPU device: flax init dispatches hundreds of
    small ops, which on a remote/tunneled accelerator costs a round trip
    each; the finished tree transfers to the accelerator in one shot at the
    first jitted call. Random-init trees are additionally disk-cached
    (``_cached_init``) so repeat builds cost seconds.
    """
    dtype = jnp.dtype(cfg.computation.dtype or "float32")
    models = OrderedDict()
    params = {}
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
    import contextlib

    init_ctx = jax.default_device(cpu) if cpu is not None else contextlib.nullcontext()
    with init_ctx:
        # The key must be CPU-COMMITTED, not merely used under
        # default_device: a key computed on the accelerator is committed
        # there, and jax then runs every init op that consumes it on the
        # accelerator too — through the tunneled runtime that is one
        # round trip per eager op (measured 340-700 s for the full init
        # vs 60-85 s local). Create fresh keys here; re-commit passed-in
        # ones with a single transfer.
        if key is None:
            key = jax.random.PRNGKey(cfg.computation.random_seed or 0)
        elif cpu is not None and list(key.devices()) != [cpu]:
            key = jax.device_put(jax.device_get(key), cpu)
        kv, ka = jax.random.split(key)
        for name in cfg.models:
            cls = get_model(name)
            if getattr(cls, "media_type", None) == "video" and (
                cfg.computation.fast_block or cfg.computation.pallas_stages
                or (cfg.computation.quant or "none") != "none"
            ):
                def make(dt):
                    return cls(
                        dtype=dt,
                        fast_block=tuple(cfg.computation.fast_block or ())
                        or None,
                        pallas_stages=bool(cfg.computation.pallas_stages),
                        quant=str(cfg.computation.quant or "none"),
                    )
            else:
                make = cls
            model = make(dtype)
            models[name] = model
            # Init through a float32 twin: params live in flax param_dtype
            # (float32) regardless of compute dtype, so the tree is
            # BIT-IDENTICAL (asserted in tests/test_models.py), while
            # eager bf16 init on XLA:CPU is ~7x slower than fp32 (measured
            # 440-713 s vs 60-85 s for the full SlowFast+VGGish build).
            init_model = model if dtype == jnp.float32 else make(jnp.float32)
            if model.media_type == "video":
                wfile = cfg.weights.slowfast_file
                if wfile and Path(wfile).is_file():
                    p = _load_weights_file(wfile, "slowfast")
                else:
                    # init at a small spatial size: conv/BN param shapes
                    # are independent of H,W and the init forward pass is
                    # real work
                    p = _cached_init(
                        name, cfg, kv,
                        lambda: init_model.init(
                            kv, num_frames=cfg.data.media.num_frames,
                            size=32))
            else:
                wfile = cfg.weights.vggish_file
                if wfile and Path(wfile).is_file():
                    p = _load_weights_file(wfile, "vggish")
                else:
                    p = _cached_init(name, cfg, ka,
                                     lambda: init_model.init(ka))
            params[name] = p
    if cpu is not None and jax.default_backend() != "cpu":
        # move the finished tree to the accelerator ONCE — leaving params on
        # the CPU device would re-transfer them on every jitted call
        params = jax.device_put(params, jax.devices()[0])
    return models, params


def make_extract_fn(models: Dict, mesh=None):
    """One jitted program computing every model's layer taps for a batch."""

    def extract(params, frames, audio, valid_samples):
        out = {}
        for name, model in models.items():
            if model.media_type == "video":
                out[name] = model.apply(params[name], frames)
            else:
                out[name] = model.apply(params[name], audio, valid_samples)
        return out

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        data = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        return jax.jit(
            extract, in_shardings=(repl, data, data, data), out_shardings=repl
        )
    return jax.jit(extract)


def run_extraction(cfg, decoder=None, mesh=None, models=None, params=None):
    """Extract features for this process's shards. Returns saved paths."""
    out_dir = Path(cfg.data.output.path)
    out_dir.mkdir(parents=True, exist_ok=True)

    mine, all_shards = plan_shards(
        cfg.data.media.path,
        index=cfg.computation.index or 0,
        total=cfg.computation.total or 1,
        suffix=".tar",
        discard_remainder=bool(cfg.computation.discard_shards),
    )
    metas, shard_sizes_meta = load_metadata(mine)
    mine = [p for p in mine if Path(p).stem in metas]
    caches, skip_lists = load_shard_caches(out_dir, mine)
    # shards whose output pkl already exists are skipped entirely
    mine = [p for p in mine if not (out_dir / f"{Path(p).stem}.pkl").is_file()]

    if models is None or params is None:
        models, params = build_models(cfg)
    model_names = list(models)
    audio_keys = list(cfg.model_types.audio or [])
    extract_fn = make_extract_fn(models, mesh)

    if decoder is None:
        name = cfg.data.decoder or "npz"
        kwargs = {}
        if name != "npz":
            kwargs["size"] = cfg.data.media.size or 256
            kwargs["sample_rate"] = 16000
        if name in ("native", "auto"):
            # decode-side uniform sampling: bit-identical to decoding all
            # frames then temporal_sampling, but unsampled frames skip
            # sws_scale + storage (native/avio.cc)
            kwargs["sample_frames"] = cfg.data.media.num_frames or 32
        decoder = get_decoder(name, **kwargs)
    duration = cfg.acav.duration or 10
    skip_secs = duration * (cfg.acav.skip_shorter_ratio or 0.25)

    # functools.partial of a module-level fn stays picklable for the
    # spawned decode workers (a closure would not be)
    prepare = functools.partial(
        prepare_clip,
        num_frames=cfg.data.media.num_frames or 32,
        duration=duration,
        skip_shorter_seconds=skip_secs,
    )

    # multi-host lock-step: under a global mesh every host must invoke the
    # jitted step the same number of times (reference ResizedDataset +
    # get_length, mps/distributed.py:444-461). The global iteration count
    # is computed from ALL shards' metadata — deterministic and identical
    # on every rank — and short ranks pad with masked no-op batches.
    batch_size = cfg.data.batch_size or 16
    total = cfg.computation.total or 1
    pad_to_batches = None
    pad_template = None
    if cfg.computation.equalize_length and total > 1:
        from ..data.tar_dataset import empty_batch
        from ..utils.shards import get_length

        metas_all, _ = load_metadata(all_shards)
        sizes_all = [len(metas_all[Path(p).stem]) for p in all_shards
                     if Path(p).stem in metas_all]
        pad_to_batches = get_length(
            sizes_all, batch_size, cfg.computation.num_workers or 0, total
        ) // batch_size
        pad_template = empty_batch(
            batch_size, num_frames=cfg.data.media.num_frames or 32,
            size=cfg.data.media.size or 256,
        )

    loader = make_loader(
        mine, metas, batch_size,
        skip_lists=skip_lists, decoder=decoder, prepare=prepare,
        num_workers=cfg.computation.num_workers or 0,
        pad_to_batches=pad_to_batches, pad_template=pad_template,
    )

    # per-shard accumulation: rows[shard][stem] = feature row
    rows: Dict[str, "OrderedDict[str, Dict]"] = defaultdict(OrderedDict)
    shard_sizes: Dict[str, int] = {}
    saved_paths: List[Path] = []

    # resume from caches
    for shard_name, cache in caches.items():
        for row in cache:
            rows[shard_name][Path(row["filename"]).stem] = row
            shard_sizes[shard_name] = row["shard_size"]

    def save_shard(shard_name, final=True):
        path = save_shard_output(
            list(rows[shard_name].values()), out_dir, shard_name, final=final
        )
        saved_paths.append(path)
        del rows[shard_name]
        shard_sizes.pop(shard_name, None)

    save_cache_every = cfg.acav.save_cache_every or 1
    quant_on = (cfg.computation.quant or "none") != "none"

    # H2D double buffering: jnp.asarray issues an async transfer, so
    # staging batch N+1's arrays on a background thread overlaps its
    # host->device copy with batch N's extract (the bench's measured
    # e2e_projected assumption, now the driver's actual behavior)
    depth = cfg.computation.device_prefetch
    if depth is None:
        depth = 2

    def _staged(it):
        for b in it:
            # shallow-copy before staging: the loader may hold (and later
            # iterate) the original dict — pad_to_length keeps the final
            # real batch as its padding template and re-yields one pad
            # object — so the consumer's pop("_dev") must never mutate a
            # dict the producer side still owns
            b = dict(b)
            b["_dev"] = (
                jnp.asarray(b["frames"]),
                jnp.asarray(b["audio"]),
                jnp.asarray(b["valid_samples"]),
            )
            yield b

    batches = Prefetcher(_staged(loader), depth=depth) if depth > 0 else (
        _staged(loader)
    )
    t0 = time.time()
    for n_iter, batch in enumerate(batches):
        frames_dev, audio_dev, valid_dev = batch.pop("_dev")
        if quant_on and n_iter == 0:
            # int8 mode: freeze activation scales on the run's first real
            # batch (one fp observation pass; see models/quant.py)
            for name, model in models.items():
                if (getattr(model, "media_type", None) == "video"
                        and hasattr(model, "calibrate")):
                    params[name] = jax.jit(model.calibrate)(
                        params[name], frames_dev
                    )
        taps = extract_fn(params, frames_dev, audio_dev, valid_dev)
        taps = {
            name: [np.asarray(t, dtype=np.float32) for t in tap_list]
            for name, tap_list in taps.items()
        }
        for i in range(len(batch["filename"])):
            if not batch["batch_mask"][i]:
                continue
            fname = batch["filename"][i]
            shard_name = batch["shard_name"][i]
            stem = Path(fname).stem
            if stem in rows[shard_name]:
                continue
            per_model = []
            for name in model_names:
                per_model.append(
                    {
                        "model_key": name,
                        "extractor_name": models[name].model_tag["name"],
                        "dataset": models[name].model_tag["dataset"],
                        "array": [layer[i] for layer in taps[name]],
                    }
                )
            rows[shard_name][stem] = make_feature_row(
                fname, shard_name, int(batch["shard_size"][i]), per_model,
                audio_keys,
            )
            shard_sizes[shard_name] = int(batch["shard_size"][i])
        # cache + complete-shard flush
        for shard_name in list(rows):
            if (n_iter + 1) % save_cache_every == 0:
                save_shard_cache(list(rows[shard_name].values()), out_dir, shard_name)
            if (
                shard_name in shard_sizes
                and len(rows[shard_name]) >= shard_sizes[shard_name]
            ):
                save_shard(shard_name)
        if cfg.log_period and (n_iter + 1) % cfg.log_period == 0:
            print(
                f"[extract idx={cfg.computation.index}] iter {n_iter + 1} "
                f"({time.time() - t0:.1f}s)"
            )

    # final pass: flush shards >= shard_ok_ratio complete
    ratio = cfg.data.output.shard_ok_ratio or 0.99
    for shard_name in list(rows):
        if shard_name in shard_sizes and len(rows[shard_name]) >= round(
            shard_sizes[shard_name] * ratio
        ):
            save_shard(shard_name)

    write_run_manifest(out_dir, saved_paths)
    return saved_paths
