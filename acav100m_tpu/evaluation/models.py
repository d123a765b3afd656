"""Evaluation-suite models: contrastive pretraining + linear eval heads.

Flax rebuild of the reference's PySlowFast-derived evaluation models:

* ``VisualResNet3D`` — single-pathway 3D ResNet-50, width 64, temporal
  kernels [5,1,1,3,3] (stem + s2..s5), stem stride (2,2,2) — the TEMPORAL
  dim is halved in the stem (``stem_helper.py`` stride ``[[2,2,2]]`` at
  ``video_model_builder.py:123-130``; the head pools ``NUM_FRAMES // 2``
  frames, ``:233-243``) — stem maxpool (1,3,3)/(1,2,2), spatial stage
  strides [1,2,2,2], global avg pool -> 2048
  (``evaluation/code/models/video_model_builder.py:30-265``);
* ``AudioResNet2D`` — 2D ResNet-50 on log-mel (freq 80 x time 128), width
  32: SEPARABLE stem ((9,1) conv + BN + ReLU then (1,9) conv + BN + ReLU,
  stride 1, NO pool — ``audio_stem_helper.py:119-171``), stage strides
  [2,2,2,2] with separable (3,1)+(1,3) "b" convs in s2/s3 and full (3,3)
  in s4/s5 (``audio_model_builder.py:101-193`` ``separable=`` flags,
  ``audio_resnet_helper.py:205-255``) -> 1024
  (``models/audio_model_builder.py:15-221``, config.py:220-241);
* ``FFNLayer`` projection heads (in -> in -> 128, fc1 WITHOUT bias under
  batch_norm, BN+ReLU, fc2 with bias, ``models/utils.py:46-86``) and the
  symmetric InfoNCE ``contrast_loss`` with temperature 0.1
  (``models/contrast.py:80-148``);
* ``ClassifyHead`` — the linear-eval head over frozen backbone features
  (``models/classify.py:13-163``); multimodal = concat features.

TPU-native notes: everything NDHWC/NHWC; under jit with a batch-sharded
input the InfoNCE logits ``z_v @ z_a.T`` are GLOBAL automatically (XLA
inserts the gather — the SPMD equivalent of the reference's
``diff_all_gather`` + rank-offset labels, models/contrast.py:96-110), and
train-mode BatchNorm statistics are global batch stats (SyncBN for free,
models/build.py:35-37).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

PROJECTION_SIZE = 128
TEMPERATURE = 0.1
VISUAL_TEMP_KERNELS = [5, 1, 1, 3, 3]
STAGE_BLOCKS = [3, 4, 6, 3]


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch's exact train-state semantics.

    flax's ``nn.BatchNorm`` updates the running variance with the BIASED
    batch variance; torch updates it with the UNBIASED one (``var * n /
    (n - 1)``, torch ``_BatchNorm``) while still normalizing by the biased
    variance.  Forward outputs are identical either way — this module exists
    so the running ``batch_stats`` after a train step ALSO bit-match a torch
    training run (checkpoint-level parity, pinned in
    tests/test_eval_model_reference_parity.py).  Variable layout matches
    ``nn.BatchNorm`` (params ``scale``/``bias``, batch_stats ``mean``/
    ``var``) so ``convert_contrast_state_dict`` output is interchangeable.
    """

    use_running_average: bool = True
    momentum: float = 0.9          # flax-style decay == 1 - torch momentum
    epsilon: float = 1e-5
    dtype: Any = jnp.float32
    scale_init: Any = nn.initializers.ones

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        dtype = self.dtype or x.dtype
        scale = self.param("scale", self.scale_init, (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32), (feat,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32), (feat,))
        sdtype = jnp.promote_types(dtype, jnp.float32)  # stats >= f32
        if self.use_running_average:
            mean = ra_mean.value.astype(sdtype)
            var = ra_var.value.astype(sdtype)
        else:
            axes = tuple(range(x.ndim - 1))
            n = x.size // feat
            xm = x.astype(sdtype)
            mean = jnp.mean(xm, axis=axes)
            var = jnp.mean(jnp.square(xm - mean), axis=axes)  # biased
            if not self.is_initializing():
                m = self.momentum
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (m * ra_mean.value + (1 - m) * mean).astype(
                    ra_mean.value.dtype)
                ra_var.value = (m * ra_var.value + (1 - m) * unbiased).astype(
                    ra_var.value.dtype)
        y = (x.astype(sdtype) - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale.astype(sdtype) + bias.astype(sdtype)
        return y.astype(dtype)


class Bottleneck3D(nn.Module):
    dim_out: int
    dim_inner: int
    temp_kernel: int
    spatial_stride: int = 1
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        use_ra = not self.train
        dim_in = x.shape[-1]
        s = self.spatial_stride
        shortcut = x
        if dim_in != self.dim_out or s != 1:
            shortcut = nn.Conv(self.dim_out, (1, 1, 1), strides=(1, s, s),
                               use_bias=False, dtype=self.dtype, name="branch1")(x)
            shortcut = TorchBatchNorm(use_running_average=use_ra, momentum=0.9,
                                    epsilon=1e-5, dtype=self.dtype,
                                    name="branch1_bn")(shortcut)
        kt = self.temp_kernel
        h = nn.Conv(self.dim_inner, (kt, 1, 1),
                    padding=((kt // 2, kt // 2), (0, 0), (0, 0)),
                    use_bias=False, dtype=self.dtype, name="a")(x)
        h = nn.relu(TorchBatchNorm(use_running_average=use_ra, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype, name="a_bn")(h))
        h = nn.Conv(self.dim_inner, (1, 3, 3), strides=(1, s, s),
                    padding=((0, 0), (1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="b")(h)
        h = nn.relu(TorchBatchNorm(use_running_average=use_ra, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype, name="b_bn")(h))
        h = nn.Conv(self.dim_out, (1, 1, 1), use_bias=False, dtype=self.dtype,
                    name="c")(h)
        h = TorchBatchNorm(use_running_average=use_ra, momentum=0.9, epsilon=1e-5,
                         scale_init=nn.initializers.zeros, dtype=self.dtype,
                         name="c_bn")(h)
        return nn.relu(shortcut + h)


class VisualResNet3D(nn.Module):
    """(B, T, H, W, 3) normalized frames -> (B, 2048).

    ``remat=True`` rematerializes each bottleneck block on the backward
    pass (jax.checkpoint) — trades ~30% more FLOPs for activations that
    no longer hold every block's intermediates in HBM, the standard TPU
    memory/compute trade for long 3D-conv stacks.
    """

    width: int = 64
    train: bool = False
    dtype: Any = jnp.float32
    output_size: int = 2048
    remat: bool = False

    @nn.compact
    def __call__(self, x):
        use_ra = not self.train
        kt = VISUAL_TEMP_KERNELS[0]
        x = nn.Conv(self.width, (kt, 7, 7), strides=(2, 2, 2),
                    padding=((kt // 2, kt // 2), (3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = nn.relu(TorchBatchNorm(use_running_average=use_ra, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype,
                                 name="stem_bn")(x))
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2),
                        padding=((0, 0), (1, 1), (1, 1)))
        dims_out = [self.width * 4, self.width * 8, self.width * 16, self.width * 32]
        dims_inner = [self.width, self.width * 2, self.width * 4, self.width * 8]
        strides = [1, 2, 2, 2]
        block_cls = nn.remat(Bottleneck3D) if self.remat else Bottleneck3D
        for si in range(4):
            for bi in range(STAGE_BLOCKS[si]):
                x = block_cls(
                    dim_out=dims_out[si], dim_inner=dims_inner[si],
                    temp_kernel=VISUAL_TEMP_KERNELS[si + 1],
                    spatial_stride=strides[si] if bi == 0 else 1,
                    train=self.train, dtype=self.dtype,
                    name=f"s{si + 2}_b{bi}",
                )(x)
        return jnp.mean(x, axis=(1, 2, 3))  # (B, 2048)


class Bottleneck2D(nn.Module):
    """Audio bottleneck (audio_resnet_helper.py:139-291).

    ``separable=True`` (stages s2/s3, audio_model_builder.py:134-157) splits
    the 3x3 "b" conv into (3,1) freq + (1,3) time convs, EACH followed by
    BN + ReLU (audio_resnet_helper.py:205-237, :276-283).
    """

    dim_out: int
    dim_inner: int
    stride: int = 1
    separable: bool = False
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        use_ra = not self.train
        dim_in = x.shape[-1]
        s = self.stride
        shortcut = x
        if dim_in != self.dim_out or s != 1:
            shortcut = nn.Conv(self.dim_out, (1, 1), strides=(s, s),
                               use_bias=False, dtype=self.dtype, name="branch1")(x)
            shortcut = TorchBatchNorm(use_running_average=use_ra, momentum=0.9,
                                    epsilon=1e-5, dtype=self.dtype,
                                    name="branch1_bn")(shortcut)
        h = nn.Conv(self.dim_inner, (1, 1), use_bias=False, dtype=self.dtype,
                    name="a")(x)
        h = nn.relu(TorchBatchNorm(use_running_average=use_ra, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype, name="a_bn")(h))
        if self.separable:
            h = nn.Conv(self.dim_inner, (3, 1), strides=(s, 1),
                        padding=((1, 1), (0, 0)), use_bias=False,
                        dtype=self.dtype, name="b1")(h)
            h = nn.relu(TorchBatchNorm(use_running_average=use_ra, momentum=0.9,
                                     epsilon=1e-5, dtype=self.dtype,
                                     name="b1_bn")(h))
            h = nn.Conv(self.dim_inner, (1, 3), strides=(1, s),
                        padding=((0, 0), (1, 1)), use_bias=False,
                        dtype=self.dtype, name="b2")(h)
            h = nn.relu(TorchBatchNorm(use_running_average=use_ra, momentum=0.9,
                                     epsilon=1e-5, dtype=self.dtype,
                                     name="b2_bn")(h))
        else:
            h = nn.Conv(self.dim_inner, (3, 3), strides=(s, s),
                        padding=((1, 1), (1, 1)), use_bias=False,
                        dtype=self.dtype, name="b")(h)
            h = nn.relu(TorchBatchNorm(use_running_average=use_ra, momentum=0.9,
                                     epsilon=1e-5, dtype=self.dtype,
                                     name="b_bn")(h))
        h = nn.Conv(self.dim_out, (1, 1), use_bias=False, dtype=self.dtype,
                    name="c")(h)
        h = TorchBatchNorm(use_running_average=use_ra, momentum=0.9, epsilon=1e-5,
                         scale_init=nn.initializers.zeros, dtype=self.dtype,
                         name="c_bn")(h)
        return nn.relu(shortcut + h)


class AudioResNet2D(nn.Module):
    """(B, freq=80, time=128, 1) log-mel -> (B, 1024). Width 32
    (config.py:226)."""

    width: int = 32
    train: bool = False
    dtype: Any = jnp.float32

    @property
    def output_size(self) -> int:
        return self.width * 32

    @nn.compact
    def __call__(self, x):
        use_ra = not self.train
        # Separable stem: (9,1) freq conv then (1,9) time conv, BN+ReLU after
        # each, stride (1,1), no pool (audio_stem_helper.py:119-171,
        # audio_model_builder.py:101-108).
        x = nn.Conv(self.width, (9, 1), strides=(1, 1),
                    padding=((4, 4), (0, 0)), use_bias=False,
                    dtype=self.dtype, name="stem_conv1")(x)
        x = nn.relu(TorchBatchNorm(use_running_average=use_ra, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype,
                                 name="stem_bn1")(x))
        x = nn.Conv(self.width, (1, 9), strides=(1, 1),
                    padding=((0, 0), (4, 4)), use_bias=False,
                    dtype=self.dtype, name="stem_conv2")(x)
        x = nn.relu(TorchBatchNorm(use_running_average=use_ra, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype,
                                 name="stem_bn2")(x))
        dims_out = [self.width * 4, self.width * 8, self.width * 16, self.width * 32]
        dims_inner = [self.width, self.width * 2, self.width * 4, self.width * 8]
        strides = [2, 2, 2, 2]  # AUDIO_RESNET.STRIDES (config.py:238)
        for si in range(4):
            for bi in range(STAGE_BLOCKS[si]):
                x = Bottleneck2D(
                    dim_out=dims_out[si], dim_inner=dims_inner[si],
                    stride=strides[si] if bi == 0 else 1,
                    separable=si < 2,  # s2/s3 separable, s4/s5 full
                    train=self.train, dtype=self.dtype,
                    name=f"s{si + 2}_b{bi}",
                )(x)
        return jnp.mean(x, axis=(1, 2))  # (B, 1024)


class FFNLayer(nn.Module):
    """in -> hidden (BN+ReLU) -> out projection (models/utils.py:46-86).

    fc1 carries NO bias (``bias=False if norm in ["layer_norm",
    "batch_norm"]``, utils.py:59-63); fc2 has one.
    """

    hidden: int
    out: int
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.hidden, use_bias=False, dtype=self.dtype,
                     name="fc1")(x)
        h = TorchBatchNorm(use_running_average=not self.train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(h)
        h = nn.relu(h)
        return nn.Dense(self.out, dtype=self.dtype, name="fc2")(h)


class Contrast(nn.Module):
    """Audio-visual contrastive model -> l2-normalized 128-d embeddings."""

    train: bool = False
    dtype: Any = jnp.float32
    projection_size: int = PROJECTION_SIZE
    remat: bool = False

    @nn.compact
    def __call__(self, visual, audio):
        v = VisualResNet3D(train=self.train, dtype=self.dtype,
                           remat=self.remat, name="visual_conv")(visual)
        a = AudioResNet2D(train=self.train, dtype=self.dtype,
                          name="audio_conv")(audio)
        zv = FFNLayer(v.shape[-1], self.projection_size, train=self.train,
                      dtype=self.dtype, name="visual_mlp")(v)
        za = FFNLayer(a.shape[-1], self.projection_size, train=self.train,
                      dtype=self.dtype, name="audio_mlp")(a)
        zv = zv / jnp.maximum(jnp.linalg.norm(zv, axis=-1, keepdims=True), 1e-12)
        za = za / jnp.maximum(jnp.linalg.norm(za, axis=-1, keepdims=True), 1e-12)
        return zv, za


def contrast_loss(zv: jnp.ndarray, za: jnp.ndarray,
                  temperature: float = TEMPERATURE) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric cross-modal InfoNCE over the GLOBAL batch.

    Under pjit/jit with a batch-sharded input this matmul is the global
    logits matrix — no explicit diff_all_gather or rank-offset labels
    needed (reference models/contrast.py:80-148).
    Returns (loss, top1-accuracy %).
    """
    b = zv.shape[0]
    logits_ab = zv @ za.T / temperature  # (B, B)
    logits_ba = za @ zv.T / temperature
    labels = jnp.arange(b)
    logp_ab = jax.nn.log_softmax(logits_ab, axis=-1)
    logp_ba = jax.nn.log_softmax(logits_ba, axis=-1)
    loss_a = -jnp.take_along_axis(logp_ab, labels[:, None], axis=-1).sum()
    loss_b = -jnp.take_along_axis(logp_ba, labels[:, None], axis=-1).sum()
    loss = (loss_a + loss_b) / (2 * b)
    correct = (
        (jnp.argmax(logits_ab, axis=-1) == labels).sum()
        + (jnp.argmax(logits_ba, axis=-1) == labels).sum()
    )
    acc = correct / (2 * b) * 100.0
    return loss, acc


class ClassifyHead(nn.Module):
    """Linear-eval head over frozen backbone features
    (models/classify.py:13-163): dropout + one Dense."""

    num_classes: int
    dropout_rate: float = 0.5
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        h = nn.Dropout(rate=self.dropout_rate, deterministic=not self.train)(feats)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="proj")(h)


def _conv_kernel(sd: Dict, key: str) -> np.ndarray:
    """torch conv weight -> flax kernel. 3D: (O,I,kt,kh,kw) -> (kt,kh,kw,I,O);
    2D: (O,I,kh,kw) -> (kh,kw,I,O)."""
    w = np.asarray(sd[key])
    if w.ndim == 5:
        return w.transpose(2, 3, 4, 1, 0)
    return w.transpose(2, 3, 1, 0)


def _bn_entries(sd: Dict, prefix: str) -> Tuple[Dict, Dict]:
    """torch BatchNorm{1,2,3}d state -> (flax params entry, batch_stats
    entry)."""
    return (
        {"scale": np.asarray(sd[f"{prefix}.weight"]),
         "bias": np.asarray(sd[f"{prefix}.bias"])},
        {"mean": np.asarray(sd[f"{prefix}.running_mean"]),
         "var": np.asarray(sd[f"{prefix}.running_var"])},
    )


def _convert_backbone(sd: Dict, prefix: str, visual: bool) -> Tuple[Dict, Dict]:
    """One reference backbone state dict subtree -> flax (params, stats).

    Torch module paths (video_model_builder.py / audio_model_builder.py):
    ``s1.pathway0_stem.conv`` (visual) or ``s1.stem.conv{1,2}`` (audio
    separable stem, audio_stem_helper.py:52-64), then
    ``s{k}.pathway0_res{i}`` (visual) / ``s{k}.res{i}`` (audio) blocks with
    ``branch1(+_bn)`` projection shortcuts and ``branch2.{a,b|b1,b2,c}(+_bn)``
    transforms.
    """
    params: Dict = {}
    stats: Dict = {}

    def put(mod: str, pentry: Dict, sentry: Optional[Dict] = None):
        params[mod] = pentry
        if sentry is not None:
            stats[mod] = sentry

    if visual:
        put("stem_conv", {"kernel": _conv_kernel(sd, f"{prefix}.s1.pathway0_stem.conv.weight")})
        p, s = _bn_entries(sd, f"{prefix}.s1.pathway0_stem.bn")
        put("stem_bn", p, s)
    else:
        for j in (1, 2):
            put(f"stem_conv{j}", {"kernel": _conv_kernel(
                sd, f"{prefix}.s1.stem.conv{j}.weight")})
            p, s = _bn_entries(sd, f"{prefix}.s1.stem.bn{j}")
            put(f"stem_bn{j}", p, s)

    for si in range(4):
        for bi in range(STAGE_BLOCKS[si]):
            tmod = (f"{prefix}.s{si + 2}.pathway0_res{bi}" if visual
                    else f"{prefix}.s{si + 2}.res{bi}")
            fmod = f"s{si + 2}_b{bi}"
            bp: Dict = {}
            bs: Dict = {}
            if f"{tmod}.branch1.weight" in sd:
                bp["branch1"] = {"kernel": _conv_kernel(sd, f"{tmod}.branch1.weight")}
                bp["branch1_bn"], bs["branch1_bn"] = _bn_entries(sd, f"{tmod}.branch1_bn")
            names = (("a", "b", "c") if (visual or si >= 2)
                     else ("a", "b1", "b2", "c"))
            for n in names:
                bp[n] = {"kernel": _conv_kernel(sd, f"{tmod}.branch2.{n}.weight")}
                bp[f"{n}_bn"], bs[f"{n}_bn"] = _bn_entries(sd, f"{tmod}.branch2.{n}_bn")
            put(fmod, bp, bs)
    return params, stats


def _convert_ffn(sd: Dict, prefix: str) -> Tuple[Dict, Dict]:
    """FFNLayer: fc1 (no bias) -> bn -> fc2 (models/utils.py:46-86)."""
    params = {
        "fc1": {"kernel": np.asarray(sd[f"{prefix}.fc1.weight"]).T},
        "fc2": {"kernel": np.asarray(sd[f"{prefix}.fc2.weight"]).T,
                "bias": np.asarray(sd[f"{prefix}.fc2.bias"])},
    }
    p, s = _bn_entries(sd, f"{prefix}.bn")
    params["bn"] = p
    return params, {"bn": s}


def convert_contrast_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """Reference ``Contrast`` torch state dict (numpy arrays) -> flax
    variables {"params", "batch_stats"} for :class:`Contrast`.

    Verified against the reference's own model code executed on CPU
    (tests/test_eval_model_reference_parity.py): outputs match to f64
    tolerance for the visual/audio backbones, projection heads, and the
    InfoNCE loss (evaluation/code/models/contrast.py:10-201).
    """
    params: Dict = {}
    stats: Dict = {}
    for name, visual in (("visual_conv", True), ("audio_conv", False)):
        p, s = _convert_backbone(sd, name, visual)
        params[name] = p
        stats[name] = s
    for name in ("visual_mlp", "audio_mlp"):
        p, s = _convert_ffn(sd, name)
        params[name] = p
        stats[name] = s
    return {"params": params, "batch_stats": stats}


def convert_classify_head_state_dict(sd: Dict[str, np.ndarray],
                                     prefix: str = "head") -> Dict:
    """Reference ``*ClassifyHead.projection`` Linear -> :class:`ClassifyHead`
    params (models/classify.py:129-163, head projection Linear)."""
    pre = f"{prefix}." if prefix else ""
    return {"params": {"proj": {
        "kernel": np.asarray(sd[f"{pre}projection.weight"]).T,
        "bias": np.asarray(sd[f"{pre}projection.bias"]),
    }}}


def strip_heads(contrast_variables: Dict) -> Dict:
    """Checkpoint surgery for linear eval: keep backbone variables only
    (reference utils/checkpoint.py load_pretrained_checkpoint:25-45)."""
    out: Dict = {}
    for col, tree in contrast_variables.items():
        kept = {k: v for k, v in tree.items()
                if k in ("visual_conv", "audio_conv")}
        out[col] = kept
    return out
