"""Evaluation-suite models: contrastive pretraining + linear eval heads.

Flax rebuild of the reference's PySlowFast-derived evaluation models:

* ``VisualResNet3D`` — single-pathway 3D ResNet-50, width 64, temporal
  kernels [5,1,1,3,3] (stem + s2..s5), spatial strides [1,2,2,2], global
  avg pool -> 2048 (``evaluation/code/models/video_model_builder.py:30-265``);
* ``AudioResNet2D`` — 2D ResNet-50 on log-mel (freq 80 x time 128), width
  32, strides [2,2,2,2] -> 1024
  (``models/audio_model_builder.py:15-221``, config.py:220-241);
* ``FFNLayer`` projection heads (in -> in -> 128, BN+ReLU,
  ``models/utils.py:46-86``) and the symmetric InfoNCE ``contrast_loss``
  with temperature 0.1 (``models/contrast.py:80-148``);
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
            shortcut = nn.BatchNorm(use_running_average=use_ra, momentum=0.9,
                                    epsilon=1e-5, dtype=self.dtype,
                                    name="branch1_bn")(shortcut)
        kt = self.temp_kernel
        h = nn.Conv(self.dim_inner, (kt, 1, 1),
                    padding=((kt // 2, kt // 2), (0, 0), (0, 0)),
                    use_bias=False, dtype=self.dtype, name="a")(x)
        h = nn.relu(nn.BatchNorm(use_running_average=use_ra, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype, name="a_bn")(h))
        h = nn.Conv(self.dim_inner, (1, 3, 3), strides=(1, s, s),
                    padding=((0, 0), (1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="b")(h)
        h = nn.relu(nn.BatchNorm(use_running_average=use_ra, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype, name="b_bn")(h))
        h = nn.Conv(self.dim_out, (1, 1, 1), use_bias=False, dtype=self.dtype,
                    name="c")(h)
        h = nn.BatchNorm(use_running_average=use_ra, momentum=0.9, epsilon=1e-5,
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
        x = nn.Conv(self.width, (kt, 7, 7), strides=(1, 2, 2),
                    padding=((kt // 2, kt // 2), (3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=use_ra, momentum=0.9,
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
    dim_out: int
    dim_inner: int
    stride: int = 1
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
            shortcut = nn.BatchNorm(use_running_average=use_ra, momentum=0.9,
                                    epsilon=1e-5, dtype=self.dtype,
                                    name="branch1_bn")(shortcut)
        h = nn.Conv(self.dim_inner, (1, 1), use_bias=False, dtype=self.dtype,
                    name="a")(x)
        h = nn.relu(nn.BatchNorm(use_running_average=use_ra, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype, name="a_bn")(h))
        h = nn.Conv(self.dim_inner, (3, 3), strides=(s, s), padding="SAME",
                    use_bias=False, dtype=self.dtype, name="b")(h)
        h = nn.relu(nn.BatchNorm(use_running_average=use_ra, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype, name="b_bn")(h))
        h = nn.Conv(self.dim_out, (1, 1), use_bias=False, dtype=self.dtype,
                    name="c")(h)
        h = nn.BatchNorm(use_running_average=use_ra, momentum=0.9, epsilon=1e-5,
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
        x = nn.Conv(self.width, (9, 9), strides=(1, 1), padding="SAME",
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=use_ra, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype,
                                 name="stem_bn")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        dims_out = [self.width * 4, self.width * 8, self.width * 16, self.width * 32]
        dims_inner = [self.width, self.width * 2, self.width * 4, self.width * 8]
        strides = [2, 2, 2, 2]  # AUDIO_RESNET.STRIDES (config.py:238)
        for si in range(4):
            for bi in range(STAGE_BLOCKS[si]):
                x = Bottleneck2D(
                    dim_out=dims_out[si], dim_inner=dims_inner[si],
                    stride=strides[si] if bi == 0 else 1,
                    train=self.train, dtype=self.dtype,
                    name=f"s{si + 2}_b{bi}",
                )(x)
        return jnp.mean(x, axis=(1, 2))  # (B, 1024)


class FFNLayer(nn.Module):
    """in -> hidden (BN+ReLU) -> out projection (models/utils.py:46-86)."""

    hidden: int
    out: int
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        h = nn.BatchNorm(use_running_average=not self.train, momentum=0.9,
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


def strip_heads(contrast_variables: Dict) -> Dict:
    """Checkpoint surgery for linear eval: keep backbone variables only
    (reference utils/checkpoint.py load_pretrained_checkpoint:25-45)."""
    out: Dict = {}
    for col, tree in contrast_variables.items():
        kept = {k: v for k, v in tree.items()
                if k in ("visual_conv", "audio_conv")}
        out[col] = kept
    return out
