"""VGGish audio feature extractor in flax.

Same architecture as the torch.hub ``harritaylor/torchvggish`` model the
reference wraps (``feature_extraction/code/models/vggish.py:40-141``):

    features:  conv64-pool / conv128-pool / conv256-conv256-pool /
               conv512-conv512-pool          (3x3 convs, ReLU, 2x2 maxpool)
    embeddings: 12288 -> 4096 -> 4096 -> 128 (ReLU after each)

``LayerVggish`` taps each pool block (spatial-mean -> [64,128,256,512]) plus
the final 128-d embedding — layer dims [64, 128, 256, 512, 128]
(reference vggish.py:76-141), then means over the 0.96 s examples.

TPU-first: NHWC layout, bf16-friendly conv stack, the whole thing jits
together with the GEMM log-mel frontend (``ops.melspec.vggish_examples``)
into one fused device program; masked example means replace the reference's
ragged batches.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from . import register_model
from ..ops import melspec

LAYER_DIMS = [64, 128, 256, 512, 128]
EMBED_DIM = 128

# (out_channels, num_convs) per pool block
_BLOCKS = [(64, 1), (128, 1), (256, 2), (512, 2)]


class VGGishBackbone(nn.Module):
    """features + embeddings; returns per-block spatial means and embedding."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        # x: (N, 96, 64, 1) log-mel examples, NHWC
        taps: List[jnp.ndarray] = []
        for bi, (ch, n_convs) in enumerate(_BLOCKS):
            for ci in range(n_convs):
                x = nn.Conv(
                    ch,
                    (3, 3),
                    padding="SAME",
                    dtype=self.dtype,
                    name=f"block{bi}_conv{ci}",
                )(x)
                x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            taps.append(jnp.mean(x, axis=(1, 2)))  # (N, ch)
        # embeddings operate on the (H, W, C) flattening — identical order
        # to the reference's permute-then-flatten (vggish.py:119-124)
        flat = x.reshape(x.shape[0], -1)  # (N, 6*4*512)
        h = nn.relu(nn.Dense(4096, dtype=self.dtype, name="fc0")(flat))
        h = nn.relu(nn.Dense(4096, dtype=self.dtype, name="fc1")(h))
        h = nn.relu(nn.Dense(EMBED_DIM, dtype=self.dtype, name="fc2")(h))
        taps.append(h)
        return taps


@register_model("layer_vggish")
class LayerVggish:
    """Layer-tapped VGGish over batches of clips.

    Input: 16 kHz mono waveforms (B, S) (+ optional valid-sample counts for
    zero-padded short clips). Output: list of 5 arrays (B, dim) —
    dims [64, 128, 256, 512, 128].
    """

    output_dims = LAYER_DIMS
    model_tag = {"name": "VGGish", "dataset": "YouTube-8M"}
    media_type = "audio"

    def __init__(self, dtype=jnp.float32):
        self.backbone = VGGishBackbone(dtype=dtype)

    def init(self, key, sample_len: int = 160000):
        examples = jnp.zeros(
            (1 * melspec.vggish_num_examples(sample_len), 96, 64, 1)
        )
        return self.backbone.init(key, examples)

    def apply(
        self,
        params,
        audio: jnp.ndarray,  # (B, S) 16 kHz mono
        valid_samples: Optional[jnp.ndarray] = None,  # (B,) ints
    ) -> List[jnp.ndarray]:
        b, s = audio.shape
        examples = melspec.vggish_examples(audio)  # (B, N, 96, 64)
        n = examples.shape[1]
        flat = examples.reshape(b * n, 96, 64, 1)
        taps = self.backbone.apply(params, flat)
        if valid_samples is None:
            mask = jnp.ones((b, n, 1), dtype=flat.dtype)
        else:
            mask = melspec.example_valid_mask(valid_samples, s)[..., None]
        denom = jnp.maximum(mask.sum(axis=1), 1.0)  # (B, 1)
        out = []
        for tap in taps:
            tap = tap.reshape(b, n, -1)
            out.append((tap * mask).sum(axis=1) / denom)  # masked example mean
        return out

    def __call__(self, params, audio, valid_samples=None):
        return self.apply(params, audio, valid_samples)


@register_model("vggish")
class Vggish(LayerVggish):
    """Embedding-only variant (reference vggish.py:40-73): 128-d output."""

    output_dims = EMBED_DIM

    def apply(self, params, audio, valid_samples=None):
        return super().apply(params, audio, valid_samples)[-1]


# -- torch.hub checkpoint conversion ------------------------------------------

_TORCH_CONV_KEYS = [
    ("features.0", "block0_conv0"),
    ("features.3", "block1_conv0"),
    ("features.6", "block2_conv0"),
    ("features.8", "block2_conv1"),
    ("features.11", "block3_conv0"),
    ("features.13", "block3_conv1"),
]
_TORCH_FC_KEYS = [
    ("embeddings.0", "fc0"),
    ("embeddings.2", "fc1"),
    ("embeddings.4", "fc2"),
]


def convert_torch_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """torch.hub VGGish state dict (numpy arrays) -> flax params.

    Conv: OIHW -> HWIO. Dense: (out,in) -> (in,out); the first fc's input
    ordering already matches because both flatten (H, W, C).
    """
    params = {}
    for tk, fk in _TORCH_CONV_KEYS:
        w = np.asarray(sd[f"{tk}.weight"])  # (O, I, H, W)
        params[fk] = {
            "kernel": w.transpose(2, 3, 1, 0),
            "bias": np.asarray(sd[f"{tk}.bias"]),
        }
    for tk, fk in _TORCH_FC_KEYS:
        w = np.asarray(sd[f"{tk}.weight"])  # (out, in)
        params[fk] = {"kernel": w.T, "bias": np.asarray(sd[f"{tk}.bias"])}
    return {"params": params}
