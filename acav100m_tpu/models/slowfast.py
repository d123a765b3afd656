"""SlowFast 8x8 R50 video feature extractor in flax.

Re-implementation of the two-pathway SlowFast network the reference loads
from facebookresearch/SlowFast (``feature_extraction/code/models/slowfast.py:31-157``,
config ``Kinetics/c2/SLOWFAST_8x8_R50``):

* slow pathway: T=8 (every 4th of 32 frames), channels 64/256/512/1024/2048,
  temporal kernels [1,1,1,3,3] (stem + 4 stages);
* fast pathway: T=32, channels 8/32/64/128/256 (beta=1/8), temporal kernels
  [5,3,3,3,3];
* FuseFastToSlow after s1..s4: 7x1x1 conv, stride (4,1,1), channel ratio 2;
* bottleneck blocks [3,4,6,3]; spatial strides [1,2,2,2]; the temporal
  kernel sits on the first 1x1x1 conv; BN zero-init on the final block BN.

``LayerSlowFast`` taps s1_fuse / s2_fuse(+pool) / s3_fuse / s4_fuse / s5 and
global-mean-pools each over (T,H,W), concatenating pathways — layer dims
[88, 352, 704, 1408, 2304] (reference slowfast.py:98-157).

TPU-first: NDHWC layout (channels-last 3D convs lower directly onto the
MXU), inference BN folded to scale/bias at apply time, bf16-ready, one jit
for normalize -> pathway-pack -> backbone.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from . import register_model

LAYER_DIMS = [88, 352, 704, 1408, 2304]

ALPHA = 4  # slow/fast frame-rate ratio
BETA_INV = 8  # fast channel reduction
FUSION_CONV_RATIO = 2
FUSION_KERNEL = 7
STAGE_BLOCKS = [3, 4, 6, 3]
SLOW_TEMP_KERNELS = [1, 1, 1, 3, 3]  # stem, s2..s5
FAST_TEMP_KERNELS = [5, 3, 3, 3, 3]
SPATIAL_STRIDES = [1, 2, 2, 2]
DATA_MEAN = (0.45, 0.45, 0.45)
DATA_STD = (0.225, 0.225, 0.225)


class BN(nn.Module):
    """Inference-mode batch norm (running stats from checkpoint)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(
            use_running_average=True, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype,
        )(x)


class Bottleneck(nn.Module):
    dim_out: int
    dim_inner: int
    temp_kernel: int
    spatial_stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim_in = x.shape[-1]
        s = self.spatial_stride
        need_proj = (dim_in != self.dim_out) or (s != 1)
        shortcut = x
        if need_proj:
            shortcut = nn.Conv(
                self.dim_out, (1, 1, 1), strides=(1, s, s), use_bias=False,
                dtype=self.dtype, name="branch1",
            )(x)
            shortcut = BN(self.dtype, name="branch1_bn")(shortcut)
        # a: temporal kernel on the 1x1 conv (STRIDE_1X1=False puts the
        # spatial stride on the 3x3)
        kt = self.temp_kernel
        h = nn.Conv(
            self.dim_inner, (kt, 1, 1), padding=((kt // 2, kt // 2), (0, 0), (0, 0)),
            use_bias=False, dtype=self.dtype, name="branch2_a",
        )(x)
        h = nn.relu(BN(self.dtype, name="branch2_a_bn")(h))
        h = nn.Conv(
            self.dim_inner, (1, 3, 3), strides=(1, s, s),
            padding=((0, 0), (1, 1), (1, 1)),
            use_bias=False, dtype=self.dtype, name="branch2_b",
        )(h)
        h = nn.relu(BN(self.dtype, name="branch2_b_bn")(h))
        h = nn.Conv(
            self.dim_out, (1, 1, 1), use_bias=False, dtype=self.dtype,
            name="branch2_c",
        )(h)
        # zero-init gamma on the final BN (ZERO_INIT_FINAL_BN)
        h = nn.BatchNorm(
            use_running_average=True, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, scale_init=nn.initializers.zeros,
            name="branch2_c_bn",
        )(h)
        return nn.relu(shortcut + h)


class Stage(nn.Module):
    num_blocks: int
    dim_out: int
    dim_inner: int
    temp_kernel: int
    spatial_stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_blocks):
            x = Bottleneck(
                dim_out=self.dim_out,
                dim_inner=self.dim_inner,
                temp_kernel=self.temp_kernel,
                spatial_stride=self.spatial_stride if i == 0 else 1,
                dtype=self.dtype,
                name=f"block{i}",
            )(x)
        return x


class _StemKernel(nn.Module):
    """Bare (kt,7,7,Cin,Cout) kernel parameter named like nn.Conv's, so the
    s2d path shares checkpoint layout with the plain path."""

    kt: int
    cin: int
    cout: int

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kt, 7, 7, self.cin, self.cout),
        )


class Stem(nn.Module):
    """Stem conv (kt,7,7) stride (1,2,2) + BN/ReLU + spatial max pool.

    ``s2d=True`` evaluates the IDENTICAL convolution via a 2x2
    space-to-depth rewrite: the 3-channel 7x7/stride-2 conv (3/128 MXU lane
    utilization — about half of total model time) becomes a 12-channel
    4x4/stride-1 conv on half-resolution blocks. Parameters keep the
    canonical (kt,7,7,Cin,Cout) layout under ``conv/kernel`` — the kernel is
    rearranged at apply time, so checkpoints and converters are unaffected.
    Requires even H, W.

    Derivation (per spatial dim, pad 3, stride 2): output i reads input
    rows 2i-3..2i+3, which live in 2-row blocks i-2..i+1 at in-block offset
    a, with w_s2d[m, a] = w[2m + a - 1] (zero outside 0..6) — i.e. kernel 4,
    stride 1, padding (2, 1) in block space.
    """

    dim_out: int
    temp_kernel: int
    dtype: Any = jnp.float32
    s2d: bool = False

    @nn.compact
    def __call__(self, x):
        kt = self.temp_kernel
        use_s2d = self.s2d and x.shape[-3] % 2 == 0 and x.shape[-2] % 2 == 0
        if use_s2d:
            b, t, h, w, c = x.shape
            kernel = _StemKernel(kt, c, self.dim_out, name="conv")()
            # input blocks: (B,T,H/2,W/2, 2*2*C), block-major (a,b,c) packing
            xb = x.reshape(b, t, h // 2, 2, w // 2, 2, c)
            xb = xb.transpose(0, 1, 2, 4, 3, 5, 6).reshape(
                b, t, h // 2, w // 2, 4 * c
            )
            # kernel rearrange: w2[kt, m, n, (a,b,cin)] = w[kt, 2m+a-1, 2n+b-1]
            # (pad the 7-tap dims to 8 so padded index = 2m+a)
            kpad = jnp.pad(kernel, ((0, 0), (1, 0), (1, 0), (0, 0), (0, 0)))
            w2 = kpad.reshape(kt, 4, 2, 4, 2, c, self.dim_out)
            w2 = w2.transpose(0, 1, 3, 2, 4, 5, 6).reshape(
                kt, 4, 4, 4 * c, self.dim_out
            )
            x = jax.lax.conv_general_dilated(
                xb.astype(self.dtype),
                w2.astype(self.dtype),
                window_strides=(1, 1, 1),
                padding=((kt // 2, kt // 2), (2, 1), (2, 1)),
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
        else:
            x = nn.Conv(
                self.dim_out, (kt, 7, 7), strides=(1, 2, 2),
                padding=((kt // 2, kt // 2), (3, 3), (3, 3)),
                use_bias=False, dtype=self.dtype, name="conv",
            )(x)
        x = nn.relu(BN(self.dtype, name="bn")(x))
        # spatial max pool 1x3x3 stride 1x2x2
        return nn.max_pool(
            x, (1, 3, 3), strides=(1, 2, 2), padding=((0, 0), (1, 1), (1, 1))
        )


class FuseFastToSlow(nn.Module):
    fast_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, slow, fast):
        k = FUSION_KERNEL
        f2s = nn.Conv(
            self.fast_channels * FUSION_CONV_RATIO, (k, 1, 1),
            strides=(ALPHA, 1, 1),
            padding=((k // 2, k // 2), (0, 0), (0, 0)),
            use_bias=False, dtype=self.dtype, name="conv_f2s",
        )(fast)
        f2s = nn.relu(BN(self.dtype, name="bn")(f2s))
        return jnp.concatenate([slow, f2s], axis=-1), fast


def _pool_all(slow, fast):
    """Global mean over (T,H,W), concat pathways — equivalent to the
    reference head avgpool + mean([1,2,3]) (slowfast.py:135-146)."""
    return jnp.concatenate(
        [jnp.mean(slow, axis=(1, 2, 3)), jnp.mean(fast, axis=(1, 2, 3))],
        axis=-1,
    )


class SlowFastBackbone(nn.Module):
    """Returns the 5 layer taps; input (slow (B,8,H,W,3), fast (B,32,H,W,3))."""

    dtype: Any = jnp.float32
    s2d: bool = True  # space-to-depth stems (bit-identical, ~MXU-friendly)

    @nn.compact
    def __call__(self, slow, fast) -> List[jnp.ndarray]:
        taps: List[jnp.ndarray] = []
        w = 64  # width per group
        slow = Stem(w, SLOW_TEMP_KERNELS[0], self.dtype, s2d=self.s2d,
                    name="s1_slow")(slow)
        fast = Stem(w // BETA_INV, FAST_TEMP_KERNELS[0], self.dtype,
                    s2d=self.s2d, name="s1_fast")(fast)
        slow, fast = FuseFastToSlow(w // BETA_INV, self.dtype, name="s1_fuse")(slow, fast)
        taps.append(_pool_all(slow, fast))  # 88

        dims_out = [w * 4, w * 8, w * 16, w * 32]  # 256 512 1024 2048
        dims_inner = [w, w * 2, w * 4, w * 8]
        for si in range(4):
            slow = Stage(
                STAGE_BLOCKS[si], dims_out[si], dims_inner[si],
                SLOW_TEMP_KERNELS[si + 1], SPATIAL_STRIDES[si],
                self.dtype, name=f"s{si + 2}_slow",
            )(slow)
            fast = Stage(
                STAGE_BLOCKS[si], dims_out[si] // BETA_INV,
                dims_inner[si] // BETA_INV,
                FAST_TEMP_KERNELS[si + 1], SPATIAL_STRIDES[si],
                self.dtype, name=f"s{si + 2}_fast",
            )(fast)
            if si < 3:
                slow, fast = FuseFastToSlow(
                    dims_out[si] // BETA_INV, self.dtype, name=f"s{si + 2}_fuse"
                )(slow, fast)
            # pathway pool after s2 is kernel (1,1,1) for this config — a
            # no-op kept only in the reference's module list
            taps.append(_pool_all(slow, fast))  # 352 704 1408 2304
        return taps


def normalize_frames(frames: jnp.ndarray) -> jnp.ndarray:
    """uint8 (B,T,H,W,C) -> normalized float (tensor_normalize:
    x/255 - mean)/std (reference utils_slowfast/process_data.py:8-9)."""
    x = frames.astype(jnp.float32) / 255.0
    mean = jnp.asarray(DATA_MEAN, dtype=x.dtype)
    std = jnp.asarray(DATA_STD, dtype=x.dtype)
    return (x - mean) / std


def pack_pathways(frames: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B,32,H,W,C) -> (slow (B,8,...), fast (B,32,...)); slow takes every
    ALPHA-th frame (reference pack_pathway_output)."""
    fast = frames
    slow = frames[:, :: ALPHA]
    return slow, fast


@register_model("layer_slow_fast")  # reference config.py:2 spelling
@register_model("layer_slowfast")
class LayerSlowFast:
    """Layer-tapped SlowFast over uint8 frame batches (B,32,256,256,3)."""

    output_dims = LAYER_DIMS
    model_tag = {"name": "SLOWFAST_8x8_R50", "dataset": "kinetics-400"}
    media_type = "video"

    def __init__(self, dtype=jnp.float32):
        self.backbone = SlowFastBackbone(dtype=dtype)

    def init(self, key, num_frames: int = 32, size: int = 256):
        slow = jnp.zeros((1, num_frames // ALPHA, size, size, 3))
        fast = jnp.zeros((1, num_frames, size, size, 3))
        return self.backbone.init(key, slow, fast)

    def apply(self, params, frames: jnp.ndarray) -> List[jnp.ndarray]:
        x = normalize_frames(frames)
        slow, fast = pack_pathways(x)
        return self.backbone.apply(params, slow, fast)

    def __call__(self, params, frames):
        return self.apply(params, frames)


@register_model("slow_fast")  # reference model_types spelling
@register_model("slowfast")
class SlowFast(LayerSlowFast):
    """Final-layer-only variant (2304-d; reference slowfast.py:31-95)."""

    output_dims = 2304

    def apply(self, params, frames):
        return super().apply(params, frames)[-1]


# -- PySlowFast torch checkpoint conversion -----------------------------------

def _stage_block_names():
    names = {}
    for si in range(4):
        for bi in range(STAGE_BLOCKS[si]):
            for pw, tag in ((0, "slow"), (1, "fast")):
                names[f"s{si + 2}.pathway{pw}_res{bi}"] = (
                    f"s{si + 2}_{tag}", f"block{bi}"
                )
    return names


def convert_pyslowfast_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """PySlowFast torch state dict (already caffe2-translated, numpy) ->
    flax {params, batch_stats}. Conv: OIDHW -> DHWIO.

    Covers the module names used by the reference's tapped forward
    (slowfast.py:61-87): s1/s1_fuse/s2..s5/s{i}_fuse.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    def conv(tkey):
        w = np.asarray(sd[tkey])  # (O, I, D, H, W)
        return {"kernel": w.transpose(2, 3, 4, 1, 0)}

    def bn(prefix):
        return (
            {
                "scale": np.asarray(sd[f"{prefix}.weight"]),
                "bias": np.asarray(sd[f"{prefix}.bias"]),
            },
            {
                "mean": np.asarray(sd[f"{prefix}.running_mean"]),
                "var": np.asarray(sd[f"{prefix}.running_var"]),
            },
        )

    # stems
    for pw, tag in ((0, "slow"), (1, "fast")):
        put(params, (f"s1_{tag}", "conv"), conv(f"s1.pathway{pw}_stem.conv.weight"))
        p, s = bn(f"s1.pathway{pw}_stem.bn")
        put(params, (f"s1_{tag}", "bn", "BatchNorm_0"), p)
        put(stats, (f"s1_{tag}", "bn", "BatchNorm_0"), s)
    # fuses
    for si, mod in (("s1_fuse", "s1_fuse"), ("s2_fuse", "s2_fuse"),
                    ("s3_fuse", "s3_fuse"), ("s4_fuse", "s4_fuse")):
        put(params, (mod, "conv_f2s"), conv(f"{si}.conv_f2s.weight"))
        p, s = bn(f"{si}.bn")
        put(params, (mod, "bn", "BatchNorm_0"), p)
        put(stats, (mod, "bn", "BatchNorm_0"), s)
    # stages
    for tmod, (stage_name, block_name) in _stage_block_names().items():
        for branch in ("a", "b", "c"):
            put(
                params, (stage_name, block_name, f"branch2_{branch}"),
                conv(f"{tmod}.branch2.{branch}.weight"),
            )
            p, s = bn(f"{tmod}.branch2.{branch}_bn")
            bn_mod = f"branch2_{branch}_bn"
            inner = () if branch == "c" else ("BatchNorm_0",)
            put(params, (stage_name, block_name, bn_mod) + inner, p)
            put(stats, (stage_name, block_name, bn_mod) + inner, s)
        if f"{tmod}.branch1.weight" in sd:
            put(params, (stage_name, block_name, "branch1"),
                conv(f"{tmod}.branch1.weight"))
            p, s = bn(f"{tmod}.branch1_bn")
            put(params, (stage_name, block_name, "branch1_bn", "BatchNorm_0"), p)
            put(stats, (stage_name, block_name, "branch1_bn", "BatchNorm_0"), s)
    return {"params": params, "batch_stats": stats}
