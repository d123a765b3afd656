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


def _tblock_kernel(kernel: jnp.ndarray, bt: int) -> jnp.ndarray:
    """Rearrange a stem kernel (kt,7,7,Cin,Cout) into temporal
    output-block form: one conv with temporal stride ``bt`` whose output
    channels are a block of ``bt`` consecutive output frames.

    Output frame bt*j+a taps k land at window offset tau = a + k (window
    start bt*j - kt//2); offsets outside a phase's true tap range get zero
    weights, so the convolution is exactly the original one. For the fast
    stem (Cout=8, 8/128 MXU output lanes) bt=16 raises real output
    channels to 128 while the output-position count shrinks 16x — measured
    2x the plain stem on v5e (52.7 -> 26.5 ms at batch 64). Spatial
    dimensions stay the plain stride-2 7x7 conv, which XLA already lowers
    at ~70% of the lane-padded roofline; spatial output blocking
    (stride-4/kernel-9 polyphase and 2x2 input space-to-depth) measured
    SLOWER than plain — the TPU conv emitter handles those shapes poorly.
    """
    kt, kh, kw, cin, cout = kernel.shape
    n_tk = bt + kt - 1
    tau = np.arange(n_tk)[:, None]
    a = np.arange(bt)[None, :]
    t_idx = tau - a  # (n_tk, bt), valid 0..kt-1
    t_ok = (t_idx >= 0) & (t_idx < kt)
    w = kernel[np.clip(t_idx, 0, kt - 1)]  # (n_tk, bt, kh, kw, cin, cout)
    w = jnp.where(jnp.asarray(t_ok)[..., None, None, None, None], w, 0.0)
    w = w.transpose(0, 2, 3, 4, 1, 5)  # (n_tk, kh, kw, cin, bt, cout)
    return w.reshape(n_tk, kh, kw, cin, bt * cout)


def _tblock_conv(x: jnp.ndarray, kernel: jnp.ndarray, bt: int,
                 dtype) -> jnp.ndarray:
    """Apply a stem conv (stride (1,2,2), pad (kt//2,3,3)) via the temporal
    output-block convolution. x: (B,T,H,W,C) with T % bt == 0."""
    kt = kernel.shape[0]
    bb, t, h, w_, c = x.shape
    cout = kernel.shape[-1]
    w2 = _tblock_kernel(kernel, bt)
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), w2.astype(dtype),
        window_strides=(bt, 2, 2),
        padding=((kt // 2, kt // 2), (3, 3), (3, 3)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )  # (B, T/bt, H/2, W/2, bt*cout), channels = (a, cout)
    return y


def _blocked_temporal_kernel(kernel: jnp.ndarray, bt_in: int,
                             stride_t: int = 1):
    """Rearrange a canonical conv kernel (kt,kh,kw,C,C') for blocked-T
    layout: input (B, T/bt, H, W, bt*C) with frame-major channels (a, c).

    The blocked conv slides over the block axis with window KB = lo+1+hi
    blocks; entry [kb, a2*C+c, u*C'+c'] carries canonical tap
    k = a2 + (kb-lo)*bt - stride_t*u + kt//2 (zero outside 0..kt-1), so the
    convolution is exactly the canonical temporal conv, block boundaries
    included. stride_t>1 (the fuse convs) emits bt/stride_t frames per
    block. kt==1 degenerates to KB=1 block-diagonal — per-frame convs
    (1x1x1 and spatial 3x3) use the same builder.

    Why: fast-pathway channel counts (8..256) under-fill the MXU's 128
    lanes; folding bt frames into channels multiplies both contraction and
    output lanes by bt at identical parameters.
    """
    kt, kh, kw, c, cp = kernel.shape
    pad = kt // 2
    bt_out = max(bt_in // stride_t, 1)
    lo = -(-pad // bt_in) if pad else 0
    hi = max((bt_in - stride_t + kt - 1 - pad) // bt_in, 0)
    kb = np.arange(lo + 1 + hi)[:, None, None]
    a2 = np.arange(bt_in)[None, :, None]
    u = np.arange(bt_out)[None, None, :]
    k_idx = a2 + (kb - lo) * bt_in - stride_t * u + pad
    ok = (k_idx >= 0) & (k_idx < kt)
    w = kernel[np.clip(k_idx, 0, kt - 1)]  # (KB, bt_in, bt_out, kh, kw, C, C')
    w = jnp.where(jnp.asarray(ok)[..., None, None, None, None], w, 0.0)
    w = w.transpose(0, 3, 4, 1, 5, 2, 6)  # KB, kh, kw, bt_in, C, bt_out, C'
    return (
        w.reshape(lo + 1 + hi, kh, kw, bt_in * c, bt_out * cp),
        (lo, hi),
    )


def _blocked_conv(x: jnp.ndarray, kernel: jnp.ndarray, bt: int, dtype,
                  stride_t: int = 1, spatial_stride: int = 1) -> jnp.ndarray:
    """Canonical conv (kernel (kt,kh,kw,C,C'), temporal stride ``stride_t``,
    'same' padding) applied in blocked-T layout (B, Nb, H, W, bt*C)."""
    wb, (lo, hi) = _blocked_temporal_kernel(kernel, bt, stride_t)
    kh, kw = kernel.shape[1], kernel.shape[2]
    s = spatial_stride
    return jax.lax.conv_general_dilated(
        x.astype(dtype), wb.astype(dtype),
        window_strides=(1, s, s),
        padding=((lo, hi), (kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def _reblock(x: jnp.ndarray, bt_from: int, bt_to: int) -> jnp.ndarray:
    """(B, T/bt_from, H, W, bt_from*C) -> (B, T/bt_to, H, W, bt_to*C);
    bt_to in {0, 1} unblocks to canonical (B, T, H, W, C)."""
    bt_from, bt_to = max(bt_from, 1), max(bt_to, 1)
    if bt_from == bt_to:
        return x
    b, nb, h, w, btc = x.shape
    c = btc // bt_from
    if bt_from % bt_to == 0:  # split blocks
        r = bt_from // bt_to
        x = x.reshape(b, nb, h, w, r, bt_to * c)
        return x.transpose(0, 1, 4, 2, 3, 5).reshape(
            b, nb * r, h, w, bt_to * c
        )
    assert bt_to % bt_from == 0, (bt_from, bt_to)
    r = bt_to // bt_from  # merge blocks
    x = x.reshape(b, nb // r, r, h, w, btc)
    return x.transpose(0, 1, 3, 4, 2, 5).reshape(b, nb // r, h, w, r * btc)


def _bn_blocked(bn_mod, x: jnp.ndarray, bt: int) -> jnp.ndarray:
    """Apply a canonical per-channel BN module in blocked layout by viewing
    channels as (bt, C) — a free reshape on the minor axis."""
    b, nb, h, w, btc = x.shape
    x6 = x.reshape(b, nb, h, w, bt, btc // bt)
    return bn_mod(x6).reshape(b, nb, h, w, btc)


class _ConvKernel(nn.Module):
    """Bare conv kernel parameter with nn.Conv's name/shape/init, so
    blocked modules share checkpoint layout with the canonical ones."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(), self.shape)


class BlockedBottleneck(nn.Module):
    """``Bottleneck`` evaluated in blocked-T layout — identical math and
    parameter tree; see ``_blocked_temporal_kernel`` for why."""

    dim_out: int
    dim_inner: int
    temp_kernel: int
    bt: int
    spatial_stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        bt, s = self.bt, self.spatial_stride
        dim_in = x.shape[-1] // bt
        shortcut = x
        if (dim_in != self.dim_out) or (s != 1):
            k1 = _ConvKernel((1, 1, 1, dim_in, self.dim_out), name="branch1")()
            shortcut = _blocked_conv(x, k1, bt, self.dtype, spatial_stride=s)
            shortcut = _bn_blocked(BN(self.dtype, name="branch1_bn"), shortcut, bt)
        kt = self.temp_kernel
        ka = _ConvKernel((kt, 1, 1, dim_in, self.dim_inner), name="branch2_a")()
        h = _blocked_conv(x, ka, bt, self.dtype)
        h = nn.relu(_bn_blocked(BN(self.dtype, name="branch2_a_bn"), h, bt))
        kb = _ConvKernel((1, 3, 3, self.dim_inner, self.dim_inner),
                         name="branch2_b")()
        h = _blocked_conv(h, kb, bt, self.dtype, spatial_stride=s)
        h = nn.relu(_bn_blocked(BN(self.dtype, name="branch2_b_bn"), h, bt))
        kc = _ConvKernel((1, 1, 1, self.dim_inner, self.dim_out),
                         name="branch2_c")()
        h = _blocked_conv(h, kc, bt, self.dtype)
        h = _bn_blocked(
            nn.BatchNorm(
                use_running_average=True, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, scale_init=nn.initializers.zeros,
                name="branch2_c_bn",
            ),
            h, bt,
        )
        return nn.relu(shortcut + h)


class BlockedStage(nn.Module):
    """``Stage`` in blocked-T layout (same parameter tree)."""

    num_blocks: int
    dim_out: int
    dim_inner: int
    temp_kernel: int
    spatial_stride: int
    bt: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_blocks):
            x = BlockedBottleneck(
                dim_out=self.dim_out,
                dim_inner=self.dim_inner,
                temp_kernel=self.temp_kernel,
                bt=self.bt,
                spatial_stride=self.spatial_stride if i == 0 else 1,
                dtype=self.dtype,
                name=f"block{i}",
            )(x)
        return x


class _RawBN(nn.Module):
    """Declares nn.BatchNorm's exact leaves (scale/bias params +
    mean/var batch_stats) without applying them — for modules that fold
    BN into conv weights at apply time."""

    features: int
    zero_init: bool = False

    @nn.compact
    def __call__(self):
        init_s = (nn.initializers.zeros if self.zero_init
                  else nn.initializers.ones)
        scale = self.param("scale", init_s, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.features,), jnp.float32))
        var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.features,), jnp.float32))
        return scale, bias, mean.value, var.value


class _WrappedBN(nn.Module):
    """Param-path shim: ``<name>/BatchNorm_0/...`` like the BN wrapper."""

    features: int

    @nn.compact
    def __call__(self):
        return _RawBN(self.features, name="BatchNorm_0")()


class PallasStage(nn.Module):
    """``Stage`` with temp_kernel=1 evaluated by the fused Pallas kernel
    (``ops/pallas/bottleneck_kernel.py``) — identical math and parameter
    tree; BN folded into conv scales/biases at apply time. Falls back to
    the canonical ``Stage`` graph on CPU (no Mosaic) via ``interpret``.
    """

    num_blocks: int
    dim_out: int
    dim_inner: int
    spatial_stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.pallas.bottleneck_kernel import fused_stage

        blocks = []
        dim_in = x.shape[-1]
        for i in range(self.num_blocks):
            # scope the per-block params under block{i}/ exactly like Stage
            scope = _PallasBottleneckParams(
                dim_in=dim_in if i == 0 else self.dim_out,
                dim_out=self.dim_out,
                dim_inner=self.dim_inner,
                proj=(i == 0
                      and ((dim_in != self.dim_out)
                           or self.spatial_stride != 1)),
                name=f"block{i}",
            )
            blocks.append(scope())
        b, t, hh, ww, c = x.shape
        y = fused_stage(
            x.reshape(b * t, hh, ww, c).astype(self.dtype),
            blocks,
            stride=self.spatial_stride,
            interpret=jax.default_backend() != "tpu",
        )
        return y.reshape(b, t, y.shape[1], y.shape[2], y.shape[3])


class _PallasBottleneckParams(nn.Module):
    """Declares one Bottleneck's parameter tree (names matching
    ``Bottleneck``) and returns BN-folded kernel dicts for the Pallas op."""

    dim_in: int
    dim_out: int
    dim_inner: int
    proj: bool

    @nn.compact
    def __call__(self) -> Dict[str, Any]:
        from ..ops.pallas.bottleneck_kernel import fold_bn

        out: Dict[str, Any] = {}
        aw = _ConvKernel((1, 1, 1, self.dim_in, self.dim_inner),
                         name="branch2_a")()
        mul, add = fold_bn(*_WrappedBN(self.dim_inner, name="branch2_a_bn")())
        out["aw"] = aw[0, 0, 0] * mul
        out["ab"] = add
        bw = _ConvKernel((1, 3, 3, self.dim_inner, self.dim_inner),
                         name="branch2_b")()
        mul, add = fold_bn(*_WrappedBN(self.dim_inner, name="branch2_b_bn")())
        out["bw"] = bw[0] * mul
        out["bb"] = add
        cw = _ConvKernel((1, 1, 1, self.dim_inner, self.dim_out),
                         name="branch2_c")()
        mul, add = fold_bn(
            *_RawBN(self.dim_out, zero_init=True, name="branch2_c_bn")())
        out["cw"] = cw[0, 0, 0] * mul
        out["cb"] = add
        if self.proj:
            pw = _ConvKernel((1, 1, 1, self.dim_in, self.dim_out),
                             name="branch1")()
            mul, add = fold_bn(*_WrappedBN(self.dim_out, name="branch1_bn")())
            out["pw"] = pw[0, 0, 0] * mul
            out["pb"] = add
        return out


class QuantBottleneck(nn.Module):
    """``Bottleneck`` with int8 conv arithmetic — same parameter tree, plus
    one abs-max observer per conv input in the ``quant`` collection.

    mode='calib': exact fp math (identical to ``Bottleneck``) while the
    observers record running activation maxima. mode='int8': activations
    quantize per-tensor against the frozen scales, convs run int8 with
    int32 accumulation, and the dequantize+BN+ReLU epilogue stays fp. The
    identity shortcut reads the *quantized* input (``xq * s``) so the fp
    input tensor has no consumer left after the quantize — XLA then fuses
    the quantize into the producer's epilogue and the inter-block HBM
    tensor is int8. See ``models/quant.py`` for why scales are static.
    """

    dim_out: int
    dim_inner: int
    temp_kernel: int
    spatial_stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mode: str = "int8"):
        from .quant import ActObserver, conv3d_int8, qconv, quantize_act

        dim_in = x.shape[-1]
        s = self.spatial_stride
        kt = self.temp_kernel
        need_proj = (dim_in != self.dim_out) or (s != 1)

        k1 = (_ConvKernel((1, 1, 1, dim_in, self.dim_out), name="branch1")()
              if need_proj else None)
        ka = _ConvKernel((kt, 1, 1, dim_in, self.dim_inner),
                         name="branch2_a")()
        kb = _ConvKernel((1, 3, 3, self.dim_inner, self.dim_inner),
                         name="branch2_b")()
        kc = _ConvKernel((1, 1, 1, self.dim_inner, self.dim_out),
                         name="branch2_c")()

        pad_a = ((kt // 2, kt // 2), (0, 0), (0, 0))
        pad_b = ((0, 0), (1, 1), (1, 1))
        pad_1 = ((0, 0), (0, 0), (0, 0))

        def fpconv(inp, ker, strides, padding):
            return jax.lax.conv_general_dilated(
                inp.astype(self.dtype), ker.astype(self.dtype),
                window_strides=strides, padding=padding,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )

        q_in = ActObserver(name="q_in")
        q_a = ActObserver(name="q_a")
        q_b = ActObserver(name="q_b")

        if mode == "int8":
            s_in = q_in(None, mode)
            xq = quantize_act(x, s_in)
            if need_proj:
                shortcut = qconv(xq, s_in, k1,
                                 conv3d_int8((1, s, s), pad_1), self.dtype)
                shortcut = BN(self.dtype, name="branch1_bn")(shortcut)
            else:
                # dequantized input: frees the fp input for producer fusion
                shortcut = (xq.astype(jnp.float32) * s_in).astype(self.dtype)
            h = qconv(xq, s_in, ka, conv3d_int8((1, 1, 1), pad_a), self.dtype)
            h = nn.relu(BN(self.dtype, name="branch2_a_bn")(h))
            s_a = q_a(None, mode)
            h = qconv(quantize_act(h, s_a), s_a, kb,
                      conv3d_int8((1, s, s), pad_b), self.dtype)
            h = nn.relu(BN(self.dtype, name="branch2_b_bn")(h))
            s_b = q_b(None, mode)
            h = qconv(quantize_act(h, s_b), s_b, kc,
                      conv3d_int8((1, 1, 1), pad_1), self.dtype)
        else:  # calib: canonical fp math + observer updates
            q_in(x, mode)
            if need_proj:
                shortcut = BN(self.dtype, name="branch1_bn")(
                    fpconv(x, k1, (1, s, s), pad_1))
            else:
                shortcut = x
            h = nn.relu(BN(self.dtype, name="branch2_a_bn")(
                fpconv(x, ka, (1, 1, 1), pad_a)))
            q_a(h, mode)
            h = nn.relu(BN(self.dtype, name="branch2_b_bn")(
                fpconv(h, kb, (1, s, s), pad_b)))
            q_b(h, mode)
            h = fpconv(h, kc, (1, 1, 1), pad_1)
        h = nn.BatchNorm(
            use_running_average=True, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, scale_init=nn.initializers.zeros,
            name="branch2_c_bn",
        )(h)
        return nn.relu(shortcut + h)


class QuantStage(nn.Module):
    """``Stage`` in int8 mode (same parameter tree + quant observers)."""

    num_blocks: int
    dim_out: int
    dim_inner: int
    temp_kernel: int
    spatial_stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mode: str = "int8"):
        for i in range(self.num_blocks):
            x = QuantBottleneck(
                dim_out=self.dim_out,
                dim_inner=self.dim_inner,
                temp_kernel=self.temp_kernel,
                spatial_stride=self.spatial_stride if i == 0 else 1,
                dtype=self.dtype,
                name=f"block{i}",
            )(x, mode)
        return x


class QuantBlockedBottleneck(nn.Module):
    """``BlockedBottleneck`` with int8 conv arithmetic — same parameter
    tree, plus one abs-max observer per conv input (``quant`` collection).

    The canonical kernel is expanded to blocked-T form first
    (``_blocked_temporal_kernel``) and THEN quantized per blocked output
    channel, so the zero-padding entries the expansion inserts stay exact
    zeros in int8. Blocked layout and int8 compound on the fast pathway:
    blocking multiplies the contraction/output lanes by bt (fixing the
    8-256-channel MXU under-fill) and int8 doubles the MXU rate and halves
    the HBM activation bytes on top. See ``models/quant.py`` for why
    activation scales are static.
    """

    dim_out: int
    dim_inner: int
    temp_kernel: int
    bt: int
    spatial_stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mode: str = "int8"):
        from .quant import ActObserver, quantize_act, weight_qparams

        bt, s = self.bt, self.spatial_stride
        dim_in = x.shape[-1] // bt
        kt = self.temp_kernel
        need_proj = (dim_in != self.dim_out) or (s != 1)

        k1 = (_ConvKernel((1, 1, 1, dim_in, self.dim_out), name="branch1")()
              if need_proj else None)
        ka = _ConvKernel((kt, 1, 1, dim_in, self.dim_inner),
                         name="branch2_a")()
        kb = _ConvKernel((1, 3, 3, self.dim_inner, self.dim_inner),
                         name="branch2_b")()
        kc = _ConvKernel((1, 1, 1, self.dim_inner, self.dim_out),
                         name="branch2_c")()

        q_in = ActObserver(name="q_in")
        q_a = ActObserver(name="q_a")
        q_b = ActObserver(name="q_b")

        def qbconv(xq, sx, kernel, spatial_stride=1):
            wb, (lo, hi) = _blocked_temporal_kernel(kernel, bt)
            kh, kw = kernel.shape[1], kernel.shape[2]
            wq, sw = weight_qparams(wb)
            y = jax.lax.conv_general_dilated(
                xq, wq,
                window_strides=(1, spatial_stride, spatial_stride),
                padding=((lo, hi), (kh // 2, kh // 2), (kw // 2, kw // 2)),
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.int32,
            )
            return (y.astype(jnp.float32) * (sx * sw)).astype(self.dtype)

        if mode == "int8":
            s_in = q_in(None, mode)
            xq = quantize_act(x, s_in)
            if need_proj:
                shortcut = _bn_blocked(
                    BN(self.dtype, name="branch1_bn"),
                    qbconv(xq, s_in, k1, s), bt)
            else:
                shortcut = (xq.astype(jnp.float32) * s_in).astype(self.dtype)
            h = qbconv(xq, s_in, ka)
            h = nn.relu(_bn_blocked(BN(self.dtype, name="branch2_a_bn"),
                                    h, bt))
            s_a = q_a(None, mode)
            h = qbconv(quantize_act(h, s_a), s_a, kb, s)
            h = nn.relu(_bn_blocked(BN(self.dtype, name="branch2_b_bn"),
                                    h, bt))
            s_b = q_b(None, mode)
            h = qbconv(quantize_act(h, s_b), s_b, kc)
        else:  # calib: canonical blocked fp math + observer updates
            q_in(x, mode)
            if need_proj:
                shortcut = _bn_blocked(
                    BN(self.dtype, name="branch1_bn"),
                    _blocked_conv(x, k1, bt, self.dtype, spatial_stride=s),
                    bt)
            else:
                shortcut = x
            h = nn.relu(_bn_blocked(
                BN(self.dtype, name="branch2_a_bn"),
                _blocked_conv(x, ka, bt, self.dtype), bt))
            q_a(h, mode)
            h = nn.relu(_bn_blocked(
                BN(self.dtype, name="branch2_b_bn"),
                _blocked_conv(h, kb, bt, self.dtype, spatial_stride=s), bt))
            q_b(h, mode)
            h = _blocked_conv(h, kc, bt, self.dtype)
        h = _bn_blocked(
            nn.BatchNorm(
                use_running_average=True, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, scale_init=nn.initializers.zeros,
                name="branch2_c_bn",
            ),
            h, bt,
        )
        return nn.relu(shortcut + h)


class QuantBlockedStage(nn.Module):
    """``BlockedStage`` in int8 mode (same parameter tree + observers)."""

    num_blocks: int
    dim_out: int
    dim_inner: int
    temp_kernel: int
    spatial_stride: int
    bt: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mode: str = "int8"):
        for i in range(self.num_blocks):
            x = QuantBlockedBottleneck(
                dim_out=self.dim_out,
                dim_inner=self.dim_inner,
                temp_kernel=self.temp_kernel,
                bt=self.bt,
                spatial_stride=self.spatial_stride if i == 0 else 1,
                dtype=self.dtype,
                name=f"block{i}",
            )(x, mode)
        return x


class BlockedFuse(nn.Module):
    """``FuseFastToSlow`` reading the fast pathway in blocked-T layout
    (same parameter tree); emits the canonical concatenated slow tensor."""

    fast_channels: int
    bt: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, slow, fast_blocked):
        c = self.fast_channels
        k = _ConvKernel(
            (FUSION_KERNEL, 1, 1, c, c * FUSION_CONV_RATIO), name="conv_f2s"
        )()
        y = _blocked_conv(fast_blocked, k, self.bt, self.dtype, stride_t=ALPHA)
        y = _reblock(y, self.bt // ALPHA, 1)  # tiny (T/ALPHA frames)
        y = nn.relu(BN(self.dtype, name="bn")(y))
        return jnp.concatenate([slow, y], axis=-1), fast_blocked


class Stem(nn.Module):
    """Stem conv (kt,7,7) stride (1,2,2) + BN/ReLU + spatial max pool.

    ``s2d=True`` evaluates the IDENTICAL convolution via a 2x2
    space-to-depth rewrite: the 3-channel 7x7/stride-2 conv (3/128 MXU lane
    utilization — about half of total model time) becomes a 12-channel
    4x4/stride-1 conv on half-resolution blocks. Parameters keep the
    canonical (kt,7,7,Cin,Cout) layout under ``conv/kernel`` — the kernel is
    rearranged at apply time, so checkpoints and converters are unaffected.
    Requires even H, W.

    ``t_block=bt`` (takes precedence; measured 2x the plain fast stem on
    v5e) stacks ``bt`` consecutive output FRAMES as output channels: the
    fast stem's Cout=8 fills only 8/128 MXU lanes, so the plain conv pays
    a 16x lane-padding tax; bt=16 raises real output channels to 128 while
    the output-position count shrinks 16x. Same parameters, rearranged at
    apply time; requires T % bt == 0 (falls back to the plain conv
    otherwise). See ``_tblock_kernel``.

    Derivation (per spatial dim, pad 3, stride 2): output i reads input
    rows 2i-3..2i+3, which live in 2-row blocks i-2..i+1 at in-block offset
    a, with w_s2d[m, a] = w[2m + a - 1] (zero outside 0..6) — i.e. kernel 4,
    stride 1, padding (2, 1) in block space.
    """

    dim_out: int
    temp_kernel: int
    dtype: Any = jnp.float32
    s2d: bool = False
    t_block: int = 0
    emit_blocked: bool = False  # keep the blocked-T layout for the caller
    # (mean, std) per input channel: fold (x/255 - mean)/std into the stem
    # kernel so raw uint8 frames feed the conv directly — removes the
    # materialized normalized-f32 tensor (1.6 GB/batch at production
    # shapes) from the HBM roofline. The scale folds into the kernel; the
    # mean shift becomes a SHARED batch-1 conv over ones through the same
    # path (canonical zero padding happens in normalized space, so the
    # shift's contribution varies near borders — a constant bias would be
    # wrong there). Exact to fp rounding at every position.
    input_norm: Optional[Tuple[Tuple[float, ...], Tuple[float, ...]]] = None

    def _folded(self, conv_fn, x, kernel):
        """y = conv_fn(normalize(x)) computed from raw x: scale-folded
        kernel plus the ones-conv mean correction."""
        if self.input_norm is None:
            return conv_fn(x, kernel)
        mean, std = self.input_norm
        m = jnp.asarray(mean, jnp.float32)
        s = jnp.asarray(std, jnp.float32)
        scaled = kernel * (1.0 / (255.0 * s))[:, None]
        wm = jnp.einsum("khwio,i->khwo", kernel, m / s)[..., None, :]
        ones = jnp.ones((1,) + x.shape[1:-1] + (1,), jnp.float32)
        return conv_fn(x, scaled) - conv_fn(ones, wm)

    @nn.compact
    def __call__(self, x):
        kt = self.temp_kernel
        bt = self.t_block
        use_tb = bt > 1 and x.shape[1] % bt == 0
        use_s2d = (not use_tb) and self.s2d \
            and x.shape[-3] % 2 == 0 and x.shape[-2] % 2 == 0
        if use_tb:
            kernel = _StemKernel(kt, x.shape[-1], self.dim_out, name="conv")()
            x = self._folded(
                lambda inp, ker: _tblock_conv(inp, ker, bt, self.dtype),
                x, kernel,
            )
            x = nn.relu(_bn_blocked(BN(self.dtype, name="bn"), x, bt))
            x = nn.max_pool(
                x, (1, 3, 3), strides=(1, 2, 2),
                padding=((0, 0), (1, 1), (1, 1)),
            )
            if not self.emit_blocked:
                x = _reblock(x, bt, 1)
            return x
        if use_s2d:

            def s2d_conv(inp, ker):
                b, t, h, w, c = inp.shape
                # input blocks: (B,T,H/2,W/2, 2*2*C), (a,b,c)-major packing
                xb = inp.reshape(b, t, h // 2, 2, w // 2, 2, c)
                xb = xb.transpose(0, 1, 2, 4, 3, 5, 6).reshape(
                    b, t, h // 2, w // 2, 4 * c
                )
                # kernel: w2[kt, m, n, (a,b,cin)] = w[kt, 2m+a-1, 2n+b-1]
                # (pad the 7-tap dims to 8 so padded index = 2m+a)
                cout = ker.shape[-1]
                kpad = jnp.pad(ker, ((0, 0), (1, 0), (1, 0), (0, 0), (0, 0)))
                w2 = kpad.reshape(kt, 4, 2, 4, 2, c, cout)
                w2 = w2.transpose(0, 1, 3, 2, 4, 5, 6).reshape(
                    kt, 4, 4, 4 * c, cout
                )
                return jax.lax.conv_general_dilated(
                    xb.astype(self.dtype),
                    w2.astype(self.dtype),
                    window_strides=(1, 1, 1),
                    padding=((kt // 2, kt // 2), (2, 1), (2, 1)),
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                )

            kernel = _StemKernel(kt, x.shape[-1], self.dim_out, name="conv")()
            x = self._folded(s2d_conv, x, kernel)
        else:

            def plain_conv(inp, ker):
                return jax.lax.conv_general_dilated(
                    inp.astype(self.dtype), ker.astype(self.dtype),
                    window_strides=(1, 2, 2),
                    padding=((kt // 2, kt // 2), (3, 3), (3, 3)),
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                )

            kernel = _StemKernel(kt, x.shape[-1], self.dim_out, name="conv")()
            x = self._folded(plain_conv, x, kernel)
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


def _pool_all(slow, fast, fast_bt: int = 0):
    """Global mean over (T,H,W), concat pathways — equivalent to the
    reference head avgpool + mean([1,2,3]) (slowfast.py:135-146).
    ``fast_bt>1``: fast is in blocked-T layout; the frame sub-axis of the
    channel dim joins the mean."""
    fm = jnp.mean(fast, axis=(1, 2, 3))
    if fast_bt > 1:
        fm = jnp.mean(fm.reshape(fm.shape[0], fast_bt, -1), axis=1)
    return jnp.concatenate([jnp.mean(slow, axis=(1, 2, 3)), fm], axis=-1)


class SlowFastBackbone(nn.Module):
    """Returns the 5 layer taps; input (slow (B,8,H,W,3), fast (B,32,H,W,3))."""

    dtype: Any = jnp.float32
    # Stem modes, measured at batch 64 / bf16 / 256^2 on v5e:
    #   slow: plain 11.95 ms < s2d 13.76 ms -> plain (s2d off)
    s2d: bool = False
    # Per-stage blocked-T schedule for the fast pathway (s1..s5): fold bt
    # consecutive frames into the channel dim so the 8..256-channel fast
    # convs fill the MXU's 128 lanes (see _blocked_temporal_kernel). 0/1 =
    # canonical layout. Falls back to canonical when T doesn't divide.
    fast_block: Tuple[int, int, int, int, int] = (0, 0, 0, 0, 0)
    # fold (x/255 - mean)/std into the stem kernels: inputs are RAW uint8
    # frame values (see Stem.input_norm)
    fold_norm: bool = False
    # route the kt=1 slow stages (s2/s3) through the fused Pallas stage
    # kernel — one frame resident in VMEM per step, whole stage fused
    # (ops/pallas/bottleneck_kernel.py)
    pallas_stages: bool = False
    # 'int8': s2..s5 on BOTH pathways run int8 convs with statically
    # calibrated activation scales (models/quant.py; blocked-T fast
    # stages quantize the blocked kernels). Documented-numerics
    # throughput mode, never bit-match-eligible. Takes precedence over
    # pallas_stages on the slow pathway.
    quant: str = "none"

    @nn.compact
    def __call__(self, slow, fast,
                 quant_mode: Optional[str] = None) -> List[jnp.ndarray]:
        qmode = quant_mode or ("int8" if self.quant != "none" else "none")
        taps: List[jnp.ndarray] = []
        norm = (DATA_MEAN, DATA_STD) if self.fold_norm else None
        w = 64  # width per group
        fb = [max(f, 1) for f in self.fast_block]
        t_frames = fast.shape[1]
        blocked = any(f > 1 for f in fb) and all(
            t_frames % f == 0 for f in fb
        )
        if not blocked:
            fb = [1] * 5
        blocked = blocked and fb[0] > 1
        cur = fb[0]
        slow = Stem(w, SLOW_TEMP_KERNELS[0], self.dtype, s2d=self.s2d,
                    input_norm=norm, name="s1_slow")(slow)
        fast = Stem(w // BETA_INV, FAST_TEMP_KERNELS[0], self.dtype,
                    s2d=self.s2d, t_block=fb[0] if blocked else 0,
                    emit_blocked=True, input_norm=norm, name="s1_fast")(fast)
        if cur > 1 and cur % ALPHA == 0:
            slow, fast = BlockedFuse(w // BETA_INV, cur, self.dtype,
                                     name="s1_fuse")(slow, fast)
        else:
            fast = _reblock(fast, cur, 1) if cur > 1 else fast
            cur = 1
            slow, fast = FuseFastToSlow(w // BETA_INV, self.dtype,
                                        name="s1_fuse")(slow, fast)
        taps.append(_pool_all(slow, fast, cur))  # 88

        dims_out = [w * 4, w * 8, w * 16, w * 32]  # 256 512 1024 2048
        dims_inner = [w, w * 2, w * 4, w * 8]
        for si in range(4):
            want = max(fb[si + 1], 1)
            if want != cur:
                fast = _reblock(fast, cur, want)
                cur = want
            # stride-1 kt=1 stages only: the fused kernel's polyphase
            # stride-2 subsampling measured 2.2x SLOWER than XLA on v5e
            # (51 vs 23 ms for s3_slow) — sublane relayouts dominate
            if self.quant != "none":
                slow = QuantStage(
                    STAGE_BLOCKS[si], dims_out[si], dims_inner[si],
                    SLOW_TEMP_KERNELS[si + 1], SPATIAL_STRIDES[si],
                    self.dtype, name=f"s{si + 2}_slow",
                )(slow, qmode)
            elif (self.pallas_stages and SLOW_TEMP_KERNELS[si + 1] == 1
                    and SPATIAL_STRIDES[si] == 1):
                slow = PallasStage(
                    STAGE_BLOCKS[si], dims_out[si], dims_inner[si],
                    SPATIAL_STRIDES[si], self.dtype,
                    name=f"s{si + 2}_slow",
                )(slow)
            else:
                slow = Stage(
                    STAGE_BLOCKS[si], dims_out[si], dims_inner[si],
                    SLOW_TEMP_KERNELS[si + 1], SPATIAL_STRIDES[si],
                    self.dtype, name=f"s{si + 2}_slow",
                )(slow)
            if cur > 1:
                fast_cls = (QuantBlockedStage if self.quant != "none"
                            else BlockedStage)
                fast = fast_cls(
                    STAGE_BLOCKS[si], dims_out[si] // BETA_INV,
                    dims_inner[si] // BETA_INV,
                    FAST_TEMP_KERNELS[si + 1], SPATIAL_STRIDES[si], cur,
                    self.dtype, name=f"s{si + 2}_fast",
                )(*((fast, qmode) if self.quant != "none" else (fast,)))
            elif self.quant != "none":
                fast = QuantStage(
                    STAGE_BLOCKS[si], dims_out[si] // BETA_INV,
                    dims_inner[si] // BETA_INV,
                    FAST_TEMP_KERNELS[si + 1], SPATIAL_STRIDES[si],
                    self.dtype, name=f"s{si + 2}_fast",
                )(fast, qmode)
            else:
                fast = Stage(
                    STAGE_BLOCKS[si], dims_out[si] // BETA_INV,
                    dims_inner[si] // BETA_INV,
                    FAST_TEMP_KERNELS[si + 1], SPATIAL_STRIDES[si],
                    self.dtype, name=f"s{si + 2}_fast",
                )(fast)
            if si < 3:
                if cur > 1 and cur % ALPHA == 0:
                    slow, fast = BlockedFuse(
                        dims_out[si] // BETA_INV, cur, self.dtype,
                        name=f"s{si + 2}_fuse",
                    )(slow, fast)
                else:
                    if cur > 1:
                        fast = _reblock(fast, cur, 1)
                        cur = 1
                    slow, fast = FuseFastToSlow(
                        dims_out[si] // BETA_INV, self.dtype,
                        name=f"s{si + 2}_fuse",
                    )(slow, fast)
            # pathway pool after s2 is kernel (1,1,1) for this config — a
            # no-op kept only in the reference's module list
            taps.append(_pool_all(slow, fast, cur))  # 352 704 1408 2304
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

    # fold_norm measured a wash on v5e (XLA already fuses the normalize
    # into the stem conv reads): 3.265 vs 3.124 ms/clip canonical — kept
    # as an option, off by default.
    def __init__(self, dtype=jnp.float32, fast_block=None, fold_norm=False,
                 pallas_stages=False, quant="none"):
        if fast_block is None:
            fast_block = (0, 0, 0, 0, 0)
        self.backbone = SlowFastBackbone(
            dtype=dtype, fast_block=tuple(fast_block),
            fold_norm=bool(fold_norm), pallas_stages=bool(pallas_stages),
            quant=str(quant or "none"),
        )

    def init(self, key, num_frames: int = 32, size: int = 256):
        slow = jnp.zeros((1, num_frames // ALPHA, size, size, 3))
        fast = jnp.zeros((1, num_frames, size, size, 3))
        return self.backbone.init(key, slow, fast)

    def _pathways(self, frames: jnp.ndarray):
        if self.backbone.fold_norm:
            # normalization folded into the stem kernels: raw uint8 frames
            # feed the stems directly (no materialized normalized tensor)
            return pack_pathways(frames)
        return pack_pathways(normalize_frames(frames))

    def apply(self, params, frames: jnp.ndarray) -> List[jnp.ndarray]:
        slow, fast = self._pathways(frames)
        return self.backbone.apply(params, slow, fast)

    def calibrate(self, params, frames: jnp.ndarray):
        """One observation pass (exact fp math) updating the running
        activation maxima in the ``quant`` collection; returns the updated
        variables. Call on one or more representative batches before int8
        inference (the extraction driver calibrates on its first batch)."""
        slow, fast = self._pathways(frames)
        _, upd = self.backbone.apply(
            params, slow, fast, quant_mode="calib", mutable=["quant"]
        )
        merged = dict(params)
        merged["quant"] = upd["quant"]
        return merged

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
