"""Pallas TPU kernel: fused per-frame ResNet bottleneck STAGE.

The XLA path runs each bottleneck conv as its own HBM round trip: at
production shapes the s2/s3 slow stages of SlowFast (kt=1, so every conv
is per-frame) move ~15 GB/batch through HBM and measure ~30 ms each on a
v5e — 5x their compute roofline (VERDICT round-1 task 4; reference arch
``feature_extraction/code/models/slowfast.py:31-157``).

This kernel keeps ONE FRAME resident in VMEM and runs the whole stage on
it — every bottleneck (a 1x1 -> b 3x3 -> c 1x1 + shortcut, BN folded into
conv scales/biases, inference mode) — so HBM traffic collapses to
read-x-once + write-out-once:

    grid = (N,)   # N = B*T folded frames
    x_frame (H, W, Cin) -> [block0: a,b,c,proj] -> ... -> (Ho, Wo, Cout)

The 3x3 convs are 9 shifted matmuls on the zero-padded frame; stride-2
first blocks subsample with static slices. All matmuls accumulate in f32
on the MXU (``preferred_element_type``), intermediate activations stay in
the compute dtype.

Restrictions: temp_kernel == 1 (true for SlowFast s2/s3 slow — the only
stages this is wired to), frame + weights fit VMEM (<= ~8 MB at
production 64x64 frames).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv3x3(h, w9, stride):
    """h: (H, W, C) -> (H/stride, W/stride, Cout) via 9 shifted matmuls.

    w9: (3, 3, C, Cout). Zero 'same' padding; stride applied by static
    subsampling of the shifted views (polyphase on the row axis; the
    column axis uses a reshaped static select to stay Mosaic-friendly).
    """
    hh, ww, c = h.shape
    cout = w9.shape[-1]
    ho, wo = hh // stride, ww // stride
    hp = jnp.pad(h, ((1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((ho * wo, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            src = jax.lax.slice(
                hp, (dy, dx, 0), (dy + hh, dx + ww, c)
            )  # (H, W, C) shifted view
            if stride != 1:
                src = src.reshape(ho, stride, wo, stride, c)[:, 0, :, 0, :]
            acc = acc + jnp.dot(
                src.reshape(ho * wo, c), w9[dy, dx],
                preferred_element_type=jnp.float32,
            )
    return acc  # (Ho*Wo, Cout) f32


def _make_kernel(specs: Sequence[Dict], stride: int, dtype):
    """Build the stage kernel body for a static list of block specs.

    specs[i]: {"proj": bool} — block i has a projection shortcut.
    Ref order: x, then per block [aw, ab, bw, bb, cw, cb, (pw, pb)], out.
    """

    def kernel(x_ref, *refs):
        out_ref = refs[-1]
        h = x_ref[0]  # (H, W, Cin)
        ri = 0
        s = stride
        for bi, spec in enumerate(specs):
            aw, ab, bw, bb, cw, cb = refs[ri : ri + 6]
            ri += 6
            hh, ww, c = h.shape
            h2d = h.reshape(hh * ww, c)
            ho, wo = hh // s, ww // s
            if spec["proj"]:
                pw, pb = refs[ri : ri + 2]
                ri += 2
                if s != 1:
                    xs = h.reshape(ho, s, wo, s, c)[:, 0, :, 0, :]
                    xs = xs.reshape(ho * wo, c)
                else:
                    xs = h2d
                shortcut = (
                    jnp.dot(xs, pw[:], preferred_element_type=jnp.float32)
                    + pb[:]
                )
            else:
                shortcut = h2d.astype(jnp.float32)
            a = jnp.dot(h2d, aw[:], preferred_element_type=jnp.float32) + ab[:]
            a = jnp.maximum(a, 0.0).astype(dtype)
            b = _conv3x3(a.reshape(hh, ww, -1), bw[:], s) + bb[:]
            b = jnp.maximum(b, 0.0).astype(dtype)
            cc = jnp.dot(b, cw[:], preferred_element_type=jnp.float32) + cb[:]
            h = jnp.maximum(cc + shortcut, 0.0).astype(dtype)
            h = h.reshape(ho, wo, -1)
            s = 1  # stride only on the first block
        out_ref[0] = h

    return kernel


def fold_bn(scale, bias, mean, var, eps=1e-5):
    """Inference BN -> (mul, add) per channel."""
    mul = scale / jnp.sqrt(var + eps)
    return mul, bias - mean * mul


@functools.partial(jax.jit, static_argnames=("stride", "interpret"))
def fused_stage(x, blocks: Sequence[Dict], stride: int = 1,
                interpret: bool = False):
    """Run a kt=1 bottleneck stage over folded frames.

    x: (N, H, W, Cin) compute-dtype array (N = batch*frames).
    blocks: per-block dict of BN-folded weights —
      aw (Cin_i, inner), ab (inner,), bw (3, 3, inner, inner), bb,
      cw (inner, Cout), cb, and optionally pw (Cin_i, Cout), pb.
    stride: spatial stride of block 0.
    """
    n, hh, ww, cin = x.shape
    cout = blocks[0]["cw"].shape[-1]
    ho, wo = hh // stride, ww // stride
    dtype = x.dtype

    specs = [{"proj": "pw" in b} for b in blocks]
    operands = []
    in_specs = [
        pl.BlockSpec((1, hh, ww, cin), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM)
    ]

    def add_w(w):
        w = jnp.asarray(w)
        operands.append(w.astype(dtype) if w.ndim > 1 else w.astype(jnp.float32))
        in_specs.append(
            pl.BlockSpec(w.shape, lambda i: (0,) * w.ndim,
                         memory_space=pltpu.VMEM)
        )

    for b in blocks:
        for key in ("aw", "ab", "bw", "bb", "cw", "cb"):
            add_w(b[key])
        if "pw" in b:
            add_w(b["pw"])
            add_w(b["pb"])

    kernel = _make_kernel(specs, stride, dtype)
    flops = 0
    c_prev = cin
    inner = blocks[0]["aw"].shape[-1]
    for b in blocks:
        inner = b["aw"].shape[-1]
        flops += 2 * ho * wo * (
            b["aw"].shape[0] * inner + 9 * inner * inner + inner * cout
        )
        if "pw" in b:
            flops += 2 * ho * wo * b["pw"].shape[0] * cout
        c_prev = cout
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, ho, wo, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, ho, wo, cout), dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops * n,
            bytes_accessed=x.size * x.dtype.itemsize
            + n * ho * wo * cout * x.dtype.itemsize,
            transcendentals=0,
        ),
        # the whole-frame working set exceeds the default 16 MB scoped
        # limit; v5e has 128 MiB physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, *operands)
