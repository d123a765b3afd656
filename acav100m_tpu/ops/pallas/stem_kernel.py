"""Pallas TPU kernel: SlowFast stem convs as explicit im2col matmuls.

The (kt,7,7)/stride-(1,2,2) stems have 3 input channels — the XLA conv
emitter runs them at ~8-15% of the MXU roofline (measured 58 ms canonical
/ 26.5 ms blocked-T for the fast stem, 16 ms for the slow stem, per
64-clip batch on v5e). This kernel builds the im2col patch matrix
explicitly in VMEM (static slices of a width-paired, pre-padded input)
and runs ONE dense matmul per output tile:

    patches (8 rows x 128 cols, K) @ W2 (K, Cout)
    K = kt_window * 7 * (4 col-pair windows) * 6   (width-paired channels)

Layout plumbing (all in XLA, all cheap reshapes/pads):
  * width pairs: (..., W, 3) -> (..., W/2, 6) — a free minor-dim merge;
    output col x then taps col-pairs x-2..x+1 (4 windows);
  * rows padded 3+13 to 16-block multiples; col-pairs padded 2+1;
  * overlapping input windows come from TWO BlockSpecs per axis offset by
    one block (rows; plus frame-blocks for the blocked-T fast stem) — no
    manual DMA needed.

Outputs match the canonical stem conv exactly (same taps, zero padding in
normalized space); the fast variant emits the blocked-T (a-major) channel
layout consumed by the blocked pathway.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS_OUT = 8  # output rows per tile -> 16 input rows (stride 2)


def _pair_width(x):
    """(..., W, 3) -> (..., W/2, 6), b-major pairing (free reshape)."""
    *lead, w, c = x.shape
    return x.reshape(*lead, w // 2, 2 * c)


def _w2_slow(kernel):
    """(1,7,7,3,Cout) -> (7*4*6, Cout) im2col weights, slice order
    (dy, jw, b, ci)."""
    _, _, _, cin, cout = kernel.shape
    k = kernel[0]  # (7,7,3,Cout)
    rows = []
    for dy in range(7):
        for jw in range(4):
            for b in range(2):
                dx = 2 * jw - 1 + b
                for ci in range(cin):
                    if 0 <= dx < 7:
                        rows.append(k[dy, dx, ci])
                    else:
                        rows.append(jnp.zeros((cout,), kernel.dtype))
    return jnp.stack(rows)  # (168, Cout)


def _w2_fast(kernel, bt):
    """(kt,7,7,3,Cout) -> (TW*7*4*6, bt*Cout) blocked im2col weights.

    Slice order (t_off, dy, jw, b, ci); output channels (a, c) a-major —
    out frame a of a block taps input window offset t_off = a + k_t
    (window start = block start - kt//2)."""
    kt, _, _, cin, cout = kernel.shape
    tw = bt + kt - 1
    rows = []
    zero = jnp.zeros((bt * cout,), kernel.dtype)
    for t_off in range(tw):
        # column (a, c): tap k = t_off - a
        cols = []
        for a in range(bt):
            kk = t_off - a
            if 0 <= kk < kt:
                cols.append(kernel[kk])  # (7,7,3,Cout)
            else:
                cols.append(jnp.zeros_like(kernel[0]))
        kslab = jnp.concatenate(cols, axis=-1)  # (7,7,3, bt*Cout)
        for dy in range(7):
            for jw in range(4):
                for b in range(2):
                    dx = 2 * jw - 1 + b
                    for ci in range(cin):
                        rows.append(kslab[dy, dx, ci]
                                    if 0 <= dx < 7 else zero)
    return jnp.stack(rows)  # (TW*168, bt*Cout)


def _make_kernel(tw, cin6, cout, dtype, cols):
    """tw: temporal window (1 for slow); input refs: tw>1 gets 4 window
    blocks (t/t+1 x rows/rows+1) else 2 (rows/rows+1)."""

    def body(*refs):
        out_ref = refs[-1]
        w_ref = refs[-2]
        if tw == 1:
            win = jnp.concatenate([refs[0][0], refs[1][0]], axis=0)
            win = win[None]  # (1, 32, cols+3, 6)
        else:
            # refs: (j,i), (j,i+1), (j+1,i), (j+1,i+1); [0] -> (bt, 16, ...)
            rows_lo = jnp.concatenate([refs[0][0], refs[2][0]], axis=0)
            rows_hi = jnp.concatenate([refs[1][0], refs[3][0]], axis=0)
            win = jnp.concatenate([rows_lo, rows_hi], axis=1)
            # (2*bt frames, 32 rows, 131, 6)
        pieces = []
        for t in range(tw):
            frame = win[t]  # (32, 131, 6)
            for dy in range(7):
                rows = jax.lax.slice(
                    frame, (dy, 0, 0), (dy + 16, cols + 3, cin6),
                    (2, 1, 1))  # (8, cols+3, 6)
                for jw in range(4):
                    pieces.append(
                        jax.lax.slice(rows, (0, jw, 0),
                                      (ROWS_OUT, jw + cols, cin6))
                    )
        patches = jnp.concatenate(pieces, axis=-1)  # (8, cols, K)
        k = patches.shape[-1]
        y = jnp.dot(
            patches.reshape(ROWS_OUT * cols, k), w_ref[:],
            preferred_element_type=jnp.float32,
        )
        y = y.reshape(ROWS_OUT, cols, cout).astype(dtype)
        if tw == 1:
            out_ref[0] = y
        else:
            out_ref[0, 0] = y

    return body


def _pad_rows_cols(xp):
    """(N..., H, W/2, 6) -> (N..., H+16, W/2+3, 6): rows 3 + 13 (to the
    next 16-block plus the overlap block), col-pairs 2+1."""
    pad = [(0, 0)] * (xp.ndim - 3) + [(3, 13), (2, 1), (0, 0)]
    return jnp.pad(xp, pad)


@functools.partial(jax.jit, static_argnames=("interpret",))
def stem_conv_slow(x, kernel, interpret: bool = False):
    """Canonical (1,7,7)/s(1,2,2) stem conv via im2col matmul.

    x: (B, T, H, W, 3) normalized (H % 16 == 0, W % 16 == 0);
    kernel (1,7,7,3,Cout). Returns (B, T, H/2, W/2, Cout)."""
    b, t, h, w, c = x.shape
    cout = kernel.shape[-1]
    cols = w // 2
    dtype = x.dtype
    xp = _pad_rows_cols(_pair_width(x)).reshape(b * t, h + 16, cols + 3,
                                                2 * c)
    w2 = _w2_slow(kernel).astype(dtype)
    n = b * t
    tiles = (h // 2) // ROWS_OUT
    y = pl.pallas_call(
        _make_kernel(1, 2 * c, cout, dtype, cols),
        grid=(n, tiles),
        in_specs=[
            pl.BlockSpec((1, 16, cols + 3, 2 * c),
                         lambda ni, i: (ni, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, cols + 3, 2 * c),
                         lambda ni, i: (ni, i + 1, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w2.shape, lambda ni, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ROWS_OUT, cols, cout),
                               lambda ni, i: (ni, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h // 2, cols, cout), dtype),
        interpret=interpret,
    )(xp, xp, w2)
    return y.reshape(b, t, h // 2, cols, cout)


@functools.partial(jax.jit, static_argnames=("bt", "interpret"))
def stem_conv_fast_blocked(x, kernel, bt: int, interpret: bool = False):
    """Blocked-T (kt,7,7)/s(bt,2,2) stem conv via im2col matmul.

    x: (B, T, H, W, 3) normalized, T % bt == 0, H/W % 16 == 0;
    kernel (kt,7,7,3,Cout). Returns (B, T/bt, H/2, W/2, bt*Cout),
    channels (a, c) a-major — the layout ``_tblock_conv`` emits."""
    b, t, h, w, c = x.shape
    kt = kernel.shape[0]
    cout = kernel.shape[-1]
    dtype = x.dtype
    tw = bt + kt - 1
    nb = t // bt
    # pad frames: kt//2 in front, then up to one extra frame-block so the
    # j+1 frame-block spec stays in bounds
    t_pad = ((t + kt // 2 + bt - 1) // bt + 1) * bt
    xp = jnp.pad(x, ((0, 0), (kt // 2, t_pad - t - kt // 2), (0, 0),
                     (0, 0), (0, 0)))
    cols = w // 2
    xp = _pad_rows_cols(_pair_width(xp))  # (B, t_pad, H+16, cols+3, 6)
    w2 = _w2_fast(kernel, bt).astype(dtype)
    tiles = (h // 2) // ROWS_OUT
    y = pl.pallas_call(
        _make_kernel(tw, 2 * c, bt * cout, dtype, cols),
        grid=(b, nb, tiles),
        in_specs=[
            pl.BlockSpec((1, bt, 16, cols + 3, 2 * c),
                         lambda bi, j, i: (bi, j, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, 16, cols + 3, 2 * c),
                         lambda bi, j, i: (bi, j, i + 1, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, 16, cols + 3, 2 * c),
                         lambda bi, j, i: (bi, j + 1, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, 16, cols + 3, 2 * c),
                         lambda bi, j, i: (bi, j + 1, i + 1, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w2.shape, lambda bi, j, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, ROWS_OUT, cols, bt * cout),
                               lambda bi, j, i: (bi, j, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nb, h // 2, cols, bt * cout),
                                       dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, xp, xp, xp, w2)
    return y
