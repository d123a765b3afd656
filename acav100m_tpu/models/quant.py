"""Post-training int8 quantization for the extraction conv stacks.

Why int8 on TPU: the measured per-stage roofline (PARITY.md) shows the
SlowFast extraction model predominantly HBM-bandwidth-bound (most stages at
60-99% of the v5e bandwidth wall) with the two MXU-bound stages at 59-70%
MFU. int8 doubles BOTH walls at once: activations stored in HBM shrink 2x
vs bf16, and the v5e MXU runs int8 matmuls at 2x the bf16 rate (394 vs 197
TOPS). This is the "documented-numerics option, parity flag off" lever
named in PARITY.md — it changes feature values at the ~1e-2 relative level,
so it is never used for bit-match-eligible runs.

Design (static calibration, the TPU-native shape of the problem):

* **Weights**: symmetric per-output-channel int8, quantized from the f32
  checkpoint params at apply time (O(weights) work, constant-folded into
  the step's prologue by XLA; no separate converted checkpoint to manage).
* **Activations**: symmetric per-tensor int8 with **static** scales learned
  by a one-batch calibration pass (running abs-max observers in a `quant`
  flax collection). Static scales are the load-bearing choice: a dynamic
  per-batch max would need a full extra read of every activation tensor
  before its consumer conv starts, forfeiting exactly the bandwidth the
  int8 layout buys. With static scales the quantize step is pointwise, XLA
  fuses it into the producing op's epilogue, and the tensor that lands in
  HBM is int8 end-to-end within a stage.
* Convs accumulate in int32 (``preferred_element_type``), dequantize with
  the scalar ``sx * sw[c]`` product into the BN+ReLU epilogue, and the
  block's output observer immediately requantizes for the next block — so
  inter-block traffic inside a quantized stage is int8 too.

Reference counterpart: none — the reference extracts in f32/f16 CUDA
(``feature_extraction/code/models/slowfast.py:31-157``); this is a
TPU-roofline-motivated extension with measured numerics deltas
(``tests/test_quant.py``).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# Quantization modes threaded through the backbone call:
#   'none'  — fp path, quant machinery inert (default; bit-identical to the
#             canonical modules)
#   'calib' — fp path + abs-max observers write running maxima into the
#             mutable 'quant' collection
#   'int8'  — quantized path using the frozen observer scales
MODES = ("none", "calib", "int8")


def weight_qparams(kernel: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int8 quantization of a conv kernel.

    kernel: (..., Cout) — reduction over every axis but the last.
    Returns (int8 kernel, f32 per-channel scale) with kernel ≈ q * scale.
    """
    amax = jnp.max(jnp.abs(kernel), axis=tuple(range(kernel.ndim - 1)))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(kernel / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def quantize_act(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Pointwise fp -> int8 with a static per-tensor scale (fusable)."""
    return jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale), -127, 127
    ).astype(jnp.int8)


class ActObserver(nn.Module):
    """Per-site activation scale: records abs-max in 'calib' mode, returns
    the frozen scale in 'int8' mode. One scalar variable per conv input in
    the ``quant`` collection."""

    @nn.compact
    def __call__(self, x: Optional[jnp.ndarray], mode: str):
        amax = self.variable(
            "quant", "amax", lambda: jnp.zeros((), jnp.float32)
        )
        if mode == "calib" and x is not None:
            # running max across calibration batches; is_initializing guard
            # keeps init() from tracing a spurious max over zeros
            if not self.is_initializing():
                amax.value = jnp.maximum(
                    amax.value, jnp.max(jnp.abs(x)).astype(jnp.float32)
                )
            return None
        return jnp.maximum(amax.value, 1e-12) / 127.0


def qconv(
    xq: jnp.ndarray,
    sx: jnp.ndarray,
    kernel: jnp.ndarray,
    conv_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    out_dtype: Any = jnp.float32,
) -> jnp.ndarray:
    """int8 conv + dequantize: conv_fn must accumulate in int32
    (``preferred_element_type=jnp.int32``); the (sx*sw) rescale broadcasts
    per output channel and fuses into the consumer epilogue."""
    wq, sw = weight_qparams(kernel)
    y = conv_fn(xq, wq)
    return (y.astype(jnp.float32) * (sx * sw)).astype(out_dtype)


def conv3d_int8(
    strides: Tuple[int, int, int],
    padding,
) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """NDHWC/DHWIO int8 conv closure with int32 accumulation."""

    def fn(xq, wq):
        return jax.lax.conv_general_dilated(
            xq, wq, window_strides=strides, padding=padding,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.int32,
        )

    return fn
