"""GEMM-native log-mel spectrogram frontend.

Numerically mirrors the VGGish frontend of the reference
(``feature_extraction/code/models/utils_vggish/mel_features.py:21-223`` and
``preprocess.py:14-96``: framing, periodic Hann, |rfft|, HTK mel filterbank,
log(mel + 0.01), 0.96 s example framing) but is designed for the TPU rather
than translated:

* **No FFT.** The STFT is expressed as two matmuls against precomputed
  windowed cos/sin DFT bases, so the whole frontend is
  ``frames @ [C|S] -> |.| -> @ mel`` — three GEMMs that ride the MXU and
  fuse with the downstream conv stack under one ``jit``. For VGGish sizes
  (window 400, fft 512, 64 mel bins) this is far cheaper than small batched
  FFTs on TPU.
* **No strided tricks.** Overlapping frames are built from ``ceil(win/hop)``
  shifted reshapes + concat — pure layout ops with static shapes.
* **Static shapes everywhere**: clip length, window, hop are compile-time
  constants; short clips are zero-padded and masked by the caller.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Architectural constants of the VGGish frontend
# (reference preprocess.py:16-29).
SAMPLE_RATE = 16000
STFT_WINDOW_SECONDS = 0.025
STFT_HOP_SECONDS = 0.010
NUM_MEL_BINS = 64
MEL_MIN_HZ = 125.0
MEL_MAX_HZ = 7500.0
LOG_OFFSET = 0.01
EXAMPLE_WINDOW_SECONDS = 0.96
EXAMPLE_HOP_SECONDS = 0.96

_MEL_BREAK_FREQUENCY_HERTZ = 700.0
_MEL_HIGH_FREQUENCY_Q = 1127.0


def hertz_to_mel(frequencies_hertz):
    """HTK mel scale (reference mel_features.py:100-111)."""
    return _MEL_HIGH_FREQUENCY_Q * np.log(
        1.0 + (np.asarray(frequencies_hertz, dtype=np.float64) / _MEL_BREAK_FREQUENCY_HERTZ)
    )


def periodic_hann(window_length: int) -> np.ndarray:
    """Periodic (DFT-even) Hann window (reference mel_features.py:48-68)."""
    return 0.5 - 0.5 * np.cos(
        2.0 * np.pi / window_length * np.arange(window_length)
    )


@functools.lru_cache(maxsize=None)
def mel_matrix(
    num_mel_bins: int = NUM_MEL_BINS,
    num_spectrogram_bins: int = 257,
    audio_sample_rate: int = SAMPLE_RATE,
    lower_edge_hertz: float = MEL_MIN_HZ,
    upper_edge_hertz: float = MEL_MAX_HZ,
) -> np.ndarray:
    """HTK triangular mel filterbank, (num_spectrogram_bins, num_mel_bins).

    Same construction as reference mel_features.py:114-189, DC bin zeroed.
    """
    nyquist = audio_sample_rate / 2.0
    if lower_edge_hertz < 0.0 or lower_edge_hertz >= upper_edge_hertz:
        raise ValueError("bad mel edges")
    if upper_edge_hertz > nyquist:
        raise ValueError("upper_edge_hertz above Nyquist")
    spectrogram_bins_hertz = np.linspace(0.0, nyquist, num_spectrogram_bins)
    spectrogram_bins_mel = hertz_to_mel(spectrogram_bins_hertz)
    band_edges_mel = np.linspace(
        hertz_to_mel(lower_edge_hertz), hertz_to_mel(upper_edge_hertz),
        num_mel_bins + 2,
    )
    weights = np.empty((num_spectrogram_bins, num_mel_bins))
    for i in range(num_mel_bins):
        lower, center, upper = band_edges_mel[i : i + 3]
        lower_slope = (spectrogram_bins_mel - lower) / (center - lower)
        upper_slope = (upper - spectrogram_bins_mel) / (upper - center)
        weights[:, i] = np.maximum(0.0, np.minimum(lower_slope, upper_slope))
    weights[0, :] = 0.0
    return weights


@functools.lru_cache(maxsize=None)
def windowed_dft_bases(window_length: int, fft_length: int) -> Tuple[np.ndarray, np.ndarray]:
    """(window x bins) cos/sin bases with the Hann window folded in.

    ``frames @ cos_basis`` == Re(rfft(frames * hann, fft_length)) and
    likewise for -Im — so STFT magnitude becomes two MXU matmuls.
    """
    bins = fft_length // 2 + 1
    n = np.arange(window_length)[:, None]
    k = np.arange(bins)[None, :]
    angle = 2.0 * np.pi * n * k / fft_length
    window = periodic_hann(window_length)[:, None]
    cos_b = np.cos(angle) * window
    sin_b = -np.sin(angle) * window
    return cos_b, sin_b


def num_frames(num_samples: int, window_length: int, hop_length: int) -> int:
    return 1 + int(np.floor((num_samples - window_length) / hop_length))


def frame_signal(x: jnp.ndarray, window_length: int, hop_length: int) -> jnp.ndarray:
    """Overlapping frames of the last axis via shifted reshapes (no gather).

    x: (..., num_samples) -> (..., num_frames, window_length); static shapes.
    """
    num_samples = x.shape[-1]
    nf = num_frames(num_samples, window_length, hop_length)
    nshift = math.ceil(window_length / hop_length)
    needed = (nf - 1 + nshift) * hop_length
    if needed > num_samples:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, needed - num_samples)]
        x = jnp.pad(x, pad)
    views = []
    for k in range(nshift):
        v = jax.lax.slice_in_dim(x, k * hop_length, (nf + k) * hop_length, axis=-1)
        views.append(v.reshape(*x.shape[:-1], nf, hop_length))
    frames = jnp.concatenate(views, axis=-1)
    return jax.lax.slice_in_dim(frames, 0, window_length, axis=-1)


def stft_magnitude(
    signal: jnp.ndarray,
    fft_length: int,
    hop_length: int,
    window_length: int,
) -> jnp.ndarray:
    """|STFT| via the GEMM formulation. signal: (..., S) -> (..., F, bins)."""
    frames = frame_signal(signal, window_length, hop_length)
    cos_b, sin_b = windowed_dft_bases(window_length, fft_length)
    dtype = frames.dtype
    basis = jnp.asarray(np.concatenate([cos_b, sin_b], axis=1), dtype=dtype)
    # HIGHEST: the DFT projection must accumulate in fp32 — the TPU default
    # bf16 matmul loses ~1e-2 relative, which log() amplifies on quiet bins.
    proj = jnp.matmul(
        frames,
        basis,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    bins = fft_length // 2 + 1
    re, im = proj[..., :bins], proj[..., bins:]
    return jnp.sqrt(re * re + im * im)


def log_mel_spectrogram(
    signal: jnp.ndarray,
    audio_sample_rate: int = SAMPLE_RATE,
    log_offset: float = LOG_OFFSET,
    window_length_secs: float = STFT_WINDOW_SECONDS,
    hop_length_secs: float = STFT_HOP_SECONDS,
    num_mel_bins: int = NUM_MEL_BINS,
    lower_edge_hertz: float = MEL_MIN_HZ,
    upper_edge_hertz: float = MEL_MAX_HZ,
) -> jnp.ndarray:
    """(..., S) waveform -> (..., F, num_mel_bins) log-mel.

    Same parameterization as reference mel_features.py:192-223.
    """
    window_length = int(round(audio_sample_rate * window_length_secs))
    hop_length = int(round(audio_sample_rate * hop_length_secs))
    fft_length = 2 ** int(np.ceil(np.log(window_length) / np.log(2.0)))
    spec = stft_magnitude(signal, fft_length, hop_length, window_length)
    mel = jnp.asarray(
        mel_matrix(
            num_mel_bins=num_mel_bins,
            num_spectrogram_bins=fft_length // 2 + 1,
            audio_sample_rate=audio_sample_rate,
            lower_edge_hertz=lower_edge_hertz,
            upper_edge_hertz=upper_edge_hertz,
        ),
        dtype=spec.dtype,
    )
    return jnp.log(
        jnp.matmul(
            spec,
            mel,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        + log_offset
    )


def vggish_num_examples(num_samples: int, sample_rate: int = SAMPLE_RATE) -> int:
    window_length = int(round(sample_rate * STFT_WINDOW_SECONDS))
    hop_length = int(round(sample_rate * STFT_HOP_SECONDS))
    nf = num_frames(num_samples, window_length, hop_length)
    example_len = int(round(EXAMPLE_WINDOW_SECONDS / STFT_HOP_SECONDS))
    example_hop = int(round(EXAMPLE_HOP_SECONDS / STFT_HOP_SECONDS))
    return 1 + int(np.floor((nf - example_len) / example_hop))


def vggish_examples(signal_16k: jnp.ndarray) -> jnp.ndarray:
    """16 kHz mono waveform (..., S) -> (..., N, 96, 64) log-mel examples.

    Mirrors reference preprocess.py:58-89 (0.96 s non-overlapping windows).
    """
    log_mel = log_mel_spectrogram(signal_16k)
    example_len = int(round(EXAMPLE_WINDOW_SECONDS / STFT_HOP_SECONDS))  # 96
    example_hop = int(round(EXAMPLE_HOP_SECONDS / STFT_HOP_SECONDS))  # 96
    nf = log_mel.shape[-2]
    n_examples = 1 + int(np.floor((nf - example_len) / example_hop))
    if n_examples < 1:
        raise ValueError(f"too few frames ({nf}) for one 0.96 s example")
    used = (n_examples - 1) * example_hop + example_len
    log_mel = jax.lax.slice_in_dim(log_mel, 0, used, axis=-2)
    # non-overlapping hop == window -> plain reshape
    return log_mel.reshape(
        *log_mel.shape[:-2], n_examples, example_len, log_mel.shape[-1]
    )


def example_valid_mask(
    valid_samples: jnp.ndarray, total_samples: int, sample_rate: int = SAMPLE_RATE
) -> jnp.ndarray:
    """Mask of VGGish examples fully covered by ``valid_samples`` of audio.

    Lets zero-padded short clips keep static shapes: downstream means use
    ``sum(x*mask)/sum(mask)`` instead of the reference's ragged batches.
    Always keeps at least one example (reference guarantees >= 1 frame).
    """
    n_examples = vggish_num_examples(total_samples, sample_rate)
    samples_per_example = int(round(EXAMPLE_WINDOW_SECONDS * sample_rate))
    idx = jnp.arange(n_examples)
    full = (idx + 1) * samples_per_example <= valid_samples[..., None]
    first = idx == 0
    return jnp.logical_or(full, first).astype(jnp.float32)


# -- resampling ---------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _resample_filter(up: int, down: int, window=("kaiser", 5.0)) -> np.ndarray:
    """Polyphase anti-aliasing FIR (scipy's resample_poly design)."""
    from scipy.signal import firwin

    max_rate = max(up, down)
    f_c = 1.0 / max_rate
    half_len = 10 * max_rate
    h = firwin(2 * half_len + 1, f_c, window=window)
    return (h * up).astype(np.float64)


def resample_poly(x: jnp.ndarray, up: int, down: int) -> jnp.ndarray:
    """Polyphase resampling as a single dilated conv (XLA-native).

    Equivalent to ``scipy.signal.resample_poly(x, up, down)``: upsample by
    zero-stuffing (lhs dilation), FIR low-pass, decimate via conv stride.
    x: (..., S) -> (..., ceil(S*up/down)).
    """
    g = math.gcd(up, down)
    up, down = up // g, down // g
    if up == down == 1:
        return x
    h = _resample_filter(up, down)
    n_out = -(-x.shape[-1] * up // down)  # ceil
    half = (len(h) - 1) // 2
    lead = x.reshape(-1, 1, x.shape[-1])  # N C W
    kernel = jnp.asarray(h[::-1].copy(), dtype=x.dtype).reshape(1, 1, -1)
    out = jax.lax.conv_general_dilated(
        lead.astype(kernel.dtype),
        kernel,
        window_strides=(down,),
        padding=[(half, half + down * n_out)],
        lhs_dilation=(up,),
        dimension_numbers=("NCW", "OIW", "NCW"),
    )
    out = out[..., :n_out]
    return out.reshape(*x.shape[:-1], n_out)
