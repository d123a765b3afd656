import numpy as np
import jax.numpy as jnp
import pytest
from scipy.signal import resample_poly as scipy_resample_poly

from acav100m_tpu.ops import melspec


def numpy_log_mel_oracle(data, sr=16000, log_offset=0.01,
                         window_secs=0.025, hop_secs=0.010,
                         num_mel_bins=64, fmin=125.0, fmax=7500.0):
    """Straight FFT-based oracle of the published VGGish frontend math."""
    window_length = int(round(sr * window_secs))
    hop_length = int(round(sr * hop_secs))
    fft_length = 2 ** int(np.ceil(np.log(window_length) / np.log(2.0)))
    n = 1 + int(np.floor((len(data) - window_length) / hop_length))
    frames = np.stack([data[i * hop_length: i * hop_length + window_length]
                       for i in range(n)])
    window = 0.5 - 0.5 * np.cos(2 * np.pi / window_length * np.arange(window_length))
    spec = np.abs(np.fft.rfft(frames * window, fft_length))
    mel = spec @ melspec.mel_matrix(num_mel_bins, fft_length // 2 + 1, sr, fmin, fmax)
    return np.log(mel + log_offset)


@pytest.fixture(scope="module")
def wav():
    rng = np.random.RandomState(0)
    t = np.arange(160000) / 16000.0
    x = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.randn(160000)
    return x.astype(np.float32)


class TestLogMel:
    def test_matches_fft_oracle(self, wav):
        got = np.asarray(melspec.log_mel_spectrogram(jnp.asarray(wav)))
        want = numpy_log_mel_oracle(wav.astype(np.float64))
        assert got.shape == want.shape == (998, 64)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    def test_framing_matches_strided(self, wav):
        frames = np.asarray(melspec.frame_signal(jnp.asarray(wav[:4000]), 400, 160))
        n = 1 + (4000 - 400) // 160
        want = np.stack([wav[i * 160: i * 160 + 400] for i in range(n)])
        np.testing.assert_array_equal(frames, want)

    def test_batched(self, wav):
        batch = jnp.stack([jnp.asarray(wav), jnp.asarray(wav) * 0.5])
        got = np.asarray(melspec.log_mel_spectrogram(batch))
        single = np.asarray(melspec.log_mel_spectrogram(jnp.asarray(wav)))
        assert got.shape == (2, 998, 64)
        np.testing.assert_allclose(got[0], single, rtol=1e-5, atol=1e-5)


class TestVggishExamples:
    def test_shapes_10s_clip(self, wav):
        ex = melspec.vggish_examples(jnp.asarray(wav))
        # 10 s @16 kHz -> 998 frames -> 10 full 0.96 s examples
        assert ex.shape == (10, 96, 64)
        assert melspec.vggish_num_examples(160000) == 10

    def test_example_content_matches_log_mel(self, wav):
        ex = np.asarray(melspec.vggish_examples(jnp.asarray(wav)))
        lm = np.asarray(melspec.log_mel_spectrogram(jnp.asarray(wav)))
        np.testing.assert_allclose(ex[3], lm[3 * 96:(3 + 1) * 96], rtol=1e-6)

    def test_valid_mask(self):
        # 2.5 s of real audio in a 10 s padded buffer -> 2 full examples
        mask = np.asarray(
            melspec.example_valid_mask(jnp.asarray(40000), 160000)
        )
        assert mask.shape == (10,)
        np.testing.assert_array_equal(mask, [1, 1] + [0] * 8)
        # degenerate tiny clip still keeps one example
        mask0 = np.asarray(melspec.example_valid_mask(jnp.asarray(100), 160000))
        assert mask0[0] == 1 and mask0.sum() == 1


class TestResample:
    @pytest.mark.parametrize("sr_in", [44100, 48000, 22050])
    def test_matches_scipy(self, sr_in):
        rng = np.random.RandomState(1)
        x = rng.randn(sr_in).astype(np.float64)  # 1 s
        import math
        g = math.gcd(16000, sr_in)
        up, down = 16000 // g, sr_in // g
        got = np.asarray(melspec.resample_poly(jnp.asarray(x), up, down))
        want = scipy_resample_poly(x, up, down)
        assert got.shape == want.shape
        # jax default fp32 vs scipy fp64: bitwise identity holds under x64
        # (tested below); here check fp32-level agreement
        rel_l2 = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert rel_l2 < 5e-3
        np.testing.assert_allclose(got, want, atol=5e-2)

    def test_exact_match_scipy_fp64(self):
        import jax

        rng = np.random.RandomState(1)
        x = rng.randn(44100)
        with jax.enable_x64():
            got = np.asarray(melspec.resample_poly(jnp.asarray(x), 160, 441))
        want = scipy_resample_poly(x, 160, 441)
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)

    def test_identity(self):
        x = jnp.arange(10.0)
        np.testing.assert_array_equal(np.asarray(melspec.resample_poly(x, 3, 3)), np.asarray(x))
