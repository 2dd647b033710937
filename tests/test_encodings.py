import numpy as np

from nerftex_tpu.models.encodings import FourierFeatures, IntegratedPositionalEncoding


def test_fourier_features_layout_and_values():
    ff = FourierFeatures(3)
    x = np.array([[0.1, -0.4, 2.0]], np.float32)
    out = np.asarray(ff(x))
    assert out.shape == (1, 3 * (2 * 3 + 1))
    assert ff.out_dim(3) == 21
    # Grouped layout: [x, sin(1x), sin(2x), sin(4x), cos(1x), cos(2x), cos(4x)]
    # (reference interleaves per band; equivalent up to weight permutation —
    # see the FourierFeatures docstring).
    np.testing.assert_allclose(out[0, :3], x[0], atol=1e-6)
    for k, freq in enumerate([1.0, 2.0, 4.0]):
        np.testing.assert_allclose(out[0, 3 + 3 * k : 6 + 3 * k], np.sin(freq * x[0]), atol=1e-6)
        np.testing.assert_allclose(out[0, 12 + 3 * k : 15 + 3 * k], np.cos(freq * x[0]), atol=1e-6)


def test_ipe_zero_variance_reduces_to_sin_cos():
    ipe = IntegratedPositionalEncoding(4)
    mu = np.array([[0.3, -0.2, 0.9]], np.float32)
    x = np.concatenate([mu, np.zeros_like(mu)], -1)
    out = np.asarray(ipe(x))
    assert out.shape == (1, 6 * 4)
    scaled = (mu[0][None, :] * (2.0 ** np.arange(4))[:, None]).reshape(-1)
    np.testing.assert_allclose(out[0, :12], np.sin(scaled), atol=1e-6)
    np.testing.assert_allclose(out[0, 12:], np.cos(scaled), atol=1e-6)


def test_ipe_variance_attenuates_high_freqs():
    ipe = IntegratedPositionalEncoding(6)
    mu = np.array([[0.5, 0.5, 0.5]], np.float32)
    var = np.full_like(mu, 0.3)
    out = np.asarray(ipe(np.concatenate([mu, var], -1)))
    sin_part = out[0, : 3 * 6].reshape(6, 3)
    # Amplitude of band k is exp(-0.5 var 4^k) — strictly decreasing.
    amps = np.abs(sin_part[:, 0]) / np.abs(np.sin(0.5 * 2.0 ** np.arange(6)) + 1e-9)
    assert amps[0] > amps[3] > amps[5]
