import numpy as np
import jax

from nerftex_tpu.ops import volume


def test_stratified_z_vals_unperturbed_are_linspace():
    t = np.array([[2.0, 4.0], [0.0, 1.0]], np.float32)
    z = np.asarray(volume.stratified_z_vals(t, 5, False))
    np.testing.assert_allclose(z[0], np.linspace(2, 4, 5), atol=1e-6)
    np.testing.assert_allclose(z[1], np.linspace(0, 1, 5), atol=1e-6)


def test_stratified_z_vals_perturbed_stay_in_bins():
    t = np.array([[1.0, 3.0]], np.float32)
    key = jax.random.key(0)
    z = np.asarray(volume.stratified_z_vals(t, 64, True, key))
    base = np.linspace(1, 3, 64)
    mids = 0.5 * (base[1:] + base[:-1])
    lower = np.concatenate([[base[0]], mids])
    upper = np.concatenate([mids, [base[-1]]])
    assert np.all(z[0] >= lower - 1e-6) and np.all(z[0] <= upper + 1e-6)


def test_composite_weights_sum_to_absorption():
    # weights sum = 1 - prod(1-alpha): transmittance identity.
    rng = np.random.RandomState(1)
    color = rng.normal(size=(4, 16, 3)).astype(np.float32)
    density = rng.uniform(0, 50, (4, 16)).astype(np.float32)
    z = np.sort(rng.uniform(0, 1, (4, 16)), axis=-1).astype(np.float32)
    rays_d = rng.normal(size=(4, 3)).astype(np.float32)
    _, alpha_map, weights, _ = volume.composite(color, density, z, rays_d, False, [1, 1, 1.0])
    weights = np.asarray(weights)
    dists = np.diff(z, axis=-1)
    dists = np.concatenate([dists, dists[:, -1:]], -1) * np.linalg.norm(rays_d, axis=-1, keepdims=True)
    alphas = 1 - np.exp(-np.maximum(density, 0) * dists)
    expected = 1 - np.prod(1 - alphas + 1e-10, axis=-1)
    np.testing.assert_allclose(np.asarray(alpha_map), expected, atol=1e-4)
    np.testing.assert_allclose(weights.sum(-1), expected, atol=1e-4)


def test_composite_matches_analytic_integral():
    # Homogeneous medium sigma with constant color c over [0, L]:
    # alpha = 1 - exp(-sigma L); color = c * alpha.
    sigma, L, n = 3.0, 1.0, 4096
    z = np.linspace(0, L, n, dtype=np.float32)[None]
    color_logit = np.zeros((1, n, 3), np.float32)  # sigmoid -> 0.5
    density = np.full((1, n), sigma, np.float32)
    rays_d = np.array([[0, 0, 1.0]], np.float32)
    color_map, alpha_map, _, _ = volume.composite(color_logit, density, z, rays_d, False, [1, 1, 1.0])
    expected_alpha = 1 - np.exp(-sigma * L * n / (n - 1))  # last dist repeated
    np.testing.assert_allclose(np.asarray(alpha_map)[0], expected_alpha, atol=1e-3)
    np.testing.assert_allclose(np.asarray(color_map)[0], 0.5 * expected_alpha, atol=1e-3)


def test_composite_background():
    color = np.zeros((1, 4, 3), np.float32)
    density = np.zeros((1, 4), np.float32)  # fully transparent
    z = np.linspace(0, 1, 4, dtype=np.float32)[None]
    rays_d = np.array([[0, 0, 1.0]], np.float32)
    color_map, alpha_map, _, _ = volume.composite(
        color, density, z, rays_d, True, [0.2, 0.4, 0.6]
    )
    np.testing.assert_allclose(np.asarray(color_map)[0], [0.2, 0.4, 0.6], atol=1e-5)
    np.testing.assert_allclose(np.asarray(alpha_map)[0], 0.0, atol=1e-6)


def test_sample_pdf_matches_numpy_inverse_cdf():
    rng = np.random.RandomState(0)
    bins = np.sort(rng.uniform(0, 1, (2, 9)), -1).astype(np.float32)
    weights = rng.uniform(0.1, 1, (2, 8)).astype(np.float32)
    out = np.asarray(volume.sample_pdf(bins, weights, 16, det=True))

    w = weights + 1e-5
    pdf = w / w.sum(-1, keepdims=True)
    cdf = np.concatenate([np.zeros((2, 1)), np.cumsum(pdf, -1)], -1)
    u = np.linspace(0, 1, 16)
    for r in range(2):
        inds = np.searchsorted(cdf[r], u, side="right")
        below = np.maximum(0, inds - 1)
        above = np.minimum(cdf.shape[-1] - 1, inds)
        denom = cdf[r][above] - cdf[r][below]
        denom = np.where(denom < 1e-5, 1.0, denom)
        frac = (u - cdf[r][below]) / denom
        expected = bins[r][below] + frac * (bins[r][above] - bins[r][below])
        np.testing.assert_allclose(out[r], expected, atol=1e-5)


def test_sample_pdf_concentrates_on_high_weight_bins():
    bins = np.linspace(0, 1, 11, dtype=np.float32)[None]
    weights = np.zeros((1, 10), np.float32)
    weights[0, 7] = 100.0  # nearly all mass in bin [0.7, 0.8]
    out = np.asarray(volume.sample_pdf(bins, weights, 64, det=False, key=jax.random.key(1)))
    assert ((out >= 0.69) & (out <= 0.81)).mean() > 0.9


def test_cone_segment_gaussians_shapes_and_centering():
    rays_o = np.zeros((3, 3), np.float32)
    rays_d = np.tile(np.array([[0, 0, 1.0]], np.float32), (3, 1))
    t_vals = np.tile(np.linspace(1, 2, 9, dtype=np.float32)[None], (3, 1))
    radii = np.full((3, 1), 0.01, np.float32)
    mean, cov = volume.cone_segment_gaussians(rays_o, rays_d, t_vals, radii)
    assert mean.shape == (3, 8, 3) and cov.shape == (3, 8, 3)
    # Mean z is within each segment and biased past the midpoint.
    mean = np.asarray(mean)
    assert np.all(mean[:, :, 2] > t_vals[:, :-1]) and np.all(mean[:, :, 2] < t_vals[:, 1:])
    mids = 0.5 * (t_vals[:, :-1] + t_vals[:, 1:])
    assert np.all(mean[:, :, 2] >= mids - 1e-6)
    assert np.all(np.asarray(cov) >= 0)


def test_mean_distance_formula():
    np.testing.assert_allclose(
        float(volume.mean_distance(2.0, 0.1)), 2 + 2 * 2 * 0.01 / (12 + 0.01), atol=1e-6
    )
