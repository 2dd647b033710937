"""Volume-rendering primitives: stratified sampling, alpha compositing,
inverse-CDF importance sampling, cone-segment Gaussians.

Parity targets in reference network/renderer.py:
  - stratified sampling + jitter:        renderer.py:100-111
  - compositing (dists[-1] duplication,  renderer.py:170-213
    alpha = 1-exp(-relu(sigma+noise)*dist*||d||), exclusive-cumprod weights)
  - sample_pdf:                          renderer.py:589-618
  - mip cone Gaussians:                  renderer.py:411-434, 570-587

All functions are pure and fixed-shape; randomness comes in via explicit keys.
"""

import jax
import jax.numpy as jnp


def stratified_z_vals(t, n_samples: int, perturb: bool, key=None):
    """Evenly spaced samples in [t0, t1] per ray, optionally jittered within
    bins (renderer.py:100-111).  t: [R,2] (may contain inf for missed rays —
    sanitize before calling).  Returns z_vals [R, n_samples]."""
    t_vals = jnp.linspace(0.0, 1.0, n_samples, dtype=jnp.float32)
    z_vals = t[:, None, 0] * (1 - t_vals) + t[:, None, 1] * t_vals

    if perturb:
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], -1)
        lower = jnp.concatenate([z_vals[..., :1], mids], -1)
        z_rand = jax.random.uniform(key, z_vals.shape, jnp.float32)
        z_vals = lower + (upper - lower) * z_rand

    return z_vals


def map_color(color_logits, map_exr: bool):
    """Color head mapping: sigmoid to [0,1], or elu+1 for HDR/EXR
    (renderer.py:182-187)."""
    if map_exr:
        return jax.nn.elu(color_logits) + 1.0
    return jax.nn.sigmoid(color_logits)


def composite(
    color_logits,
    density_logits,
    z_vals,
    rays_d,
    composite_bkgd: bool,
    bkgd_color,
    raw_noise_std: float = 0.0,
    noise_key=None,
    map_exr: bool = False,
    repeat_last_dist: bool = True,
):
    """Alpha-composite per-sample model outputs along rays.

    color_logits [R,S,3], density_logits [R,S], z_vals [R,S(+1)], rays_d [R,3].
    With repeat_last_dist=True (Renderer), the final step duplicates the
    previous one instead of using 1e10 (renderer.py:174-177 and the comment
    there about empty backgrounds); with False (MipRenderer), z_vals holds S+1
    fence posts and dists has exactly S entries (renderer.py:440).
    Returns (color_map [R,3], alpha_map [R], weights [R,S], depth_map [R]).
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    if repeat_last_dist:
        dists = jnp.concatenate([dists, dists[..., -1:]], axis=-1)
        z_mid = z_vals
    else:
        z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])

    dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)

    color_map = map_color(color_logits, map_exr)

    noise = 0.0
    if raw_noise_std > 0:
        noise = jax.random.normal(noise_key, density_logits.shape) * raw_noise_std

    alpha = 1.0 - jnp.exp(-jax.nn.relu(density_logits + noise) * dists)
    weights = alpha * exclusive_cumprod(1.0 - alpha + 1e-10)

    color_out = jnp.sum(weights[..., None] * color_map, axis=-2)
    depth_out = jnp.sum(weights * z_mid, axis=-1)
    alpha_out = jnp.sum(weights, -1)

    if composite_bkgd:
        color_out = color_out + (1.0 - alpha_out[..., None]) * jnp.asarray(
            bkgd_color, jnp.float32
        )

    return color_out, alpha_out, weights, depth_out


def composite_precomputed_alpha(
    color_logits,
    density,
    dists,
    color_last,
    alpha_last,
    patch_scale: float,
    composite_bkgd: bool,
    bkgd_color,
    raw_noise_std: float = 0.0,
    noise_key=None,
    map_exr: bool = False,
    false_color=None,
):
    """Instance-renderer compositing: per-sample world-space dists come from
    the instancer, a terminator sample (opaque surface behind the patches) is
    appended, and density is divided by patch_scale (renderer.py:318-354).

    color_logits [R,S,3], density [R,S], dists [R,S], color_last [R,1,3],
    alpha_last [R,1].  Returns (color_map [R,3], alpha_map [R]).
    """
    if false_color is not None:
        color_map = jnp.concatenate([false_color, color_last], axis=1)
    else:
        color_map = jnp.concatenate([map_color(color_logits, map_exr), color_last], axis=1)

    noise = 0.0
    if raw_noise_std > 0:
        noise = jax.random.normal(noise_key, density.shape) * raw_noise_std

    alpha = 1.0 - jnp.exp(-jax.nn.relu(density + noise) * dists / patch_scale)
    alpha_map = jnp.concatenate([alpha, alpha_last], axis=1)

    weights = alpha_map * exclusive_cumprod(1.0 - alpha_map + 1e-10)
    color_out = jnp.sum(weights[..., None] * color_map, axis=-2)
    alpha_out = jnp.sum(weights, -1)

    if composite_bkgd:
        color_out = color_out + (1.0 - alpha_out[..., None]) * jnp.asarray(
            bkgd_color, jnp.float32
        )

    return color_out, alpha_out


def exclusive_cumprod(x):
    """cumprod shifted right with a leading 1 (tf exclusive=True)."""
    return jnp.concatenate(
        [jnp.ones_like(x[..., :1]), jnp.cumprod(x[..., :-1], axis=-1)], axis=-1
    )


def sample_pdf(bins, weights, n_samples: int, det: bool = False, key=None):
    """Inverse-CDF sampling of a piecewise-constant pdf over `bins`
    (renderer.py:589-618).  bins [R,B], weights [R,B-1] -> samples [R,n]."""
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)

    if det:
        u = jnp.linspace(0.0, 1.0, n_samples, dtype=jnp.float32)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        u = jax.random.uniform(key, cdf.shape[:-1] + (n_samples,), jnp.float32)

    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)

    cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
    bins_below = jnp.take_along_axis(bins, below, axis=-1)
    bins_above = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    frac = (u - cdf_below) / denom
    return bins_below + frac * (bins_above - bins_below)


def cone_segment_gaussians(rays_o, rays_d, t_vals, radii):
    """mip-NeRF conical-frustum (mean, diag cov) per segment
    (renderer.py:411-434).  t_vals [R,S+1] fence posts, radii [R,1].
    Returns mean [R,S,3], cov_diag [R,S,3]."""
    t0 = t_vals[..., :-1]
    t1 = t_vals[..., 1:]

    mu = (t0 + t1) / 2
    hw = (t1 - t0) / 2
    # Degenerate segments (mu = hw = 0, e.g. proxy-missing rays whose t was
    # zeroed) make every term below 0/0.  Gate exactly on den == 0 (both
    # terms are non-negative, so den == 0 iff mu = hw = 0): substituting
    # den = 1 there makes every numerator-0 term exactly 0 and NaN-free in
    # forward and gradient, while non-degenerate segments — however tiny —
    # keep the reference formula bit-for-bit (renderer.py:420-422).
    den_raw = 3 * mu**2 + hw**2
    den = jnp.where(den_raw == 0.0, 1.0, den_raw)
    t_mean = mu + (2 * mu * hw**2) / den
    t_var = (hw**2) / 3 - (4 / 15) * ((hw**4 * (12 * mu**2 - hw**2)) / den**2)
    r_var = radii**2 * ((mu**2) / 4 + (5 / 12) * hw**2 - 4 / 15 * (hw**4) / den)

    mean = rays_o[..., None, :] + rays_d[..., None, :] * t_mean[..., None]

    d_mag_sq = jnp.maximum(1e-10, jnp.sum(rays_d**2, axis=-1, keepdims=True))
    d_outer_diag = rays_d**2
    null_outer_diag = 1 - d_outer_diag / d_mag_sq
    t_cov_diag = t_var[..., None] * d_outer_diag[..., None, :]
    xy_cov_diag = r_var[..., None] * null_outer_diag[..., None, :]

    return mean, t_cov_diag + xy_cov_diag


def cone_sample_cov(rays_d, t_vals, radii, dists):
    """Per-sample cone covariance for the instanced mip path
    (renderer.py:570-587).  All inputs flat [N] / [N,3]; returns [N,3]."""
    mu = t_vals
    hw = dists
    den_raw = 3 * mu**2 + hw**2
    den = jnp.where(den_raw == 0.0, 1.0, den_raw)  # exact 0/0 gate, see above
    t_var = (hw**2) / 3 - (4 / 15) * ((hw**4 * (12 * mu**2 - hw**2)) / den**2)
    r_var = radii**2 * ((mu**2) / 4 + (5 / 12) * hw**2 - 4 / 15 * (hw**4) / den)

    d_mag_sq = jnp.maximum(1e-10, jnp.sum(rays_d**2, axis=-1, keepdims=True))
    d_outer_diag = rays_d**2
    null_outer_diag = 1 - d_outer_diag / d_mag_sq
    return t_var[:, None] * d_outer_diag + r_var[:, None] * null_outer_diag


def mean_distance(mu, hw):
    """Mean distance of a cone segment, used with use_mean_distance
    (instancer.cpp:746-748)."""
    return mu + 2 * mu * hw**2 / (3 * mu**2 + hw**2)
