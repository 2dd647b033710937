"""Interpolation utilities (bilinear image lookup, n-D grid interp,
gaussian filtering) — jnp re-implementations of reference util/interpolate.py.
"""

import jax
import jax.numpy as jnp


def interpolate_img(x, y_ref):
    """Bilinear interpolation of image `y_ref` [H,W,C] at pixel coords
    `x` [N,2] (row, col) in [0,H-1]x[0,W-1] (util/interpolate.py:4-22).

    Out-of-range corner indices are clamped (the reference relied on
    tf.gather_nd zero-padding; in-range queries are identical)."""
    x = jnp.asarray(x, jnp.float32)
    y_ref = jnp.asarray(y_ref)

    idx00 = jnp.floor(x).astype(jnp.int32)
    w = x - jnp.floor(x)

    h, wd = y_ref.shape[0], y_ref.shape[1]

    def gather(di, dj):
        ii = jnp.clip(idx00[:, 0] + di, 0, h - 1)
        jj = jnp.clip(idx00[:, 1] + dj, 0, wd - 1)
        return y_ref[ii, jj]

    w0, w1 = w[:, :1], w[:, 1:]
    return (
        gather(0, 0) * (1 - w0) * (1 - w1)
        + gather(1, 0) * w0 * (1 - w1)
        + gather(0, 1) * (1 - w0) * w1
        + gather(1, 1) * w0 * w1
    )


def interpolate_nd(x, y_ref):
    """Multilinear interp of `y_ref` (grid over [0,1]^d, shape
    [*grid_dims, C]) at positions `x` [N,d] (util/interpolate.py:24-52)."""
    x = jnp.asarray(x, jnp.float32)
    y_ref = jnp.asarray(y_ref)
    dim = y_ref.ndim - 1

    grid_shape = jnp.asarray(y_ref.shape[:-1], jnp.float32)
    x_scaled = x * (grid_shape - 1)
    idxs = jnp.floor(x_scaled).astype(jnp.int32)
    weights = x_scaled - jnp.floor(x_scaled)

    out = jnp.zeros((x.shape[0], y_ref.shape[-1]), y_ref.dtype)
    for corner in range(2**dim):
        bits = jnp.asarray([(corner >> k) & 1 for k in range(dim)], jnp.int32)
        w = jnp.prod(
            jnp.where(bits.astype(bool), weights, 1 - weights), axis=-1, keepdims=True
        )
        coords = tuple(
            jnp.clip(idxs[:, k] + bits[k], 0, y_ref.shape[k] - 1) for k in range(dim)
        )
        out = out + y_ref[coords] * w
    return out


def gaussian_kernel(size: int, std: float, channels: int = 3):
    """Separable 2-D gaussian as [size,size,channels,1] depthwise filter
    (util/interpolate.py:68-76)."""
    x = jnp.linspace(-(size - 1) / 2, (size - 1) / 2, size) + (
        0.5 if size % 2 == 0 else 0.0
    )
    k1 = jnp.exp(-0.5 * (x / std) ** 2)
    k2 = jnp.outer(k1, k1)
    k2 = k2 / jnp.sum(k2)
    return jnp.repeat(k2[:, :, None, None], channels, axis=2)


def filtered_downsample(img, downsampling_factor: int, std: float = 0.5):
    """Gaussian lowpass + stride-downsample an [H,W,C] image
    (util/interpolate.py:78-82)."""
    img = jnp.asarray(img, jnp.float32)
    c = img.shape[-1]
    size = int(downsampling_factor * std * 6)
    kernel = gaussian_kernel(size, downsampling_factor * std, c)

    # Depthwise conv: NHWC input, HWIO kernel with feature_group_count=C.
    out = jax.lax.conv_general_dilated(
        img[None],
        kernel.transpose(0, 1, 3, 2),  # [H,W,1,C] -> treated per-group below
        window_strides=(downsampling_factor, downsampling_factor),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return out[0]
