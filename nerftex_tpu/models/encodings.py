"""Input encodings: Fourier features + mip-NeRF integrated positional encoding.

Parity targets: reference network/layer.py:8-23 (FourierFeatures — output
layout [x, sin(2^0 x), cos(2^0 x), ..., sin(2^{n-1} x), cos(2^{n-1} x)],
each block spanning all input dims) and network/layer.py:25-41
(IntegratedPositionalEncoding over [mean(3), diag-cov(3)] inputs).

Encodings are stateless pure callables so they can be traced straight into
the fused MLP kernels.
"""

from math import pi

import jax.numpy as jnp


class FourierFeatures:
    """gamma(x) = [x, sin(2^k x)_k, cos(2^k x)_k]; out dim d*(2n+1).

    TPU note: the bands are evaluated as TWO transcendentals on one
    [N, d*n] tensor instead of 2n ops on [N, d] slices — narrow last dims
    pad to the 128-lane register width (a 42x memory expansion at d=3), so
    per-band evaluation wastes VMEM and HBM badly.  Consequently the output
    groups all sin bands then all cos bands (the reference interleaves per
    band, layer.py:14-23) — equivalent up to a permutation of the first
    dense layer's rows, irrelevant for freshly trained weights."""

    def __init__(self, n_freq_bands: int) -> None:
        self.n_freq_bands = int(n_freq_bands)

    def out_dim(self, in_dim: int) -> int:
        return in_dim * (2 * self.n_freq_bands + 1)

    def __call__(self, x):
        parts = self.parts(x)
        if len(parts) == 1:
            return parts[0]
        return jnp.concatenate(parts, -1)

    def parts(self, x):
        """The encoding as unconcatenated blocks [x, sin(xs), cos(xs)].

        Concatenation-free consumers (mlp._dense_cat splits the first
        dense by rows) skip the [N, d(2n+1)]-wide concat materialization
        and its lane padding; the blocks are in concat order, so weights
        are layout-identical either way."""
        x = jnp.asarray(x)
        n = self.n_freq_bands
        if n == 0:
            return [x]
        d = x.shape[-1]
        # Frequency ladder as one [d, n*d] matmul: xs[:, k*d+j] = 2^k x[:, j].
        # (A broadcast-and-reshape builds an [N, n, d] intermediate whose
        # minor dims tile-pad catastrophically; the MXU handles this layout
        # natively.)
        lift = _freq_lift(n, d, x.dtype)
        xs = x @ lift
        return [x, jnp.sin(xs), jnp.cos(xs)]


class IntegratedPositionalEncoding:
    """Expected sin/cos of a diagonal Gaussian (mean, cov) lifted through the
    frequency ladder; input [..., 6] = [mu(3), var(3)], output [N, 6n]."""

    def __init__(self, n_freq_bands: int) -> None:
        self.n_freq_bands = int(n_freq_bands)

    def out_dim(self, in_dim: int) -> int:
        # Defined for the 6-D (mean, var) input only.
        return 6 * self.n_freq_bands

    def __call__(self, x):
        return jnp.concatenate(self.parts(x), -1)

    def parts(self, x):
        """[E sin, E cos] blocks in concat order (see FourierFeatures.parts);
        elementwise identical to the concatenated form."""
        x = jnp.asarray(x)
        n = self.n_freq_bands

        # Frequency lift as matmuls (layout note in FourierFeatures).
        lift = _freq_lift(n, 3, x.dtype)
        y = jnp.reshape(x[..., :3], (-1, 3)) @ lift
        y_var = jnp.reshape(x[..., 3:], (-1, 3)) @ (lift * lift)
        return [expected_sin(y, y_var), expected_sin(y + 0.5 * pi, y_var)]


def expected_sin(x, x_var):
    """E[sin(z)] for z ~ N(x, x_var) (layer.py:40-41)."""
    return jnp.sin(x) * jnp.exp(-0.5 * x_var)


def _freq_lift(n: int, d: int, dtype):
    """Constant [d, n*d] matrix with lift[j, k*d+j] = 2^k."""
    import numpy as np

    m = np.zeros((d, n * d), np.float32)
    for k in range(n):
        for j in range(d):
            m[j, k * d + j] = 2.0**k
    return jnp.asarray(m, dtype)
