"""Fused ParamNerf MLP as a Pallas TPU kernel.

The conditioned-MLP forward is the render path's arithmetic core: an 8x256
dense chain with a skip concat, a density head, a bottleneck + direction
concat and a color head (reference network/model.py:58-125).  The whole
parameter set is ~2.7 MB — it fits VMEM — so one kernel keeps every weight
and every intermediate activation on-chip for a tile of sample points and
only touches HBM for the input features and the final [tile, 4] output.
XLA fuses much of this already; the kernel removes the remaining activation
round-trips and guarantees MXU-major scheduling.

Usage: `fuse_model(model)` swaps a Model's apply for the fused kernel
(inference only — training keeps the jax-native differentiable apply).
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return -(-x // m) * m


def make_fused_apply(static, interpret: bool = False, tile: int = 2048):
    """Build apply(params, pos, dirs, prms) -> (color [N,3], density [N,1]).

    `static` describes the (already-instantiated) ParamNerf topology:
    dict(pos_fm, dir_fm, param_fm, n_geo, n_app, depth, skips, color_depth,
    param_depth).  Encodings run in XLA (cheap elementwise); the dense chain
    runs in the kernel.
    """
    pos_fm = static["pos_fm"]
    dir_fm = static["dir_fm"]
    param_fm = static["param_fm"]
    n_geo = static["n_geo"]
    n_app = static["n_app"]
    depth = static["depth"]
    skips = tuple(static["skips"])

    def kernel_factory(weight_shapes):
        def kernel(*refs):
            # refs: [pos_map, dir_map, *weights..., out]
            x_ref = refs[0]
            d_ref = refs[1]
            w_refs = refs[2:-1]
            out_ref = refs[-1]

            it = iter(w_refs)

            def dense(h, act=None):
                w = next(it)[:]
                b = next(it)[:]
                y = jnp.dot(h, w, preferred_element_type=jnp.float32) + b[None, :]
                return jax.nn.relu(y) if act == "relu" else y

            pos_map = x_ref[:]
            h = pos_map
            for i in range(depth):
                h = dense(h, "relu")
                if i in skips:
                    h = jnp.concatenate([pos_map, h], -1)
            density = dense(h)                      # [T,1]
            h = dense(h)                            # bottleneck
            h = jnp.concatenate([d_ref[:], h], -1)
            for _ in range(static["color_depth"]):
                h = dense(h, "relu")
            h = dense(h, "relu")                    # pre_color (width//2)
            color = dense(h)                        # [T,3]

            out_ref[:] = jnp.concatenate([color, density], -1)

        return kernel

    def apply(p, pos, dirs, prms):
        # --- encodings + conditioning concat (XLA) ---------------------
        pos_map = pos_fm(pos)
        dir_map = dir_fm(dirs)
        if n_geo > 0:
            g = param_fm(prms[:, :n_geo])
            for layer in p["param_geo"]:
                g = jax.nn.relu(g @ layer["w"] + layer["b"])
            pos_map = jnp.concatenate([pos_map, g], -1)
        if n_app > 0:
            a = param_fm(prms[:, n_geo:])
            for layer in p["param_app"]:
                a = jax.nn.relu(a @ layer["w"] + layer["b"])
            dir_map = jnp.concatenate([dir_map, a], -1)

        n = pos_map.shape[0]
        n_pad = _round_up(max(n, tile), tile)
        if n_pad > n:
            pos_map = jnp.concatenate([pos_map, jnp.zeros((n_pad - n, pos_map.shape[1]))])
            dir_map = jnp.concatenate([dir_map, jnp.zeros((n_pad - n, dir_map.shape[1]))])

        # --- flat weight list in kernel consumption order --------------
        weights = []
        for i in range(depth):
            weights += [p["trunk"][i]["w"], p["trunk"][i]["b"]]
        weights += [p["alpha"]["w"], p["alpha"]["b"]]
        weights += [p["bottleneck"]["w"], p["bottleneck"]["b"]]
        for layer in p["color_layers"]:
            weights += [layer["w"], layer["b"]]
        weights += [p["pre_color"]["w"], p["pre_color"]["b"]]
        weights += [p["color"]["w"], p["color"]["b"]]

        kernel = kernel_factory([w.shape for w in weights])

        grid = (n_pad // tile,)
        in_specs = [
            pl.BlockSpec((tile, pos_map.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, dir_map.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec(w.shape, lambda i, nd=w.ndim: (0,) * nd, memory_space=pltpu.VMEM)
            for w in weights
        ]

        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((tile, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_pad, 4), jnp.float32),
            interpret=interpret,
        )(pos_map, dir_map, *weights)

        return out[:n, :3], out[:n, 3:4]

    return apply


def fuse_model(model, interpret: bool = False, tile: int = 2048):
    """Swap a ParamNerf Model's apply for the fused Pallas kernel (inference).
    Requires the model to carry its static topology (set by the factory)."""
    static = getattr(model, "static_topology", None)
    if static is None:
        raise ValueError("model has no static_topology; build it via network.model.ParamNerf")
    model.apply = make_fused_apply(static, interpret=interpret, tile=tile)
    return model
