"""Conditioned NeRF MLPs as pure pytrees + jit-traceable apply functions.

Parity targets (topology, widths, skip placement, activation choices):
  - Nerf:       reference network/model.py:9-45
  - CoarseFine: reference network/model.py:47-56
  - ParamNerf:  reference network/model.py:58-125 (geometry params joined to
    the position features, appearance params joined to the direction features,
    optional param_depth MLPs, color_depth extra layers, n_pos=6 IPE variant)

Design: a factory returns {name: Model}; Model.params is a pytree of dense
layers (glorot-uniform kernels / zero biases, matching keras Dense defaults)
and Model.apply(params, pos, dirs, prms) -> (color_logits [N,3],
density_logit [N,1]) is a pure function — the training loop differentiates
through it and renderers jit it.  Heads emit raw logits; sigmoid/elu mapping
happens in the renderer (renderer.py:182-187), as in the reference.
"""

import os
from typing import Union

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from nerftex_tpu.utils import util
from nerftex_tpu.utils.util import EasyDict
from nerftex_tpu.utils import rng

# Counter so successive factory calls (e.g. CoarseFine's two models) get
# distinct-but-deterministic init keys under one global seed.
_INIT_COUNTER = [0]

# Feed encoder outputs to the consumer denses as unconcatenated BLOCKS
# ([x, sin(xs), cos(xs)] from FourierFeatures.parts) instead of one
# concatenated [N, d(2n+1)] tensor: _dense_cat already splits every dense
# by weight rows, so the encoding concat — a lane-padded materialization
# (51 -> 128 lanes at the carpet dims) in PERF.md §1.4's
# sine_convert_fusion family — never needs to exist.  Weight layout is
# unchanged (blocks are in concat order), so checkpoints transfer; partial
# sums associate differently than the concat matmul (~1 ulp, same family
# as _dense_cat itself).  Default OFF pending the round-5 train A/B.
_ENC_PARTS = os.environ.get("NERFTEX_ENC_PARTS", "0") == "1"


def _enc(x):
    """Tag an encoder output for the remat policy (renderer.chunked_apply
    with remat="save_encodings"): the frequency lift + sin/cos + dtype
    convert chain (PERF.md §1.4's sine_convert_fusion family) is saved in
    the forward and NOT recomputed in the backward, while dense-layer
    activations still remat.  A no-op for every other remat setting."""
    return checkpoint_name(x, "encoding")


def _enc_blocks(fm, x, cdt):
    """Encoder output as a list of checkpoint-tagged blocks (see
    _ENC_PARTS); falls back to the single concatenated tensor."""
    if _ENC_PARTS and hasattr(fm, "parts"):
        return [_enc(q.astype(cdt)) for q in fm.parts(x)]
    return [_enc(fm(x).astype(cdt))]


def _next_init_key():
    key = jax.random.fold_in(rng.base_key(), 1000 + _INIT_COUNTER[0])
    _INIT_COUNTER[0] += 1
    return key


def _dense_init(key, fan_in: int, fan_out: int):
    limit = (6.0 / (fan_in + fan_out)) ** 0.5
    w = jax.random.uniform(key, (fan_in, fan_out), jnp.float32, -limit, limit)
    return {"w": w, "b": jnp.zeros((fan_out,), jnp.float32)}


def _dense(p, x, compute_dtype):
    w = p["w"].astype(compute_dtype)
    b = p["b"].astype(compute_dtype)
    return jnp.dot(x.astype(compute_dtype), w, preferred_element_type=compute_dtype) + b


def _dense_cat(p, xs, compute_dtype):
    """dense(concat(xs, -1)) without materializing the concatenation:
    splits the kernel by rows and sums the partial products.  The wide
    activation concats ([N, width + pos_dim] skip joins etc.) otherwise
    dominate HBM traffic in the render loop — on TPU they showed up as the
    top ops inside the MLP while-loop.  Mathematically identical; float
    summation order differs from the concat form by ~1 ulp."""
    w = p["w"].astype(compute_dtype)
    out = p["b"].astype(compute_dtype)
    off = 0
    for x in xs:
        d = x.shape[-1]
        out = out + jnp.dot(
            x.astype(compute_dtype), w[off:off + d], preferred_element_type=compute_dtype
        )
        off += d
    assert off == w.shape[0], (off, w.shape)
    return out


class Model:
    """Pure-pytree model wrapper: params + static apply.

    Call convention mirrors keras' functional model in the reference:
    model((pos, dirs, prms), training=...) -> (color_logits, density_logit).
    """

    def __init__(self, name, params, apply_fn):
        self.name = name
        self.params = params
        self.apply = apply_fn

    def __call__(self, inputs, training: bool = False):
        pos, dirs, prms = inputs
        return self.apply(self.params, pos, dirs, prms)

    @property
    def trainable_variables(self):
        return jax.tree.leaves(self.params)

    def n_params(self) -> int:
        return sum(int(v.size) for v in self.trainable_variables)

    def summary(self) -> None:
        print(f"Model '{self.name}': {self.n_params():,} parameters")


def _instantiate_embedding(config):
    emb = util.instantiate(config)
    return emb


def Nerf(
    pos_embedding: EasyDict,
    dir_embedding: EasyDict,
    depth: int = 8,
    width: int = 256,
    skips: list = (4,),
    name: str = "model",
    compute_dtype: str = "float32",
    **kwargs,
) -> dict:
    """Classic 8x256 NeRF MLP with skip connection and view-dependent color
    head (model.py:9-45).  Accepts-and-ignores a parameter input like the
    reference's dummy 'params' keras Input."""
    pos_fm = _instantiate_embedding(pos_embedding)
    dir_fm = _instantiate_embedding(dir_embedding)
    skips = tuple(skips)
    cdt = jnp.dtype(compute_dtype)

    pos_dim = pos_fm.out_dim(3)
    dir_dim = dir_fm.out_dim(3)

    key = _next_init_key()
    keys = iter(jax.random.split(key, depth + 4))

    params = {"trunk": [], "alpha": None, "bottleneck": None, "pre_color": None, "color": None}
    in_dim = pos_dim
    for i in range(depth):
        params["trunk"].append(_dense_init(next(keys), in_dim, width))
        in_dim = width + (pos_dim if i in skips else 0)
    params["alpha"] = _dense_init(next(keys), in_dim, 1)
    params["bottleneck"] = _dense_init(next(keys), in_dim, width)
    params["pre_color"] = _dense_init(next(keys), width + dir_dim, width // 2)
    params["color"] = _dense_init(next(keys), width // 2, 3)

    def apply(p, pos, dirs, prms):
        del prms
        pos_maps = _enc_blocks(pos_fm, pos, cdt)
        dir_maps = _enc_blocks(dir_fm, dirs, cdt)

        # Wide concats (skip join, direction join) stay virtual: each
        # consumer dense runs as split partial matmuls (_dense_cat).
        parts = list(pos_maps)
        for i in range(depth):
            h = jax.nn.relu(_dense_cat(p["trunk"][i], parts, cdt))
            parts = pos_maps + [h] if i in skips else [h]
        density = _dense_cat(p["alpha"], parts, cdt)
        h = _dense_cat(p["bottleneck"], parts, cdt)
        h = jax.nn.relu(_dense_cat(p["pre_color"], dir_maps + [h], cdt))
        color = _dense(p["color"], h, cdt)
        return color.astype(jnp.float32), density.astype(jnp.float32)

    model = Model(name, params, apply)
    # Consumers that hoist the param->compute cast out of chunk scans
    # (renderer.chunked_apply cast_params) read the dtype from here.
    model.compute_dtype = cdt
    return {name: model}


def CoarseFine(model_config: EasyDict, **kwargs) -> dict:
    """Duplicate a model config into {model, model_fine} (model.py:47-56)."""
    model_config = EasyDict(model_config)
    for key, value in kwargs.items():
        model_config.setdefault(key, value)
    model_coarse = util.instantiate(model_config)
    model_config["name"] = next(iter(model_coarse)) + "_fine"
    model_fine = util.instantiate(model_config)
    return dict(model_coarse, **model_fine)


def ParamNerf(
    pos_embedding: EasyDict,
    dir_embedding: EasyDict,
    param_embedding: EasyDict,
    n_parameters: Union[int, list],
    n_pos: int = 3,
    param_depth: int = 0,
    param_width: int = 128,
    depth: int = 8,
    width: int = 256,
    skips: list = (4,),
    color_depth: int = 1,
    embedding_config: EasyDict = None,
    include_param_dims: bool = False,
    name: str = "model",
    compute_dtype: str = "float32",
) -> dict:
    """NeRF MLP conditioned on auxiliary material/light parameters
    (model.py:58-125)."""
    if isinstance(n_parameters, int):
        n_parameters = [n_parameters, 0]
    n_geo, n_app = int(n_parameters[0]), int(n_parameters[1])
    n_total = n_geo + n_app
    skips = tuple(skips)
    cdt = jnp.dtype(compute_dtype)

    pos_fm = _instantiate_embedding(pos_embedding)
    dir_fm = _instantiate_embedding(dir_embedding)
    param_fm = _instantiate_embedding(param_embedding)
    extra_fm = _instantiate_embedding(embedding_config) if embedding_config else None

    pos_dim = pos_fm.out_dim(n_pos)
    dir_dim = dir_fm.out_dim(3)
    if extra_fm is not None:
        extra_in = n_pos + (n_total if include_param_dims else 0)
        pos_dim += extra_fm.out_dim(extra_in)

    key = _next_init_key()
    keys = iter(jax.random.split(key, depth + 2 * param_depth + color_depth + 8))

    params = {"trunk": [], "param_geo": [], "param_app": [], "color_layers": []}

    geo_dim = 0
    if n_geo > 0:
        geo_dim = param_fm.out_dim(n_geo)
        for _ in range(param_depth):
            params["param_geo"].append(_dense_init(next(keys), geo_dim, param_width))
            geo_dim = param_width
    app_dim = 0
    if n_app > 0:
        app_dim = param_fm.out_dim(n_app)
        for _ in range(param_depth):
            params["param_app"].append(_dense_init(next(keys), app_dim, param_width))
            app_dim = param_width

    trunk_in_dim = pos_dim + geo_dim  # "pos_inputs_map" after geo concat
    in_dim = trunk_in_dim
    for i in range(depth):
        params["trunk"].append(_dense_init(next(keys), in_dim, width))
        in_dim = width + (trunk_in_dim if i in skips else 0)
    params["alpha"] = _dense_init(next(keys), in_dim, 1)
    params["bottleneck"] = _dense_init(next(keys), in_dim, width)
    in_dim = width + dir_dim + app_dim
    for _ in range(color_depth):
        params["color_layers"].append(_dense_init(next(keys), in_dim, width))
        in_dim = width
    params["pre_color"] = _dense_init(next(keys), in_dim, width // 2)
    params["color"] = _dense_init(next(keys), width // 2, 3)

    def apply(p, pos, dirs, prms):
        # Feature groups are kept separate and every consumer dense runs as
        # split partial matmuls over them (_dense_cat): the reference's
        # concat-then-dense layers (model.py:88-104) are mathematically
        # identical, but materializing [N, 300+]-wide activation concats was
        # the top HBM cost inside the render MLP loop on TPU.
        pos_parts = _enc_blocks(pos_fm, pos, cdt)
        dir_parts = _enc_blocks(dir_fm, dirs, cdt)

        if extra_fm is not None:
            emb_in = jnp.concatenate([pos, prms], -1) if include_param_dims else pos
            pos_parts.extend(_enc_blocks(extra_fm, emb_in, cdt))

        if n_geo > 0:
            if p["param_geo"]:
                # A param MLP consumes the encoding as one tensor.
                g = _enc(param_fm(prms[:, :n_geo]).astype(cdt))
                for layer in p["param_geo"]:
                    g = jax.nn.relu(_dense(layer, g, cdt))
                pos_parts.append(g)
            else:
                pos_parts.extend(_enc_blocks(param_fm, prms[:, :n_geo], cdt))

        if n_app > 0:
            if p["param_app"]:
                a = _enc(param_fm(prms[:, n_geo:]).astype(cdt))
                for layer in p["param_app"]:
                    a = jax.nn.relu(_dense(layer, a, cdt))
                dir_parts.append(a)
            else:
                dir_parts.extend(_enc_blocks(param_fm, prms[:, n_geo:], cdt))

        parts = list(pos_parts)
        for i in range(depth):
            h = jax.nn.relu(_dense_cat(p["trunk"][i], parts, cdt))
            parts = pos_parts + [h] if i in skips else [h]
        density = _dense_cat(p["alpha"], parts, cdt)
        h = _dense_cat(p["bottleneck"], parts, cdt)
        parts = dir_parts + [h]
        for layer in p["color_layers"]:
            h = jax.nn.relu(_dense_cat(layer, parts, cdt))
            parts = [h]
        h = jax.nn.relu(_dense_cat(p["pre_color"], parts, cdt))
        color = _dense(p["color"], h, cdt)
        return color.astype(jnp.float32), density.astype(jnp.float32)

    model = Model(name, params, apply)
    model.compute_dtype = cdt  # see Nerf's note
    # Static topology handle for the fused Pallas inference kernel
    # (nerftex_tpu/kernels/mlp_pallas.py).
    model.static_topology = {
        "pos_fm": pos_fm,
        "dir_fm": dir_fm,
        "param_fm": param_fm,
        "n_geo": n_geo,
        "n_app": n_app,
        "depth": depth,
        "skips": skips,
        "color_depth": color_depth,
        "param_depth": param_depth,
    }
    return {name: model}
