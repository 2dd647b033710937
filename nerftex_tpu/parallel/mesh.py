"""Device-mesh parallelism: data-parallel rays + tensor-parallel MLP width.

The reference is strictly single-device (SURVEY.md §2.4) — this layer is new
capability, designed TPU-first:

  - **dp** ("data" axis): the ray axis of a batch shards across devices; rays
    are embarrassingly parallel, the loss mean induces one gradient psum over
    ICI.  This is also the "sequence parallel" analogue for rendering — rays
    x samples is the long axis (SURVEY.md §5).
  - **tp** ("model" axis): the 256-wide MLP trunk alternates column/row
    sharding (megatron-style) so activations stay sharded between layers and
    XLA inserts the minimal all-reduces.  Pointless at width 256 on real
    chips, but it exercises a genuine tp lowering for wider conditioned
    fields and for the multi-chip dry run.

Everything is jit + NamedSharding (GSPMD); no hand-written collectives are
needed on this workload — XLA inserts psum/all-gather from the annotations.
"""

import jax
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int = None, shape=None, axis_names=("data", "model")):
    """Mesh over the first n_devices; shape defaults to (n, 1) = pure dp."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if shape is None:
        shape = (n_devices, 1)
    grid = np.asarray(devices).reshape(shape)
    return Mesh(grid, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, batch: dict) -> dict:
    """Shard the ray axis (axis 1 of [B, R, ...]) across the 'data' axis;
    per-image tensors (parameters [B, P]) replicate."""
    out = {}
    for key, value in batch.items():
        if value.ndim >= 2 and key != "parameters":
            out[key] = NamedSharding(mesh, P(None, "data"))
        else:
            out[key] = NamedSharding(mesh, P())
    return out


def model_shardings(params, mesh: Mesh) -> dict:
    """Megatron-style alternating column/row sharding for the MLP trunk.

    Column-parallel layers shard the output dim, row-parallel the input dim;
    heads and small conditioning layers replicate.  Works on the param pytree
    produced by nerftex_tpu.models.mlp (dicts with 'trunk' lists etc.);
    anything unrecognized replicates.
    """

    def shard_model(p):
        spec = jax.tree.map(lambda _: P(), p)
        if isinstance(p, dict) and "trunk" in p:
            trunk = []
            for i, layer in enumerate(p["trunk"]):
                if i % 2 == 0:  # column-parallel: [in, out/model]
                    trunk.append({"w": P(None, "model"), "b": P("model")})
                else:  # row-parallel: [in/model, out]
                    trunk.append({"w": P("model", None), "b": P()})
            spec["trunk"] = trunk
        return spec

    specs = {name: shard_model(p) for name, p in params.items()}
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def make_parallel_train_step(
    renderer, loss_fn, optimizer, mesh: Mesh,
    composite_bkgd, bkgd_color, example_batch, params,
    shard_model: bool = False,
):
    """Data-parallel (optionally + tensor-parallel) jitted train step.

    Returns (step_fn, place_params, place_batch): placement helpers push
    arrays to their shardings before the first call.
    """

    if shard_model:
        param_sharding = model_shardings(params, mesh)
    else:
        param_sharding = jax.tree.map(lambda _: replicated(mesh), params)
    batch_shardings = batch_sharding(mesh, example_batch)

    def loss_of(p, batch, key):
        pred = renderer.apply(
            p, batch, key,
            composite_bkgd=composite_bkgd, bkgd_color=bkgd_color, training=True,
        )
        return loss_fn(
            color_true=batch.get("color"), alpha_true=batch.get("alpha"), **pred
        )

    def step_fn(p, opt_state, batch, key):
        loss, grads = jax.value_and_grad(loss_of)(p, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)
        return p, opt_state, loss

    # opt_state shardings are inferred from the passed-in state (Adam moments
    # inherit the param shardings when initialized from placed params).
    jitted = jax.jit(
        step_fn,
        in_shardings=(param_sharding, None, batch_shardings, None),
        out_shardings=(param_sharding, None, None),
        donate_argnums=(0, 1),
    )

    def place_params(p):
        return jax.tree.map(_put_global, p, param_sharding)

    def place_batch(batch):
        return {k: _put_global(v, batch_shardings[k]) for k, v in batch.items()}

    return jitted, place_params, place_batch


def make_parallel_fused_train_step(
    renderer, loss_fn, optimizer, sampler, mesh: Mesh,
    composite_bkgd, bkgd_color, params,
    shard_model: bool = False,
):
    """Device-resident data pipeline + mesh parallelism: the dataset tables
    replicate across the mesh and per-step sampling runs inside the sharded
    jit (data/device_dataset.py).  The sampled batch is constrained to the
    dp ray sharding so the renderer/grads partition exactly like
    make_parallel_train_step; the sampling math itself is negligible and
    runs replicated.

    Returns (step_fn, place_params, place_tables)."""

    if shard_model:
        param_sharding = model_shardings(params, mesh)
    else:
        param_sharding = jax.tree.map(lambda _: replicated(mesh), params)

    tables_sharding = jax.tree.map(lambda _: replicated(mesh), sampler.tables)
    example = jax.eval_shape(
        lambda t, k: sampler.sample_from(t, k), sampler.tables, jax.random.key(0)
    )
    batch_shardings = batch_sharding(mesh, example)

    def loss_of(p, batch, key):
        pred = renderer.apply(
            p, batch, key,
            composite_bkgd=composite_bkgd, bkgd_color=bkgd_color, training=True,
        )
        return loss_fn(
            color_true=batch.get("color"), alpha_true=batch.get("alpha"), **pred
        )

    def step_fn(p, opt_state, tables, data_key, key):
        batch = sampler.sample_from(tables, data_key)
        batch = {
            k: jax.lax.with_sharding_constraint(v, batch_shardings[k])
            for k, v in batch.items()
        }
        loss, grads = jax.value_and_grad(loss_of)(p, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)
        return p, opt_state, loss

    jitted = jax.jit(
        step_fn,
        in_shardings=(param_sharding, None, tables_sharding, None, None),
        out_shardings=(param_sharding, None, None),
        donate_argnums=(0, 1),
    )

    def place_params(p):
        return jax.tree.map(_put_global, p, param_sharding)

    def place_tables():
        return jax.tree.map(_put_global, sampler.tables, tables_sharding)

    return jitted, place_params, place_tables


def _put_global(value, sharding):
    """Place a host array under a sharding that may span processes.

    Single-process: plain device_put.  Multi-process (jax.distributed): every
    process holds the identical full array (the data pipeline is replicated,
    single-controller style), so each process materializes only its
    addressable shards via make_array_from_callback — device_put cannot
    target non-addressable devices.
    """
    if jax.process_count() == 1:
        return jax.device_put(value, sharding)
    value = np.asarray(value)
    return jax.make_array_from_callback(value.shape, sharding, lambda idx: value[idx])


def shard_render(renderer, mesh: Mesh):
    """Wrap a renderer chunk fn so eval-time ray chunks shard over 'data':
    each device marches its slice of rays, outputs gather on host assembly.
    Returns a __call__-compatible callable."""

    ray_keys = ("rays_o", "rays_d", "t", "cone_scale")

    def call(**data):
        placed = dict(data)
        for key in ray_keys:
            if key in placed:
                arr = np.asarray(placed[key])
                placed[key] = jax.device_put(arr, NamedSharding(mesh, P(None, "data")))
        return renderer(**placed)

    return call
