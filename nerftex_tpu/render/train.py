"""Training driver: one jit-compiled update step over ray batches.

Mirror of reference network/train.py:7-70 with the eager GradientTape loop
replaced by a single donated jit step (render + loss + grads + Adam update in
one XLA program) and optional data parallelism over a device mesh (the batch's
ray axis shards across devices, gradients allreduce — see
nerftex_tpu/parallel).  LR schedule matches keras ExponentialDecay(lrate,
lrate_decay*1e3, 0.1) (train.py:49-52); Adam uses eps=1e-7 like keras.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerftex_tpu.utils import util, rng
from nerftex_tpu.utils.util import EasyDict


class TrainState:
    """Mutable holder visible to the Logger for checkpointing."""

    def __init__(self):
        self.opt_state = None
        self.step = 0


def apply_flat_param_space(models) -> dict:
    """Re-express each model's parameters as ONE flat f32 vector.

    TPU perf knob (docs/PERF.md §1.4): the per-leaf parameter pytree makes
    the train step's gradient accumulation (one accumulate per leaf per
    net_chunk — 384 small ops/step at 16k chunks) and the Adam update (one
    fusion per [256,256] matrix) latency-bound on tiny-op dispatch.  With a
    single [n_params] theta per model, chunked gradient accumulation is one
    wide add and Adam is one fused elementwise chain.  The unravel
    (static slices + reshapes of the flat buffer — bitcasts under XLA) runs
    inside the chunk body, so `jax.checkpoint` recomputes views, not copies.

    Mutates each Model in place: `params` becomes the flat vector, `apply`
    accepts it, and `_unravel` / `_ravel` convert to/from the original
    pytree (used by checkpoint restore and tests).  Elementwise-identical to
    the pytree step: Adam has no cross-parameter coupling, and the matmuls
    consume bit-equal reshaped views.  Note: megatron-style width sharding
    (parallel/mesh.model_shardings) needs the pytree layout — a flat theta
    falls through to full replication, which is the right call anyway for
    this ~600k-param model; dp is unaffected.

    Returns {model_name: unravel_fn}.
    """
    from jax.flatten_util import ravel_pytree

    unravels = {}
    for name, model in models.items():
        if getattr(model, "_unravel", None) is not None:
            unravels[name] = model._unravel
            continue
        theta, unravel = ravel_pytree(model.params)
        orig_apply = model.apply

        def flat_apply(th, pos, dirs, prms, _apply=orig_apply, _un=unravel):
            return _apply(_un(th), pos, dirs, prms)

        model.params = theta
        model.apply = flat_apply
        model._unravel = unravel
        model._ravel = lambda pytree, _un=unravel: ravel_pytree(pytree)[0]
        unravels[name] = unravel
    return unravels


def make_optimizer(lrate: float, lrate_decay: float):
    if lrate_decay > 0:
        schedule = optax.exponential_decay(
            init_value=lrate,
            transition_steps=lrate_decay * 1e3,
            decay_rate=0.1,
            staircase=False,
        )
    else:
        schedule = lrate
    return optax.adam(schedule, b1=0.9, b2=0.999, eps=1e-7)


def make_train_step(renderer, loss_fn, optimizer, composite_bkgd, bkgd_color, donate=True):
    """Build the jitted update: (params, opt_state, batch, key) ->
    (params, opt_state, loss)."""

    def loss_of(params, batch, key):
        pred = renderer.apply(
            params, batch, key,
            composite_bkgd=composite_bkgd, bkgd_color=bkgd_color, training=True,
        )
        return loss_fn(
            color_true=batch.get("color"), alpha_true=batch.get("alpha"), **pred
        )

    def step_fn(params, opt_state, batch, key):
        loss, grads = jax.value_and_grad(loss_of)(params, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step_fn, donate_argnums=(0, 1) if donate else ())


def make_fused_train_step(
    renderer, loss_fn, optimizer, sampler, composite_bkgd, bkgd_color, donate=True
):
    """Device-resident variant: batch sampling happens INSIDE the jit
    (data/device_dataset.py), so a step is (params, opt_state, tables,
    data_key, perturb_key) -> (params, opt_state, loss) — one dispatch,
    zero steady-state host transfers.  The dataset tables ride through as
    ordinary jit ARGUMENTS (already device-resident, so passing them is
    free) — closure capture would bake multi-GB constants into the HLO."""

    def loss_of(params, batch, key):
        pred = renderer.apply(
            params, batch, key,
            composite_bkgd=composite_bkgd, bkgd_color=bkgd_color, training=True,
        )
        return loss_fn(
            color_true=batch.get("color"), alpha_true=batch.get("alpha"), **pred
        )

    def step_fn(params, opt_state, tables, data_key, key):
        batch = sampler.sample_from(tables, data_key)
        loss, grads = jax.value_and_grad(loss_of)(params, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step_fn, donate_argnums=(0, 1) if donate else ())


def make_fused_multi_step(
    renderer, loss_fn, optimizer, sampler, composite_bkgd, bkgd_color, donate=True
):
    """K train steps in ONE device program (lax.fori_loop over the fused
    step), returning the per-step losses [K].  Only possible because the
    data pipeline is device-resident: nothing on the host is needed between
    steps, so dispatch/sync overhead amortizes over the whole chunk.

    (params, opt_state, tables, data_base_key, perturb_base_key, start_step,
    K) -> (params, opt_state, losses[K]); keys are folded with the ABSOLUTE
    step index inside the loop, so a K-chunked run is bit-identical to the
    single-step path and to any resume point."""

    def loss_of(params, batch, key):
        pred = renderer.apply(
            params, batch, key,
            composite_bkgd=composite_bkgd, bkgd_color=bkgd_color, training=True,
        )
        return loss_fn(
            color_true=batch.get("color"), alpha_true=batch.get("alpha"), **pred
        )

    def chunk_fn(params, opt_state, tables, data_base_key, perturb_base_key, start_step, losses):
        def body(i, carry):
            params, opt_state, losses = carry
            step = start_step + i
            batch = sampler.sample_from(tables, jax.random.fold_in(data_base_key, step))
            loss, grads = jax.value_and_grad(loss_of)(
                params, batch, jax.random.fold_in(perturb_base_key, step)
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, losses.at[i].set(loss)

        return jax.lax.fori_loop(
            0, losses.shape[0], body, (params, opt_state, losses)
        )

    # K is carried via the donated losses buffer's static shape; start_step
    # arrives as a traced scalar so chunk starts don't retrigger compiles.
    return jax.jit(chunk_fn, donate_argnums=(0, 1, 6) if donate else ())


def _align_opt_state_layout(opt_state, models):
    """Convert a restored optimizer state between pytree- and flat-parameter
    layouts (apply_flat_param_space) so `flat_params` can be toggled across
    a resume.  Only Adam moment trees carry parameter layout; counts and
    schedule states pass through."""
    import optax
    from jax.flatten_util import ravel_pytree

    def remap_tree(t):
        out = {}
        for name, model in models.items():
            sub = t[name]
            is_flat = hasattr(sub, "ndim") and getattr(sub, "ndim", None) == 1
            want_flat = getattr(model, "_unravel", None) is not None
            if is_flat and not want_flat:
                # Build the unravel from the model's own (pytree) structure.
                out[name] = ravel_pytree(model.params)[1](sub)
            elif not is_flat and want_flat:
                out[name] = ravel_pytree(sub)[0]
            else:
                out[name] = sub
        return out

    def walk(node):
        if isinstance(node, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(
                node.count, remap_tree(node.mu), remap_tree(node.nu)
            )
        if isinstance(node, tuple):
            # NamedTuple states rebuild by fields; plain tuples (optax
            # chains) by iterable.
            if hasattr(node, "_fields"):
                return type(node)(*(walk(c) for c in node))
            return tuple(walk(c) for c in node)
        return node

    return walk(opt_state)


def Train(
    target_path: str,
    train_dataset_config: EasyDict,
    val_dataset_config: EasyDict,
    model_config: EasyDict,
    loss_config: EasyDict,
    n_iters: int,
    lrate: float,
    lrate_decay: float,
    renderer_config: EasyDict,
    logger_config: EasyDict,
    steps_per_dispatch: int = 1,
    flat_params: bool = False,
    **kwargs,
) -> None:
    """Set up and run supervised training (train.py:7-70)."""
    state = TrainState()

    train_dataset_config = EasyDict(train_dataset_config)
    train_dataset_config.update({"step": state})
    train_dataset = util.instantiate(train_dataset_config)

    val_dataset = util.instantiate(val_dataset_config)

    model_config = EasyDict(model_config)
    model_config.setdefault("n_parameters", train_dataset.n_parameters)
    models = util.instantiate(model_config)

    for model in models.values():
        model.summary()

    if flat_params:
        # Perf knob (docs/PERF.md §1.4): single flat theta per model.
        # Checkpoints save/restore whatever layout the model uses; restores
        # across a layout switch are converted in _restore/_align below.
        apply_flat_param_space(models)

    renderer_config = EasyDict(renderer_config)
    renderer_config.update(models)
    renderer = util.instantiate(renderer_config)

    loss_fn = util.instantiate(loss_config)

    optimizer = make_optimizer(lrate, lrate_decay)

    # Logger restores {model params, opt_state, step} from the latest
    # checkpoint if one exists (logger.py:29-39).
    logger_config = EasyDict(logger_config)
    checkpoint_variables = dict(models, state=state)
    logger_config.update(
        {
            "target_path": target_path,
            "checkpoint_variables": checkpoint_variables,
            "dataset": val_dataset,
            "renderer": renderer,
            "n_iters": n_iters,
        }
    )
    logger = util.instantiate(logger_config)

    params = {name: model.params for name, model in models.items()}
    if state.opt_state is None:
        state.opt_state = optimizer.init(params)
    else:
        state.opt_state = _align_opt_state_layout(state.opt_state, models)
    opt_state = state.opt_state

    n_remaining = int(n_iters) - logger.step
    base_key = rng.stream_key(rng.STREAM_PERTURB)

    device_sampler = getattr(train_dataset, "device_sampler", None)

    if device_sampler is not None and int(steps_per_dispatch) > 1:
        # Chunked fused path: K steps per device program (framework
        # extension; needs device_resident data).  Host actions (validation
        # renders, checkpoints) keep their exact cadence: each chunk is
        # clipped to the next i_img/i_checkpoint boundary so the logger only
        # crosses one inside a drained chunk.  Per-step profiling windows
        # (i_trace) need steps_per_dispatch=1.
        multi_step = make_fused_multi_step(
            renderer, loss_fn, optimizer, device_sampler,
            train_dataset.composite_bkgd, train_dataset.bkgd_color,
        )
        data_base_key = rng.stream_key(rng.STREAM_DATA)
        tables = device_sampler.tables
        cadences = [
            int(c) for c in (logger.i_img, logger.i_checkpoint) if c and int(c) > 0
        ]
        losses_buf = None
        step_idx = logger.step
        end = int(n_iters)
        while step_idx < end:
            k = min(int(steps_per_dispatch), end - step_idx)
            for c in cadences:
                k = min(k, c - step_idx % c)
            if losses_buf is None or losses_buf.shape[0] != k:
                losses_buf = jnp.zeros((k,), jnp.float32)
            params, opt_state, losses_buf = multi_step(
                params, opt_state, tables, data_base_key, base_key, step_idx, losses_buf
            )
            losses_np = np.asarray(losses_buf)

            for name, model in models.items():
                model.params = params[name]
            state.opt_state = opt_state
            for j in range(k):
                state.step = logger.step + 1
                logger({"Loss": losses_np[j]})
            step_idx += k

        for name, model in models.items():
            model.params = params[name]
        state.opt_state = opt_state
        return models

    if device_sampler is not None:
        train_step = make_fused_train_step(
            renderer, loss_fn, optimizer, device_sampler,
            train_dataset.composite_bkgd, train_dataset.bkgd_color,
        )
        data_base_key = rng.stream_key(rng.STREAM_DATA)
        start_step = logger.step
        tables = device_sampler.tables
        batches = (
            (tables, jax.random.fold_in(data_base_key, start_step + i))
            for i in range(n_remaining)
        )
    else:
        train_step = make_train_step(
            renderer, loss_fn, optimizer,
            train_dataset.composite_bkgd, train_dataset.bkgd_color,
        )
        batches = (
            ({k: jnp.asarray(v) for k, v in data.items()},)
            for data in train_dataset.take(n_remaining)
        )

    for step_args in batches:
        key = jax.random.fold_in(base_key, logger.step)

        params, opt_state, loss = train_step(params, opt_state, *step_args, key)

        # Expose live state to the logger (val renders + checkpoints).
        for name, model in models.items():
            model.params = params[name]
        state.opt_state = opt_state
        state.step = logger.step + 1

        logger({"Loss": loss})

    # Final sync so callers can inspect trained models.
    for name, model in models.items():
        model.params = params[name]
    state.opt_state = opt_state
    return models
