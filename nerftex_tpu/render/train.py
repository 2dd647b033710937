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
    opt_state = state.opt_state

    train_step = make_train_step(
        renderer, loss_fn, optimizer,
        train_dataset.composite_bkgd, train_dataset.bkgd_color,
    )

    n_remaining = int(n_iters) - logger.step
    base_key = rng.stream_key(rng.STREAM_PERTURB)

    for data in train_dataset.take(n_remaining):
        batch = {k: jnp.asarray(v) for k, v in data.items()}
        key = jax.random.fold_in(base_key, logger.step)

        params, opt_state, loss = train_step(params, opt_state, batch, key)

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
