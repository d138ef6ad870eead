"""Train state containers and optimizer builders."""

from __future__ import annotations

from typing import Any, Dict

import jax
import optax
from flax import core, struct
from flax.training import train_state


class TrainState(train_state.TrainState):
    """TrainState carrying BatchNorm statistics alongside params."""

    batch_stats: core.FrozenDict[str, Any] = struct.field(default_factory=dict)


def init_on_cpu(init_fn, *args, **kwargs):
    """Run flax ``model.init`` eagerly on the CPU backend, then move to the
    default device.

    Un-jitted init dispatches hundreds of tiny ops; on a remote-compiled TPU
    backend each costs a compile round-trip (~3 minutes for a small model).
    CPU eager init is milliseconds; one device_put ships the pytree over.
    """
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        # CPU platform not initialised (e.g. JAX_PLATFORMS=<tpu-only>);
        # fall back to direct init on the default backend.
        return init_fn(*args, **kwargs)
    with jax.default_device(cpu):
        variables = init_fn(*args, **kwargs)
    default = jax.devices()[0]
    if default.platform == "cpu":
        return variables
    return jax.device_put(variables, default)


def adamw_with_clip(
    lr: float,
    betas=(0.8, 0.99),
    eps: float = 1e-9,
    weight_decay: float = 0.0,
    grad_clip: float = 1.0,
) -> optax.GradientTransformation:
    """AdamW + global-norm clipping, with an injectable learning rate.

    The reference steps an ExponentialLR scheduler once per epoch
    (`fastspeech2_trainer.py:123,151`); we mirror that by updating the
    injected ``learning_rate`` hyperparam from the host between epochs.
    """
    tx = optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.clip_by_global_norm(grad_clip),
            optax.adamw(
                learning_rate,
                b1=betas[0],
                b2=betas[1],
                eps=eps,
                weight_decay=weight_decay,
            ),
        )
    )(learning_rate=lr)
    return tx


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Update the injected learning rate (host-side, between epochs)."""
    opt_state = state.opt_state
    hyper = dict(opt_state.hyperparams)
    hyper["learning_rate"] = jax.numpy.asarray(lr, dtype=hyper["learning_rate"].dtype)
    return state.replace(opt_state=opt_state._replace(hyperparams=hyper))


def exponential_lr(base_lr: float, gamma: float, epoch: int) -> float:
    return float(base_lr * (gamma**epoch))
