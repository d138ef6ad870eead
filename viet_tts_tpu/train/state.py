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


def apply_init_scheme(params, init_type: str, rng):
    """Re-initialize weight matrices per an espnet-style scheme.

    The reference applies espnet ``initialize(self, init_type)`` after
    construction (`models/gan_tts/jets/model.py:795-801`; config
    `model_config.yaml:99` uses xavier_uniform): every parameter with
    ndim > 1 is re-drawn from the scheme, biases are zeroed; embeddings,
    norm scales and 1-d parameters keep their defaults here (espnet
    resets those modules back to their own defaults, which flax init
    already produced).
    """
    import flax
    import jax.numpy as jnp
    from jax.nn import initializers as jinit

    schemes = {
        "xavier_uniform": jinit.xavier_uniform(),
        "xavier_normal": jinit.xavier_normal(),
        "kaiming_uniform": jinit.kaiming_uniform(),
        "kaiming_normal": jinit.kaiming_normal(),
    }
    if init_type in ("pytorch", None):
        return params
    if init_type not in schemes:
        raise ValueError(f"unknown init_type {init_type!r}")
    init_fn = schemes[init_type]

    flat = flax.traverse_util.flatten_dict(params)
    out = {}
    keys = jax.random.split(rng, max(len(flat), 1))
    for i, (path, leaf) in enumerate(sorted(flat.items())):
        name = path[-1]
        is_embed = any("embed" in p.lower() for p in path[:-1]) and name == "embedding"
        if leaf.ndim > 1 and not is_embed and name != "rel_pos_emb":
            # xavier fan-in/out over the last two axes matches torch's view
            # of (out, in, *k) closely enough for conv kernels in (k, in, out)
            out[path] = init_fn(keys[i], leaf.shape, leaf.dtype)
        elif name == "bias":
            out[path] = jnp.zeros_like(leaf)
        else:
            out[path] = leaf
    return flax.traverse_util.unflatten_dict(out)
