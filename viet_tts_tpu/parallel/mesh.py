"""Device mesh + sharding helpers.

The reference is strictly single-GPU (`src/trainer/base.py:19,53`); here
data parallelism is a first-class property of every train step: batches are
sharded over the mesh's ``data`` axis, parameters are replicated, and XLA
inserts the gradient all-reduce over ICI (no explicit comm layer).

The same helpers scale to multi-host by changing the mesh shape only; axis
names are reserved for tensor/sequence axes so wider shardings can be added
without changing call sites.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1) -> Mesh:
    """1-D (data) or 2-D (data x model) mesh over the available devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    if model_parallel == 1:
        return Mesh(arr[:, 0], (DATA_AXIS,))
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host batch with the leading axis split over ``data``.

    Scalar/0-d leaves are replicated.
    """
    data = data_sharded(mesh)
    repl = replicated(mesh)

    def place(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, repl)
        return jax.device_put(x, data)

    return jax.tree_util.tree_map(place, batch)


def shard_train_step(train_step, mesh: Mesh, donate_state: bool = True):
    """jit a (state, batch, *args) -> (state, metrics) step over the mesh.

    Params/opt-state replicated, batch data-sharded; XLA/GSPMD derives the
    gradient psum across ``data``.
    """
    repl = replicated(mesh)
    return jax.jit(
        train_step,
        in_shardings=None,  # inferred from operand placement
        out_shardings=None,
        donate_argnums=(0,) if donate_state else (),
    )


def pad_batch_to_devices(batch: Any, n_devices: int) -> Any:
    """Repeat-pad the leading axis so it divides the data axis size."""

    def pad(x):
        x = np.asarray(x)
        if x.ndim == 0 or x.shape[0] % n_devices == 0:
            return x
        need = n_devices - (x.shape[0] % n_devices)
        reps = np.concatenate([x] * (need // x.shape[0] + 1), axis=0)[:need]
        return np.concatenate([x, reps], axis=0)

    return jax.tree_util.tree_map(pad, batch)
