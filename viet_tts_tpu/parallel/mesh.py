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

import re
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


def make_hybrid_mesh(
    model_parallel: int = 1, devices: Optional[list] = None
) -> Mesh:
    """Multi-slice / multi-host mesh: ``data`` spans DCN x ICI, ``model``
    stays inside a slice.

    The scaling recipe for pods: tensor parallelism must ride ICI (it
    all-reduces per layer pair), while pure data parallelism tolerates DCN
    (one gradient reduction per step), so the slower network gets the outer
    slot of the data axis. Built with
    ``jax.experimental.mesh_utils.create_hybrid_device_mesh``, which orders
    each slice's devices by ICI topology; XLA then emits hierarchical
    collectives (reduce-scatter inside the slice, cross-slice all-reduce on
    the partials). Single-slice processes (this repo's CI, the one-chip
    axon runtime) fall back to `make_mesh` — same axis names, so every
    sharding helper and train step works unchanged on either.

    The reference is single-GPU (`src/trainer/base.py:19,53`); this is the
    above-parity entry point for multi-host training.
    """
    if devices is None:
        devices = jax.devices()
    n_slices = len({getattr(d, "slice_index", 0) for d in devices})
    if n_slices <= 1:
        return make_mesh(len(devices), model_parallel)
    from jax.experimental import mesh_utils

    per_slice = len(devices) // n_slices
    assert per_slice % model_parallel == 0, (per_slice, model_parallel)
    arr = mesh_utils.create_hybrid_device_mesh(
        [per_slice // model_parallel, model_parallel],
        [n_slices, 1],
        devices,
    )
    if model_parallel == 1:
        return Mesh(arr[:, 0], (DATA_AXIS,))
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def seq_sharded(mesh: Mesh) -> NamedSharding:
    """(B, T, C) sharding that splits the TIME axis over the mesh.

    Sequence-parallel serving: the vocoder turns T mel frames into T*256
    samples, so its (B, T*r, C) activations dwarf everything else in the
    graph (PERF_NOTES.md §1). Constraining the vocoder input with this
    sharding makes GSPMD spatially partition every conv along time —
    halo exchanges over ICI at each kernel boundary, math unchanged —
    which is the latency lever when a single long utterance can't fill
    the batch axis. Reuses the 1-D mesh's ``data`` axis: batch-sharding
    and time-sharding are alternative uses of the same serving mesh.
    """
    return NamedSharding(mesh, P(None, DATA_AXIS, None))


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


# ---------------------------------------------------------------------------
# ZeRO-1: optimizer state sharded over the data axis
# ---------------------------------------------------------------------------


def zero1_partition_specs(tree: Any, n_shards: int) -> Any:
    """ZeRO-1 ``PartitionSpec`` tree: each leaf split over ``data`` along
    its first ``n_shards``-divisible axis; scalars and indivisible leaves
    stay replicated.

    The reference trains single-GPU with whole AdamW moments resident
    (`src/trainer/base.py:19,53`); on a TPU mesh the moments are pure
    per-parameter elementwise state, so sharding them over ``data`` cuts
    their HBM footprint and update traffic by the mesh size while GSPMD
    keeps the math identical (the gradient reduction turns into
    reduce-scatter + all-gather of the same total bytes).
    """

    def spec(leaf):
        shape = np.shape(leaf)
        for ax, d in enumerate(shape):
            if d >= n_shards and d % n_shards == 0:
                return P(*([None] * ax + [DATA_AXIS]))
        return P()

    return jax.tree_util.tree_map(spec, tree)


def shard_state_zero1(mesh: Mesh, state: Any):
    """Place a flax ``TrainState`` ZeRO-1 style: params and batch statistics
    replicated, optimizer state sharded over ``data``.

    Returns ``(placed_state, sharding_tree)``; pass ``sharding_tree`` as the
    state slot of the train step's ``out_shardings`` so the updated state
    keeps the layout across donated steps (otherwise GSPMD is free to emit a
    replicated opt state and the placement decays after one step).
    """
    n = int(mesh.shape[DATA_AXIS])
    repl = replicated(mesh)
    shardings = jax.tree_util.tree_map(lambda _: repl, state)
    opt_shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s),
        zero1_partition_specs(state.opt_state, n),
    )
    shardings = shardings.replace(opt_state=opt_shardings)
    return jax.device_put(state, shardings), shardings


def shard_state_fsdp(mesh: Mesh, state: Any):
    """Fully-sharded (ZeRO-3 style) placement: params AND optimizer moments
    split over ``data`` along their first divisible axis; batch statistics
    and scalars replicated.

    Under GSPMD each layer's weights are all-gathered just-in-time for its
    matmul and gradients reduce-scattered back to the owning shard — the
    standard TPU FSDP pattern (How-to-Scale-Your-Model recipe: annotate
    shardings, let XLA insert the collectives over ICI). Per-device memory
    for params + moments drops ~mesh-size-fold; math is unchanged
    (loss-identity tested on the virtual mesh).

    Returns ``(placed_state, sharding_tree)`` like `shard_state_zero1`.
    """
    n = int(mesh.shape[DATA_AXIS])
    repl = replicated(mesh)
    shardings = jax.tree_util.tree_map(lambda _: repl, state)
    to_named = lambda s: NamedSharding(mesh, s)  # noqa: E731
    shardings = shardings.replace(
        params=jax.tree_util.tree_map(
            to_named, zero1_partition_specs(state.params, n)
        ),
        opt_state=jax.tree_util.tree_map(
            to_named, zero1_partition_specs(state.opt_state, n)
        ),
    )
    return jax.device_put(state, shardings), shardings


# ---------------------------------------------------------------------------
# Tensor parallelism (2-D data x model mesh)
# ---------------------------------------------------------------------------

# Megatron-style pairing per block: column-parallel layers shard their
# OUTPUT features (each model shard computes a slice of heads / FFN inner
# units), the following row-parallel layer shards its INPUT features, and
# GSPMD inserts one all-reduce per pair over ICI. Names cover the FFT,
# espnet-transformer/conformer, VITS2 and Matcha attention stacks, plus the
# HiFiGAN-style vocoder MRF pairs (see ``_VOCODER_PAIR``); unlisted
# parameters (embeddings — the 131-symbol table is too small to matter —
# norms, depthwise convs, discriminator conv chains, biases) stay
# replicated — GSPMD keeps the math identical either way, the rules only
# shape the collective pattern.
_TP_COL_MODULES = frozenset({
    "w_qs", "w_ks", "w_vs", "linear_q", "linear_k", "linear_v", "linear_pos",
    "query_proj", "key_proj", "value_proj", "pos_proj", "w_1",
    "pointwise_conv1", "pw_conv1", "proj_in", "to_q", "to_k", "to_v",
    "conv_q", "conv_k", "conv_v",
})
_TP_ROW_MODULES = frozenset({
    "fc", "linear_out", "out_proj", "w_2", "pointwise_conv2", "pw_conv2",
    "proj_out", "to_out", "conv_o",
})

# Vocoder MRF residual pairs: ``conv1_{k}`` -> LReLU -> ``conv2_{k}`` ->
# residual add, in both the HiFiGAN generator
# (``models/hifigan/generator.py:109`` -> params ``block_i_j/conv1_k/conv``)
# and the VITS2 decoder resblocks (``models/vits2/sublayers.py:106`` ->
# ``res_i_j/conv1_k/conv``). conv1 is column-parallel (output channels),
# conv2 row-parallel (input channels): one all-reduce per dilation step,
# on the upsampled (B, T, C) activation, before the replicated residual
# add. The MRF convs are ~82% of the JETS serving roofline (PERF_NOTES.md
# table 1), so these are the rules that make TP bite on the GAN families.
# The duration-predictor's ``conv_1``/``conv_2`` (underscore-digit) do NOT
# match. WeightNorm scales/biases stay replicated: per-output-channel
# vectors read shard-locally under GSPMD with no comm.
_VOCODER_PAIR = re.compile(r"^conv([12])_\d+$")


def param_partition_specs(params: Any, model_parallel: int) -> Any:
    """Rule-based tensor-parallel PartitionSpec tree for a params pytree.

    Kernels of known column-parallel modules shard their last (output)
    dim over ``model``; known row-parallel modules shard their
    second-to-last (input) dim; everything else (and any dim not divisible
    by ``model_parallel``) is replicated. Returns a pytree of
    ``PartitionSpec`` matching ``params``.
    """
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params)
    specs = {}

    def role(path):
        """'col' / 'row' / None for the module owning this parameter."""
        module = str(path[-2]) if len(path) >= 2 else ""
        parent = str(path[-3]) if len(path) >= 3 else ""
        if module in _TP_COL_MODULES or module.endswith("_w_1"):
            return "col"
        if module in _TP_ROW_MODULES or module.endswith("_w_2"):
            return "row"
        # vocoder MRF pairs: kernel path is .../conv{1,2}_k/conv/kernel
        if module == "conv":
            m = _VOCODER_PAIR.match(parent)
            if m:
                return "col" if m.group(1) == "1" else "row"
        # FS2-conformer FeedForwardModule: ff1/ff2 wrap two auto-named
        # Dense layers (in-projection then out-projection)
        if parent in ("ff1", "ff2"):
            if module == "Dense_0":
                return "col"
            if module == "Dense_1":
                return "row"
        return None

    for path, leaf in flat.items():
        shape = np.shape(leaf)
        r = role(path)
        spec = P()
        if str(path[-1]) == "kernel" and len(shape) >= 2:
            if r == "col" and shape[-1] % model_parallel == 0:
                spec = P(*([None] * (len(shape) - 1)), MODEL_AXIS)
            elif r == "row" and shape[-2] % model_parallel == 0:
                spec = P(*([None] * (len(shape) - 2)), MODEL_AXIS, None)
        elif str(path[-1]) == "bias" and r == "col" and len(
            shape
        ) == 1 and shape[0] % model_parallel == 0:
            spec = P(MODEL_AXIS)
        specs[path] = spec
    return traverse_util.unflatten_dict(specs)


def shard_params_tp(mesh: Mesh, tree: Any, params_specs: Any) -> Any:
    """Place a pytree that CONTAINS a params-shaped subtree (a raw params
    dict, or a TrainState whose ``params``/optimizer-state mirror it) with
    the given tensor-parallel specs; every other leaf is replicated."""
    from flax import traverse_util

    flat_specs = {
        tuple(map(str, k)): v
        for k, v in traverse_util.flatten_dict(params_specs).items()
    }
    leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
    placed = []
    for path, leaf in leaves:
        keys = tuple(
            p.key if hasattr(p, "key") else getattr(p, "name", str(p))
            for p in path
            if hasattr(p, "key") or hasattr(p, "name")
        )
        spec = P()
        for start in range(len(keys)):
            sub = keys[start:]
            if sub in flat_specs:
                spec = flat_specs[sub]
                break
        placed.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
    return jax.tree_util.tree_unflatten(treedef, placed)
