"""Pallas TPU kernel: fused multi-receptive-field (MRF) vocoder stage.

The HiFi-GAN/VITS decoder spends most of its time in per-stage stacks of
small-channel dilated convs (3 resblocks x 3 dilations x 2 convs = 18 convs
over up to 131k frames at 32..128 channels). XLA lowers these to VPU convs
bounded at a few TFLOP/s with an HBM round-trip per op. This kernel keeps a
time-tile resident in VMEM across the whole stage and evaluates each conv as
a kn2row matmul on the MXU:

    Z = leaky(h) @ W_packed            (L, C) x (C, C*k)  -> MXU
    y[t] = sum_j Z[t + j*d - pad, j]   static shifted adds -> VPU

One HBM read of the input tile (plus halo) and one write of the stage
output replace 36+ full-tensor round trips.

Exactness: each conv zero-pads at true sequence boundaries. Inside the
kernel, invalid absolute positions are re-zeroed after every conv (leaky(0)
== 0 keeps them zero through activations) and buffer-edge corruption is
confined to the halo, so the emitted tile matches the layer-by-layer
reference computation.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def stage_halo(kernel_sizes: Sequence[int], dilations: Sequence[Sequence[int]]) -> int:
    """Max one-sided receptive-field growth across a block's conv chain."""
    halos = []
    for k, dils in zip(kernel_sizes, dilations):
        total = 0
        for d in dils:
            total += (k - 1) // 2 * d  # dilated conv
            total += (k - 1) // 2  # follow-up dilation-1 conv
        halos.append(total)
    return max(halos)


GROUP = 4  # taps packed per matmul (K = GROUP*C fills the MXU K dim at C=32)


def _shift(a, off: int, L: int, row):
    """Zero-filled static time shift: out[t] = a[t + off] (Mosaic-safe:
    circular sublane roll + edge mask)."""
    if off == 0:
        return a
    rolled = pltpu.roll(a, -off % L, axis=0)
    valid = (row + off >= 0) & (row + off < L)
    return jnp.where(valid, rolled, 0.0)


def _conv_tap_packed(a, w_stack, bias, k: int, d: int, L: int, C: int, row):
    """y[t] = sum_j a[t + j*d - pad] @ W[j] + bias, zero-padded at edges.

    a: (L, C); w_stack: tuple of per-group vstacked weights (g*C, C) packing
    up to GROUP taps, so each matmul runs with K = GROUP*C on the MXU.
    """
    pad = (k - 1) // 2 * d
    y = jnp.zeros((L, C), jnp.float32)
    j = 0
    for wg in w_stack:
        g = wg.shape[0] // C
        cols = [_shift(a, (j + i) * d - pad, L, row) for i in range(g)]
        X = cols[0] if g == 1 else jnp.concatenate(cols, axis=1)  # (L, g*C)
        y = y + jnp.dot(X, wg, preferred_element_type=jnp.float32)
        j += g
    return y + bias[None, :]


def _tap_groups(k: int):
    """Static tap grouping: e.g. k=11 -> (4, 4, 3)."""
    groups = []
    left = k
    while left > 0:
        g = min(GROUP, left)
        groups.append(g)
        left -= g
    return tuple(groups)


def _make_kernel(kernel_sizes, dilations, tile, halo, C, lrelu, out_dtype, n_weight_args):
    L = tile + 2 * halo
    n_blocks = len(kernel_sizes)

    def kernel(seq_len_ref, x_tile_ref, *args):
        weights = list(args[:n_weight_args])
        out_ref = args[n_weight_args]

        i = pl.program_id(1)
        t0 = i * tile  # start of the tile in the PADDED input (= halo offset)

        seq_len = seq_len_ref[0]
        # absolute position of buffer row r is (t0 - halo + r) in the true seq
        row = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)
        pos = row + (t0 - halo)
        valid = (pos >= 0) & (pos < seq_len)

        it = iter(weights)

        def next_conv(k):
            groups = tuple(
                next(it)[:].astype(jnp.float32) for _ in _tap_groups(k)
            )
            bias = next(it)[:].astype(jnp.float32)
            return groups, bias

        x0 = x_tile_ref[0, 0].astype(jnp.float32) * valid
        acc = jnp.zeros((L, C), jnp.float32)
        for blk, (k, dils) in enumerate(zip(kernel_sizes, dilations)):
            h = x0
            for d in dils:
                w1, b1 = next_conv(k)
                w2, b2 = next_conv(k)
                a = jnp.where(h > 0, h, lrelu * h)
                y = _conv_tap_packed(a, w1, b1, k, d, L, C, row) * valid
                a2 = jnp.where(y > 0, y, lrelu * y)
                y2 = _conv_tap_packed(a2, w2, b2, k, 1, L, C, row) * valid
                h = h + y2
            acc = acc + h
        out_ref[0] = (acc / n_blocks)[halo : halo + tile].astype(out_dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("kernel_sizes", "dilations", "lrelu", "tile", "interpret"),
)
def fused_mrf_stage(
    x: jnp.ndarray,
    seq_len: jnp.ndarray,
    w1s: Tuple[jnp.ndarray, ...],
    b1s: Tuple[jnp.ndarray, ...],
    w2s: Tuple[jnp.ndarray, ...],
    b2s: Tuple[jnp.ndarray, ...],
    kernel_sizes: Tuple[int, ...] = (3, 7, 11),
    dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5), (1, 3, 5), (1, 3, 5)),
    lrelu: float = 0.1,
    tile: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused resblock-stage: mean over blocks of chained dilated conv pairs.

    Args:
        x: (B, T, C) stage input.
        seq_len: scalar int32 — true sequence length (zero-padding boundary;
            pass T for fully-valid inputs).
        w1s/b1s/w2s/b2s: per block, stacked conv params with shapes
            (n_d, k, C, C) / (n_d, C); w1 dilated, w2 dilation-1.

    Returns (B, T, C), numerically matching the layer-by-layer stage.
    """
    B, T, C = x.shape
    halo = stage_halo(kernel_sizes, dilations)
    tile = min(tile, max(128, T))
    n_tiles = -(-T // tile)
    Tpad = n_tiles * tile

    # pad: halo on the left, halo + tile remainder on the right
    xp = jnp.pad(x, ((0, 0), (halo, halo + Tpad - T), (0, 0)))

    L = tile + 2 * halo
    # flatten weights in the kernel's static consumption order: per block,
    # per dilation, conv1 groups + bias then conv2 groups + bias. Each group
    # is the vstack of up to GROUP taps -> matmul K = g*C.
    packed = []
    for blk, k in enumerate(kernel_sizes):
        groups = _tap_groups(k)
        for di in range(len(dilations[blk])):
            for w_all, b_all in ((w1s[blk], b1s[blk]), (w2s[blk], b2s[blk])):
                w = w_all[di]  # (k, C, C)
                j = 0
                for g in groups:
                    packed.append(w[j : j + g].reshape(g * C, C))
                    j += g
                packed.append(b_all[di])

    kernel = _make_kernel(
        kernel_sizes, dilations, tile, halo, C, lrelu, x.dtype, len(packed)
    )
    # overlapped tiles built at the XLA level (one extra copy of x, ~1.05x):
    # Mosaic cannot DMA-slice sub-128-lane HBM tensors with dynamic starts.
    idx = (np.arange(n_tiles)[:, None] * tile + np.arange(L)[None, :])
    x_tiles = xp[:, idx]  # (B, n_tiles, L, C)

    grid = (B, n_tiles)
    in_specs = [
        pl.BlockSpec(
            (1, 1, L, C), lambda b, i, *_: (b, i, 0, 0), memory_space=pltpu.VMEM
        )
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in packed]
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, tile, C), lambda b, i, *_: (b, i, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((B, Tpad, C), x.dtype),
        interpret=interpret,
    )(jnp.asarray([seq_len], jnp.int32), x_tiles, *packed)
    return out[:, :T]
