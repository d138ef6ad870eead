"""Time->channel packed 1-D convolutions for small-channel vocoder stages.

The HiFi-GAN tail stages run dilated convs at C=32..64 channels over very
long sequences (reference architecture
`/root/reference/models/gan_tts/hifigan/generator.py:38-63`). The v5e MXU
is 128 lanes wide, so a C=32 conv fills a quarter of the array; HLO
roofline attribution (PERF_NOTES.md) puts these convs at the top of the
serving graph's cost. Packing ``r`` consecutive time steps into the channel
axis — ``(B, T, C) -> (B, T/r, r*C)`` — fills the lanes at the price of a
sparser (block-structured) kernel: measured 1.63x per conv at C=32/r=4 on
the chip, numerically exact (the block kernel contains every original tap
exactly once; the extra entries are zeros).

Elementwise ops (leaky_relu, residual adds, biases tiled r times) are
position-independent, so a whole residual stage runs packed between one
`pack_time` and one `unpack_time`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pack_time(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(B, T, C) -> (B, T//r, r*C); T must divide r."""
    B, T, C = x.shape
    assert T % r == 0, (T, r)
    return x.reshape(B, T // r, r * C)


def unpack_time(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(B, T', r*C) -> (B, T'*r, C)."""
    B, Tp, RC = x.shape
    assert RC % r == 0, (RC, r)
    return x.reshape(B, Tp * r, RC // r)


def _tap_layout(kernel_size: int, dilation: int, r: int):
    """Static (kp, slot, j, tap) quadruples + block-kernel size/origin for a
    SAME-padded dilated conv evaluated on the packed layout.

    Output slot j (original time t'*r + j) reads original input time
    t'*r + j + tap*dilation - pad, i.e. packed position (t' + blk, slot)
    with (blk, slot) = divmod(tap*dilation - pad + j, r).
    """
    pad = dilation * (kernel_size - 1) // 2
    entries = []
    blks = set()
    for j in range(r):
        for tap in range(kernel_size):
            delta = tap * dilation - pad + j
            blk, slot = divmod(delta, r)
            entries.append((blk, slot, j, tap))
            blks.add(blk)
    lo, hi = min(blks), max(blks)
    kp = hi - lo + 1
    origin = -lo
    return [(blk + origin, slot, j, tap) for blk, slot, j, tap in entries], kp, origin


def pack_kernel(w: jnp.ndarray, dilation: int, r: int) -> tuple:
    """Transform a (k, C, C) WIO kernel into its packed (kp, r*C, r*C)
    block kernel. Returns (w_packed, left_pad, right_pad) where the pads
    are the packed conv's explicit edge padding reproducing SAME semantics
    of the original dilated conv (odd kernel sizes)."""
    k, cin, cout = w.shape
    assert cin == cout, "packed tail stages are C->C convs"
    entries, kp, origin = _tap_layout(k, dilation, r)
    wp = jnp.zeros((kp, r * cin, r * cout), w.dtype)
    for kpi, slot, j, tap in entries:
        wp = wp.at[
            kpi, slot * cin : (slot + 1) * cin, j * cout : (j + 1) * cout
        ].set(w[tap])
    return wp, origin, kp - 1 - origin


def packed_dilated_conv(
    xp: jnp.ndarray, w: jnp.ndarray, dilation: int, r: int,
    bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """SAME dilated conv on the packed layout; exact vs the unpacked conv.

    xp: (B, T', r*C) packed activations; w: (k, C, C) original WIO kernel;
    bias: (C,), tiled across the r slots.
    """
    wp, pl, pr = pack_kernel(w, dilation, r)
    y = jax.lax.conv_general_dilated(
        xp, wp, window_strides=(1,), padding=[(pl, pr)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if bias is not None:
        y = y + jnp.tile(bias, r)
    return y
