"""Exactness of the time->channel packed conv (ops/packed_conv.py) vs the
plain dilated conv, including sequence edges."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viet_tts_tpu.ops.packed_conv import (
    pack_time,
    packed_dilated_conv,
    unpack_time,
)


def _ref_conv(x, w, dilation):
    k = w.shape[0]
    pad = dilation * (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(pad, pad)],
        rhs_dilation=(dilation,), dimension_numbers=("NWC", "WIO", "NWC"),
    )


@pytest.mark.parametrize("k,d,r,c", [
    (3, 1, 4, 8),
    (3, 5, 4, 8),
    (7, 3, 4, 8),
    (11, 5, 4, 8),
    (11, 5, 2, 16),
    (7, 1, 2, 16),
])
def test_packed_conv_exact(k, d, r, c):
    rng = np.random.RandomState(0)
    B, T = 2, 64
    x = jnp.asarray(rng.randn(B, T, c).astype(np.float32))
    w = jnp.asarray(rng.randn(k, c, c).astype(np.float32))
    b = jnp.asarray(rng.randn(c).astype(np.float32))

    ref = _ref_conv(x, w, d) + b
    got = unpack_time(packed_dilated_conv(pack_time(x, r), w, d, r, bias=b), r)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pack_roundtrip():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(3, 24, 5).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(unpack_time(pack_time(x, 4), 4)), np.asarray(x)
    )


def test_packed_vits_generator_exact():
    """VitsGenerator(packed_tail=True) matches the layer path under the
    same params (small shapes, CPU)."""
    from viet_tts_tpu.models.vits2.layers import VitsGenerator

    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(2, 12, 48).astype(np.float32))

    base = VitsGenerator(initial_channel=48, upsample_initial_channel=128)
    packed = VitsGenerator(
        initial_channel=48, upsample_initial_channel=128, packed_tail=True
    )
    variables = base.init(jax.random.PRNGKey(0), z)
    y0 = base.apply(variables, z)
    y1 = packed.apply(variables, z)
    assert y0.shape == y1.shape
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=2e-5, atol=2e-5)


def test_packed_generator_stage_exact():
    """HiFiGANGenerator(packed_tail=True) matches the layer path bit-for-
    tolerance under the same params (small shapes, CPU)."""
    from viet_tts_tpu.models.hifigan import HiFiGANGenerator

    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(2, 16, 80).astype(np.float32))

    base = HiFiGANGenerator()
    packed = HiFiGANGenerator(packed_tail=True)
    variables = base.init(jax.random.PRNGKey(0), mel)
    y0 = base.apply(variables, mel)
    y1 = packed.apply(variables, mel)
    assert y0.shape == y1.shape
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=2e-5, atol=2e-5)
