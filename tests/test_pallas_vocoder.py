"""Parity tests for the fused MRF vocoder-stage Pallas kernel (interpret
mode on CPU; compiled path exercised on real TPU hardware only)."""

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np
import pytest

from viet_tts_tpu.models.hifigan.generator import ResidualBlock
from viet_tts_tpu.ops.pallas_vocoder import fused_mrf_stage, stage_halo, _tap_groups

KS = (3, 7, 11)
DILS = ((1, 3, 5),) * 3


def test_stage_halo():
    assert stage_halo(KS, DILS) == 60  # k=11: (5+5)+(15+5)+(25+5)
    assert stage_halo((3,), ((1, 3, 5),)) == 12


def test_tap_groups():
    assert _tap_groups(3) == (3,)
    assert _tap_groups(7) == (4, 3)
    assert _tap_groups(11) == (4, 4, 3)


def _weights(params, C=32):
    w1s, b1s, w2s, b2s = [], [], [], []
    for j in range(len(KS)):
        blk = params[f"b{j}"]
        w1s.append(jnp.asarray(np.stack([np.asarray(blk[f"conv1_{i}"]["conv"]["kernel"]) for i in range(3)])))
        b1s.append(jnp.asarray(np.stack([np.asarray(blk[f"conv1_{i}"]["conv"]["bias"]) for i in range(3)])))
        w2s.append(jnp.asarray(np.stack([np.asarray(blk[f"conv2_{i}"]["conv"]["kernel"]) for i in range(3)])))
        b2s.append(jnp.asarray(np.stack([np.asarray(blk[f"conv2_{i}"]["conv"]["bias"]) for i in range(3)])))
    return tuple(w1s), tuple(b1s), tuple(w2s), tuple(b2s)


@pytest.mark.parametrize("T,tile", [(300, 128), (256, 256)])
def test_fused_stage_matches_reference(T, tile):
    C = 32
    rng = np.random.RandomState(0)
    x = rng.randn(2, T, C).astype(np.float32) * 0.5

    class Trio(nn.Module):
        @nn.compact
        def __call__(self, x):
            acc = 0.0
            for j, k in enumerate(KS):
                acc = acc + ResidualBlock(
                    C, k, DILS[j], use_weight_norm=False, name=f"b{j}"
                )(x)
            return acc / len(KS)

    m = Trio()
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ref = np.asarray(m.apply(v, jnp.asarray(x)))
    w1s, b1s, w2s, b2s = _weights(v["params"], C)

    out = np.asarray(
        fused_mrf_stage(
            jnp.asarray(x), jnp.int32(T), w1s, b1s, w2s, b2s,
            kernel_sizes=KS, dilations=DILS, tile=tile, interpret=True,
        )
    )
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_fused_stage_sequence_boundary():
    """seq_len < T must reproduce running the stage on the truncated input."""
    C = 32
    rng = np.random.RandomState(1)
    x = rng.randn(1, 300, C).astype(np.float32) * 0.5

    class Trio(nn.Module):
        @nn.compact
        def __call__(self, x):
            acc = 0.0
            for j, k in enumerate(KS):
                acc = acc + ResidualBlock(
                    C, k, DILS[j], use_weight_norm=False, name=f"b{j}"
                )(x)
            return acc / len(KS)

    m = Trio()
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ref = np.asarray(m.apply(v, jnp.asarray(x[:, :200])))
    w1s, b1s, w2s, b2s = _weights(v["params"], C)
    out = np.asarray(
        fused_mrf_stage(
            jnp.asarray(x), jnp.int32(200), w1s, b1s, w2s, b2s,
            kernel_sizes=KS, dilations=DILS, tile=128, interpret=True,
        )
    )[:, :200]
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_generator_fused_mrf_matches_layer_path():
    """HiFiGANGenerator(fused_mrf=True) must match the layer-by-layer module
    on the same parameters (weight-normed, full 4-stage config)."""
    from viet_tts_tpu.models.hifigan import HiFiGANGenerator

    mel = np.random.RandomState(0).randn(1, 23, 80).astype(np.float32)
    base = HiFiGANGenerator(channels=32)
    v = base.init(jax.random.PRNGKey(0), jnp.asarray(mel))
    ref = np.asarray(base.apply(v, jnp.asarray(mel)))

    fused = HiFiGANGenerator(channels=32, fused_mrf=True, fused_interpret=True)
    out = np.asarray(fused.apply(v, jnp.asarray(mel)))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-5)
