"""MCD / mel-distance evaluation tests, incl. the BASELINE 'MCD parity vs
reference outputs' measurement through imported weights."""

import pathlib

import numpy as np
import pytest

REFERENCE = pathlib.Path("/root/reference")


def test_dct_matrix_matches_scipy():
    from scipy.fftpack import dct as scipy_dct

    from viet_tts_tpu.eval.mcd import dct_matrix, mel_cepstra

    x = np.random.RandomState(0).randn(7, 80)
    want = scipy_dct(x, type=2, norm="ortho", axis=-1)[:, :13]
    got = mel_cepstra(x, 13)
    np.testing.assert_allclose(got, want, atol=1e-10)
    assert dct_matrix(80, 13).shape == (13, 80)


def test_mcd_basic_properties():
    from viet_tts_tpu.eval.mcd import mcd, mel_l1

    rng = np.random.RandomState(1)
    a = rng.randn(20, 80)
    assert mcd(a, a) == 0.0
    # constant offsets live entirely in c0, which MCD excludes
    assert mcd(a, a + 3.0) < 1e-9
    assert mcd(a, a + rng.randn(20, 80) * 0.1) > 0.0
    assert mel_l1(a, a + 1.0) == pytest.approx(1.0)
    # batched with lengths: padding frames must not contribute
    b = np.stack([a, a])
    b2 = b.copy()
    b2[1, 10:] += 100.0
    assert mcd(b, b2, lengths=np.asarray([20, 10])) == 0.0


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference not mounted")
def test_fs2_imported_weights_mcd_parity():
    """BASELINE target 3: MCD between the reference torch synthesis and the
    imported-weight JAX synthesis of the same inputs is ~0 dB."""
    import torch
    import jax.numpy as jnp

    from tests.test_torch_import import FS2_HP, _fs2_pair
    from viet_tts_tpu.eval.mcd import mcd, mel_l1

    tm, fm, variables = _fs2_pair(FS2_HP)
    # seed 2 gives non-degenerate predicted durations under random weights
    rng = np.random.RandomState(2)
    B, T_text = 2, 9
    text = rng.randint(1, 130, (B, T_text))
    text[1, 6:] = 0
    text_lens = np.asarray([T_text, 6])
    sids = np.asarray([1, 2])

    with torch.no_grad():
        t_mel, t_lens, _ = tm.inference(
            torch.from_numpy(sids).long(),
            torch.from_numpy(text).long(),
            torch.from_numpy(text_lens).long(),
        )
    t_mel = t_mel.transpose(1, 2).numpy()

    j_mel, j_lens, _ = fm.apply(
        variables,
        sids=jnp.asarray(sids),
        text=jnp.asarray(text),
        text_lengths=jnp.asarray(text_lens),
        max_mel_frames=int(t_lens.max()),
        method=fm.inference,
    )
    np.testing.assert_array_equal(np.asarray(j_lens), t_lens.numpy())
    score = mcd(np.asarray(j_mel), t_mel, lengths=np.asarray(t_lens))
    dist = mel_l1(np.asarray(j_mel), t_mel, lengths=np.asarray(t_lens))
    assert score < 0.01, score  # dB; >2 dB would mean architecture drift
    assert dist < 1e-3, dist
