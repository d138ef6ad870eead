"""PyTorch->JAX checkpoint import: numerical parity vs the reference model.

Instantiates the reference's own (pure-torch) HiFiGAN generator, imports its
weights into the flax generator, and requires bit-level waveform agreement.
"""

import pathlib
import sys
import types

import numpy as np
import pytest

REFERENCE = pathlib.Path("/root/reference")


def _stub_reference_deps():
    import torch.nn as tnn

    hf = types.ModuleType("humanfriendly")
    hf.parse_size = lambda s: 16000
    sys.modules.setdefault("humanfriendly", hf)
    tg = types.ModuleType("typeguard")
    tg.check_argument_types = lambda: True
    sys.modules.setdefault("typeguard", tg)
    for name, attrs in [
        ("espnet2", {}),
        ("espnet2.layers", {}),
        ("espnet2.layers.log_mel", {"LogMel": tnn.Module}),
        ("espnet2.layers.stft", {"Stft": tnn.Module}),
        ("espnet2.tts", {}),
        ("espnet2.tts.feats_extract", {}),
        ("espnet2.tts.feats_extract.abs_feats_extract", {"AbsFeatsExtract": tnn.Module}),
    ]:
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules.setdefault(name, m)


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference not mounted")
def test_hifigan_import_bitwise_parity():
    import torch
    import jax
    import jax.numpy as jnp

    from viet_tts_tpu.models.hifigan import HiFiGANGenerator
    from viet_tts_tpu.train.torch_import import import_hifigan_generator

    _stub_reference_deps()
    sys.path.insert(0, str(REFERENCE))
    try:
        from models.gan_tts.hifigan.generator import HiFiGAN as TorchHiFiGAN
    finally:
        sys.path.remove(str(REFERENCE))

    torch.manual_seed(0)
    tg = TorchHiFiGAN(channels=64).eval()
    mel = np.random.RandomState(0).randn(2, 80, 37).astype(np.float32)
    with torch.no_grad():
        ref = tg(torch.from_numpy(mel)).numpy()

    fg = HiFiGANGenerator(channels=64)
    params = import_hifigan_generator(tg.state_dict())

    # the imported tree is exactly the init tree's structure
    from flax import traverse_util

    v = fg.init(jax.random.PRNGKey(0), jnp.zeros((2, 37, 80)))
    assert set(traverse_util.flatten_dict(v["params"])) == set(
        traverse_util.flatten_dict(params)
    )

    out = np.asarray(
        fg.apply({"params": params}, jnp.asarray(mel.transpose(0, 2, 1)))
    )[..., 0][:, None]
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-6)
