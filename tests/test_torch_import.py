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


# ---------------------------------------------------------------------------
# FastSpeech2 import parity
# ---------------------------------------------------------------------------

FS2_HP = {
    "max_seq_len": 1000,
    "encoder_layers": 2,
    "encoder_hidden": 32,
    "decoder_layers": 2,
    "decoder_hidden": 32,
    "use_cvae": False,
    "use_postnet": True,
    "building_block": {
        "block_type": "transformer",
        "transformer": {
            "encoder_head": 2,
            "decoder_head": 2,
            "conv_filter_size": 64,
            "conv_kernel_size": [9, 1],
            "encoder_dropout": 0.2,
            "decoder_dropout": 0.2,
        },
    },
    "variance": {
        "learn_alignment": False,
        "duration_modelling": {
            "use_gaussian": True,
            "aligner_temperature": 0.0005,
            "binarization_start_steps": 6000,
        },
        "variance_predictor": {
            "filter_size": 16,
            "kernel_size": 3,
            "dropout": 0.5,
            "dur_predictor_layers": 2,
            "dur_predictor_kernel": 3,
            "pit_predictor_layers": 2,
            "pit_predictor_kernel": 5,
            "ener_predictor_layers": 2,
            "ener_predictor_kernel": 5,
            "ffn_padding": "SAME",
            "ffn_act": "gelu",
        },
        "variance_embedding": {
            "n_bins": 16,
            "pitch_feature": "phoneme_level",
            "pitch_quantization": "linear",
            "energy_feature": "phoneme_level",
            "energy_quantization": "linear",
        },
    },
    "postnet": {"embedding_dim": 16, "conv_layers": 5, "kernel_size": 5},
}
FS2_STATS = {
    "pitch": {"min": -3.0, "max": 8.0, "mean": 0.0, "std": 1.0},
    "energy": {"min": -3.0, "max": 8.0, "mean": 0.0, "std": 1.0},
}


def _stub_fs2_deps():
    """Stub numba + espnet bits the reference FS2 pulls in at import time."""
    import torch
    import torch.nn as tnn

    _stub_reference_deps()
    numba = types.ModuleType("numba")
    numba.jit = lambda *a, **k: (a[0] if a and callable(a[0]) else (lambda f: f))
    numba.prange = range
    sys.modules.setdefault("numba", numba)
    # the FUNCTIONAL equivalent, not a bare Module: the reference binds
    # this name at import time and caches the module, so a placeholder
    # would poison every later CVAE test in the session
    from tests.espnet_torch_equiv import ReferenceEncoder

    gst = types.ModuleType("espnet2.tts.gst.style_encoder")
    gst.ReferenceEncoder = ReferenceEncoder
    for name in ["espnet2.tts.gst"]:
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules.setdefault("espnet2.tts.gst.style_encoder", gst)
    nets_utils = types.ModuleType("espnet.nets.pytorch_backend.nets_utils")

    def pad_list(xs, pad_value):
        n = len(xs)
        maxlen = max(x.size(0) for x in xs)
        out = xs[0].new_full((n, maxlen, *xs[0].size()[1:]), pad_value)
        for i, x in enumerate(xs):
            out[i, : x.size(0)] = x
        return out

    nets_utils.pad_list = pad_list
    for name in ["espnet", "espnet.nets", "espnet.nets.pytorch_backend"]:
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules.setdefault("espnet.nets.pytorch_backend.nets_utils", nets_utils)


def _load_reference_fs2():
    _stub_fs2_deps()
    sys.path.insert(0, str(REFERENCE))
    try:
        from models.tts.fastspeech2.model import FastSpeech2 as TorchFS2
    finally:
        sys.path.remove(str(REFERENCE))
    return TorchFS2


def _fs2_pair(hp, seed=0):
    """(torch model in eval, flax model, imported variables)."""
    import copy
    import torch

    from viet_tts_tpu.models.fastspeech2 import FastSpeech2
    from viet_tts_tpu.train.torch_import import import_fastspeech2

    TorchFS2 = _load_reference_fs2()
    torch.manual_seed(seed)
    tm = TorchFS2(
        n_symbols=130, n_channels=80, hparams=copy.deepcopy(hp),
        stats=copy.deepcopy(FS2_STATS), n_speakers=3,
    ).eval()
    fm = FastSpeech2(
        n_symbols=130, n_channels=80, hparams=copy.deepcopy(hp),
        stats=copy.deepcopy(FS2_STATS), n_speakers=3,
    )
    variables = import_fastspeech2(tm.state_dict(), hp)
    return tm, fm, variables


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference not mounted")
def test_fastspeech2_transformer_import_tree_matches_init():
    import jax
    import jax.numpy as jnp
    from flax import traverse_util

    tm, fm, variables = _fs2_pair(FS2_HP)
    rng = np.random.RandomState(0)
    B, T_text, T_mel = 2, 11, 40
    key = jax.random.PRNGKey(0)
    init = fm.init(
        {"params": key, "dropout": key},
        text=jnp.asarray(rng.randint(1, 130, (B, T_text))),
        text_lengths=jnp.asarray([T_text, 8]),
        feats=jnp.asarray(rng.randn(B, T_mel, 80), jnp.float32),
        feats_lengths=jnp.asarray([T_mel, 30]),
        duration=jnp.asarray(rng.randint(1, 5, (B, T_text)), jnp.float32),
        pitch=jnp.asarray(rng.randn(B, T_mel), jnp.float32),
        energy=jnp.asarray(rng.randn(B, T_mel), jnp.float32),
        sids=jnp.asarray([0, 1]),
        train=False,
    )
    got = set(traverse_util.flatten_dict(variables["params"]))
    want = set(traverse_util.flatten_dict(init["params"]))
    assert got == want, (sorted(want - got)[:8], sorted(got - want)[:8])
    got_bs = set(traverse_util.flatten_dict(variables["batch_stats"]))
    want_bs = set(traverse_util.flatten_dict(init["batch_stats"]))
    assert got_bs == want_bs


def _fs2_teacher_forced_check(hp, atol=2e-4):
    import torch
    import jax.numpy as jnp

    tm, fm, variables = _fs2_pair(hp)
    rng = np.random.RandomState(1)
    B, T_text = 2, 11
    text = rng.randint(1, 130, (B, T_text))
    text[1, 8:] = 0
    text_lens = np.asarray([T_text, 8])
    # durations summing exactly to feats lengths
    dur = rng.randint(1, 5, (B, T_text))
    dur[1, 8:] = 0
    feats_lens = dur.sum(1)
    T_mel = int(feats_lens.max())
    feats = rng.randn(B, T_mel, 80).astype(np.float32)
    pitch = rng.randn(B, T_mel).astype(np.float32)
    energy = rng.randn(B, T_mel).astype(np.float32)
    sids = np.asarray([0, 2])

    with torch.no_grad():
        # NOTE: .copy() matters — the reference's frame2phoneme
        # (`function.py:186-197`) averages IN PLACE through the numpy view,
        # so the torch forward would otherwise corrupt our inputs.
        (t_outs, t_post, t_logd, t_p, t_e, *_), _ = tm(
            torch.from_numpy(text).long(),
            torch.from_numpy(text_lens).long(),
            torch.from_numpy(feats.copy()),
            torch.from_numpy(feats_lens).long(),
            torch.from_numpy(dur).long(),
            torch.from_numpy(pitch.copy()),
            torch.from_numpy(energy.copy()),
            torch.from_numpy(sids).long(),
            None,
            0,
        )

    (j_outs, j_post, j_logd, j_p, j_e, *_), _ = fm.apply(
        variables,
        text=jnp.asarray(text),
        text_lengths=jnp.asarray(text_lens),
        feats=jnp.asarray(feats),
        feats_lengths=jnp.asarray(feats_lens),
        duration=jnp.asarray(dur, jnp.float32),
        pitch=jnp.asarray(pitch),
        energy=jnp.asarray(energy),
        sids=jnp.asarray(sids),
        train=False,
    )
    for b in range(B):
        lt, lm = int(text_lens[b]), int(feats_lens[b])
        np.testing.assert_allclose(
            np.asarray(j_logd)[b, :lt], t_logd.numpy()[b, :lt], atol=atol
        )
        np.testing.assert_allclose(
            np.asarray(j_p)[b, :lt], t_p.numpy()[b, :lt], atol=atol
        )
        np.testing.assert_allclose(
            np.asarray(j_e)[b, :lt], t_e.numpy()[b, :lt], atol=atol
        )
        np.testing.assert_allclose(
            np.asarray(j_outs)[b, :lm], t_outs.numpy()[b, :lm], atol=atol
        )
        np.testing.assert_allclose(
            np.asarray(j_post)[b, :lm], t_post.numpy()[b, :lm], atol=atol
        )


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference not mounted")
def test_fastspeech2_transformer_teacher_forced_parity():
    _fs2_teacher_forced_check(FS2_HP)


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference not mounted")
def test_fastspeech2_transformer_inference_parity():
    import torch
    import jax.numpy as jnp

    tm, fm, variables = _fs2_pair(FS2_HP)
    rng = np.random.RandomState(2)
    B, T_text = 2, 9
    text = rng.randint(1, 130, (B, T_text))
    text[1, 6:] = 0
    text_lens = np.asarray([T_text, 6])
    sids = np.asarray([1, 2])

    with torch.no_grad():
        t_mel, t_lens, t_emb = tm.inference(
            torch.from_numpy(sids).long(),
            torch.from_numpy(text).long(),
            torch.from_numpy(text_lens).long(),
        )
    t_mel = t_mel.transpose(1, 2).numpy()  # back to (B, T, n_mel)

    # budget == torch's max length: the postnet convs see the same
    # out-of-range frames (the reference's own outputs depend on batch
    # padding the same way; with a larger budget only frames within the
    # postnet receptive field of the boundary differ).
    j_mel, j_lens, j_emb = fm.apply(
        variables,
        sids=jnp.asarray(sids),
        text=jnp.asarray(text),
        text_lengths=jnp.asarray(text_lens),
        max_mel_frames=int(t_lens.max()),
        method=fm.inference,
    )
    np.testing.assert_array_equal(np.asarray(j_lens), t_lens.numpy())
    np.testing.assert_allclose(np.asarray(j_emb), t_emb.numpy(), atol=1e-5)
    for b in range(B):
        L = int(t_lens[b])
        np.testing.assert_allclose(
            np.asarray(j_mel)[b, :L], t_mel[b, :L], atol=3e-4
        )


def _fs2_conformer_hp():
    import copy

    hp = copy.deepcopy(FS2_HP)
    hp["building_block"] = {
        "block_type": "conformer",
        "conformer": {
            "encoder_head": 2,
            "decoder_head": 2,
            "ffn_expansion_factor": 4,
            "conv_kernel_size": 7,
            "conv_expansion_factor": 2,
            "half_step_residual": True,
            "encoder_dropout": 0.1,
            "decoder_dropout": 0.1,
        },
    }
    return hp


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference not mounted")
def test_fastspeech2_conformer_teacher_forced_parity():
    # certifies the rel-pos attention stack (u/v biases, relative shift,
    # sqrt(d_model) scaling, macaron FFNs, GLU conv module) against the
    # reference's own torch modules under imported weights
    _fs2_teacher_forced_check(_fs2_conformer_hp(), atol=5e-4)


# ---------------------------------------------------------------------------
# JETS import parity (reference orchestration + espnet torch equivalents)
# ---------------------------------------------------------------------------

JETS_HP = {
    "adim": 32,
    "aheads": 2,
    "elayers": 2,
    "eunits": 64,
    "dlayers": 2,
    "dunits": 64,
    "positionwise_layer_type": "conv1d",
    "positionwise_conv_kernel_size": 3,
    "duration_predictor_layers": 2,
    "duration_predictor_chans": 24,
    "duration_predictor_kernel_size": 3,
    "pitch_predictor_layers": 5,
    "pitch_predictor_chans": 24,
    "pitch_predictor_kernel_size": 5,
    "pitch_embed_kernel_size": 1,
    "pitch_embed_dropout": 0.0,
    "energy_predictor_layers": 2,
    "energy_predictor_chans": 24,
    "energy_predictor_kernel_size": 3,
    "energy_embed_kernel_size": 1,
    "energy_embed_dropout": 0.0,
    "stop_gradient_from_pitch_predictor": True,
    "use_gst": True,
    "gst_tokens": 4,
    "gst_heads": 2,
    "generator_channels": 16,
    "generator_upsample_scales": [4, 3],
    "generator_upsample_kernel_sizes": [8, 6],
    "generator_resblock_kernel_sizes": [3],
    "generator_resblock_dilations": [[1, 3]],
    "segment_size": 8,
}


def _load_reference_jets():
    import importlib

    from tests import espnet_torch_equiv

    espnet_torch_equiv.install(str(REFERENCE))
    sys.path.insert(0, str(REFERENCE))
    try:
        mod = importlib.import_module("models.gan_tts.jets.model")
    finally:
        sys.path.remove(str(REFERENCE))
    return mod.JETS


def _jets_pair(hp, seed=0, n_symbols=90, spks=3):
    import torch

    from viet_tts_tpu.models.jets import JETS as FlaxJETS
    from viet_tts_tpu.train.torch_import import import_jets

    TorchJETS = _load_reference_jets()
    torch.manual_seed(seed)
    tm = TorchJETS(
        idim=n_symbols + 1, odim=80, spks=spks, init_type="pytorch", **hp
    ).eval()
    fm = FlaxJETS(
        n_symbols=n_symbols, n_channels=80, hparams=dict(hp), n_speakers=spks
    )
    variables = import_jets(tm.state_dict(), hp)
    return tm, fm, variables


def _jets_batch(seed=3, B=2, T_text=9, T_mel=26):
    rng = np.random.RandomState(seed)
    text = rng.randint(1, 90, (B, T_text))
    text[1:, 7:] = 0
    text_lens = np.asarray([T_text, 7][:B])
    feats_lens = np.asarray([T_mel, 20][:B])
    return dict(
        text=text,
        text_lens=text_lens,
        feats=rng.randn(B, T_mel, 80).astype(np.float32),
        feats_lens=feats_lens,
        pitch=rng.randn(B, T_mel, 1).astype(np.float32),
        energy=rng.randn(B, T_mel, 1).astype(np.float32),
        sids=np.asarray([0, 2][:B]),
    )


def _jets_forward_parity(hp, atol=3e-4):
    import torch
    import jax
    import jax.numpy as jnp

    tm, fm, variables = _jets_pair(hp)
    b = _jets_batch()
    with torch.no_grad():
        (_, t_bin, t_lp, _, t_d, t_ds, t_p, t_ps, t_e, t_es) = tm(
            torch.from_numpy(b["text"]).long(),
            torch.from_numpy(b["text_lens"]).long(),
            torch.from_numpy(b["feats"]),
            torch.from_numpy(b["feats_lens"]).long(),
            torch.from_numpy(b["pitch"]),
            torch.from_numpy(b["feats_lens"]).long(),
            torch.from_numpy(b["energy"]),
            torch.from_numpy(b["feats_lens"]).long(),
            torch.from_numpy(b["sids"]).long(),
        )

    outs = fm.apply(
        variables,
        text=jnp.asarray(b["text"]),
        text_lengths=jnp.asarray(b["text_lens"]),
        feats=jnp.asarray(b["feats"]),
        feats_lengths=jnp.asarray(b["feats_lens"]),
        pitch=jnp.asarray(b["pitch"]),
        energy=jnp.asarray(b["energy"]),
        sids=jnp.asarray(b["sids"]),
        train=False,
        rngs={"noise": jax.random.PRNGKey(0)},
    )
    (_, j_bin, j_lp, _, j_d, j_ds, j_p, j_ps, j_e, j_es) = outs

    np.testing.assert_array_equal(np.asarray(j_ds), t_ds.numpy())
    np.testing.assert_allclose(float(j_bin), float(t_bin), atol=atol)
    for bi in range(len(b["text_lens"])):
        lt = int(b["text_lens"][bi])
        lm = int(b["feats_lens"][bi])
        np.testing.assert_allclose(
            np.asarray(j_lp)[bi, :lm, :lt], t_lp.numpy()[bi, :lm, :lt], atol=atol
        )
        for j_arr, t_arr in [(j_d, t_d), (j_p, t_p), (j_ps, t_ps),
                             (j_e, t_e), (j_es, t_es)]:
            np.testing.assert_allclose(
                np.asarray(j_arr)[bi, :lt], t_arr.numpy()[bi, :lt], atol=atol
            )


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference not mounted")
def test_jets_import_tree_matches_init():
    import jax
    import jax.numpy as jnp
    from flax import traverse_util

    tm, fm, variables = _jets_pair(JETS_HP)
    b = _jets_batch()
    key = jax.random.PRNGKey(0)
    init = fm.init(
        {"params": key, "dropout": key, "noise": key},
        text=jnp.asarray(b["text"]),
        text_lengths=jnp.asarray(b["text_lens"]),
        feats=jnp.asarray(b["feats"]),
        feats_lengths=jnp.asarray(b["feats_lens"]),
        pitch=jnp.asarray(b["pitch"]),
        energy=jnp.asarray(b["energy"]),
        sids=jnp.asarray(b["sids"]),
        train=True,
    )
    for col in ["params", "batch_stats"]:
        got = set(traverse_util.flatten_dict(variables[col]))
        want = set(traverse_util.flatten_dict(init[col]))
        assert got == want, (col, sorted(want - got)[:8], sorted(got - want)[:8])


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference not mounted")
def test_jets_transformer_forward_parity():
    """Certifies the espnet transformer stack, GST (conv+GRU+style tokens),
    alignment module, in-graph MAS and duration-averaging under imported
    weights against the reference's own JETS forward
    (`models/gan_tts/jets/model.py:505-643`)."""
    _jets_forward_parity(JETS_HP)


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference not mounted")
def test_jets_inference_waveform_parity():
    """Full fused text->waveform inference parity incl. the HiFiGAN
    generator (`models/gan_tts/jets/model.py:645-746`)."""
    import torch
    import jax.numpy as jnp

    tm, fm, variables = _jets_pair(JETS_HP)
    b = _jets_batch(B=1)
    with torch.no_grad():
        t_wav, t_wl = tm.inference(
            torch.from_numpy(b["text"]).long(),
            torch.from_numpy(b["text_lens"]).long(),
            feats=torch.from_numpy(b["feats"]),
            sids=torch.from_numpy(b["sids"]).long(),
        )
    up = int(np.prod(JETS_HP["generator_upsample_scales"]))
    frames = t_wav.shape[-1] // up

    j_wav, j_wl = fm.apply(
        variables,
        jnp.asarray(b["sids"]),
        jnp.asarray(b["text"]),
        jnp.asarray(b["text_lens"]),
        int(frames),
        feats=jnp.asarray(b["feats"]),
        method=fm.inference,
    )
    assert int(j_wl[0]) == int(t_wl[0])
    np.testing.assert_allclose(
        np.asarray(j_wav)[0], t_wav.numpy()[0], atol=1e-3
    )


def _jets_conformer_hp(rel_pos_type):
    hp = dict(JETS_HP)
    hp.update(
        encoder_type="conformer",
        decoder_type="conformer",
        conformer_rel_pos_type=rel_pos_type,
        conformer_pos_enc_layer_type="rel_pos",
        conformer_self_attn_layer_type="rel_selfattn",
        conformer_enc_kernel_size=7,
        conformer_dec_kernel_size=7,
        use_gst=False,
    )
    return hp


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference not mounted")
def test_jets_conformer_latest_forward_parity():
    """espnet conformer 'latest' rel-pos stack under imported weights."""
    _jets_forward_parity(_jets_conformer_hp("latest"), atol=5e-4)


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference not mounted")
def test_jets_conformer_legacy_forward_parity():
    """espnet conformer 'legacy' rel-pos variant (the reference's
    compatibility fallback, `jets/model.py:272-293`)."""
    _jets_forward_parity(_jets_conformer_hp("legacy"), atol=5e-4)


# ---------------------------------------------------------------------------
# VITS2 import parity
# ---------------------------------------------------------------------------

VITS2_HP = {
    "segment_size": 48,
    "inter_channels": 32,
    "hidden_channels": 32,
    "filter_channels": 64,
    "n_heads": 2,
    "n_layers": 3,  # reference asserts cond_layer_idx(2) < n_layers
    "kernel_size": 3,
    "p_dropout": 0.1,
    "resblock": "1",
    "resblock_kernel_sizes": [3],
    "resblock_dilation_sizes": [[1, 3, 5]],  # ResBlock1 hardcodes 3 dilations
    "upsample_rates": [4, 3],
    "upsample_initial_channel": 16,
    "upsample_kernel_sizes": [8, 6],
    "gin_channels": 16,
    "use_sdp": True,
    "use_mel_posterior_encoder": True,
    "use_transformer_flows": True,
    "transformer_flow_type": "pre_conv",
    "use_spk_conditioned_encoder": True,
    "use_noise_scaled_mas": True,
    # the reference hardcodes 16 posterior WN layers (`generator.py:116-124`)
    "n_layers_q": 16,
}


def _load_reference_vits2():
    import importlib

    from tests import espnet_torch_equiv

    espnet_torch_equiv.install(str(REFERENCE))
    sys.path.insert(0, str(REFERENCE))
    try:
        mod = importlib.import_module("models.gan_tts.vits2.generator")
    finally:
        sys.path.remove(str(REFERENCE))
    return mod.VITS2


def _vits2_pair(hp, seed=0, n_symbols=90, spks=3):
    import torch

    from viet_tts_tpu.models.vits2 import VITS2 as FlaxVITS2
    from viet_tts_tpu.train.torch_import import import_vits2

    TorchVITS2 = _load_reference_vits2()
    torch.manual_seed(seed)
    tm = TorchVITS2(
        n_vocab=n_symbols, spec_channels=80, n_speakers=spks, **hp
    ).eval()
    fm = FlaxVITS2(n_symbols=n_symbols, hparams=dict(hp), n_speakers=spks)
    variables = import_vits2(tm.state_dict(), hp)
    return tm, fm, variables


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference not mounted")
def test_vits2_import_tree_matches_init():
    import jax
    import jax.numpy as jnp
    from flax import traverse_util

    tm, fm, variables = _vits2_pair(VITS2_HP)
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    B, T_text, T_spec = 2, 9, 24
    init = fm.init(
        {"params": key, "dropout": key, "noise": key, "segment": key},
        text=jnp.asarray(rng.randint(1, 90, (B, T_text))),
        text_lengths=jnp.asarray([T_text, 7]),
        feats=jnp.asarray(rng.randn(B, T_spec, 80), jnp.float32),
        feats_lengths=jnp.asarray([T_spec, 20]),
        sids=jnp.asarray([0, 1]),
        train=True,
    )
    got = set(traverse_util.flatten_dict(variables["params"]))
    want = set(traverse_util.flatten_dict(init["params"]))
    assert got == want, (sorted(want - got)[:8], sorted(got - want)[:8])


def _vits2_inference_parity(hp, atol=2e-3):
    """Deterministic full-stack inference parity (noise scales 0): text
    encoder, duration predictor (SDP reverse or deterministic DP), flow
    reverse, waveform decoder (`vits2/generator.py:233-268`)."""
    import torch
    import jax.numpy as jnp

    tm, fm, variables = _vits2_pair(hp)
    rng = np.random.RandomState(4)
    text = rng.randint(1, 90, (1, 11))
    lens = np.asarray([11])
    sids = np.asarray([2])

    with torch.no_grad():
        t_wav, t_wl = tm.inference(
            torch.from_numpy(sids).long(),
            torch.from_numpy(text).long(),
            torch.from_numpy(lens).long(),
            d_control=1.0,
            noise_scale=0.0,
            noise_scale_w=0.0,
        )
    up = int(np.prod(hp["upsample_rates"]))
    frames = t_wav.shape[-1] // up

    j_wav, j_wl = fm.apply(
        variables,
        jnp.asarray(sids),
        jnp.asarray(text),
        jnp.asarray(lens),
        int(frames),
        noise_scale=0.0,
        noise_scale_w=0.0,
        method=fm.inference,
        rngs={"noise": __import__("jax").random.PRNGKey(0)},
    )
    assert int(j_wl[0]) == int(t_wl[0])
    np.testing.assert_allclose(
        np.asarray(j_wav)[0], t_wav.numpy()[0, 0], atol=atol
    )


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference not mounted")
def test_vits2_inference_parity_pre_conv_sdp():
    _vits2_inference_parity(VITS2_HP)


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference not mounted")
def test_vits2_inference_parity_fft_flow():
    """transformer_flow_type="fft" round-trips: causal-FFT coupling layers
    (`vits2/layers.py:626-684`) import and match at inference."""
    hp = dict(VITS2_HP)
    hp.update(transformer_flow_type="fft")
    _vits2_inference_parity(hp)


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference not mounted")
def test_vits2_inference_parity_mono_layer_deterministic_dp():
    hp = dict(VITS2_HP)
    hp.update(
        transformer_flow_type="mono_layer_post_residual",
        use_sdp=False,
        use_spk_conditioned_encoder=False,
    )
    _vits2_inference_parity(hp)


# ---------------------------------------------------------------------------
# Matcha-TTS import parity
# ---------------------------------------------------------------------------

MATCHA_HP = {
    "spk_dims": -1,
    "use_cvae": False,
    "spk_emb_dim": 16,
    "text_encoder": {
        "hidden_dim": 32,
        "use_prenet": True,
        "prenet": {"kernel_size": 5, "n_layers": 3, "p_dropout": 0.5},
        "encoder": {
            "filter_channels": 64,
            "n_heads": 2,
            "n_layers": 2,
            "kernel_size": 3,
            "p_dropout": 0.1,
        },
    },
    "duration_modelling": {
        "use_gaussian": True,
        "aligner_temperature": 0.0005,
        "binarization_start_steps": 6000,
    },
    "variance_predictor": {
        "filter_size": 16,
        "kernel_size": 3,
        "dropout": 0.5,
        "dur_predictor_layers": 2,
        "dur_predictor_kernel": 3,
        "pit_predictor_layers": 2,
        "pit_predictor_kernel": 5,
        "ener_predictor_layers": 2,
        "ener_predictor_kernel": 5,
        "ffn_padding": "SAME",
        "ffn_act": "gelu",
    },
    "flow_matching": {"solver": "euler", "sigma_min": 1.0e-4},
    "decoder": {
        "channels": [32, 32],
        "dropout": 0.05,
        "attention_head_dim": 16,
        "n_blocks": 1,
        "num_mid_blocks": 1,
        "num_heads": 2,
        "act_fn": "snakebeta",
    },
}
MATCHA_STATS = {"mel_mean": 0.0, "mel_std": 1.0}


def _load_reference_matcha():
    import importlib

    from tests import espnet_torch_equiv

    espnet_torch_equiv.install(str(REFERENCE))
    espnet_torch_equiv.install_diffusers()
    sys.path.insert(0, str(REFERENCE))
    try:
        mod = importlib.import_module("models.tts.matcha.model")
    finally:
        sys.path.remove(str(REFERENCE))
    return mod.MatchaTTS


def _matcha_pair(hp, seed=0, n_symbols=90, spks=3):
    import copy
    import torch

    from viet_tts_tpu.models.matcha import MatchaTTS as FlaxMatcha
    from viet_tts_tpu.train.torch_import import import_matcha

    TorchMatcha = _load_reference_matcha()
    torch.manual_seed(seed)
    tm = TorchMatcha(
        n_symbols=n_symbols, n_speakers=spks, n_channels=80,
        hparams=copy.deepcopy(hp), stats=dict(MATCHA_STATS), n_accents=2,
    ).eval()
    fm = FlaxMatcha(
        n_symbols=n_symbols, n_channels=80, hparams=copy.deepcopy(hp),
        stats=dict(MATCHA_STATS), n_speakers=spks, n_accents=2,
    )
    variables = import_matcha(tm.state_dict(), hp)
    return tm, fm, variables


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference not mounted")
def test_matcha_import_tree_matches_init():
    import jax
    import jax.numpy as jnp
    from flax import traverse_util

    tm, fm, variables = _matcha_pair(MATCHA_HP)
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    B, T_text, T_mel = 2, 9, 24
    init = fm.init(
        {"params": key, "dropout": key, "noise": key, "reparam": key},
        text=jnp.asarray(rng.randint(1, 90, (B, T_text))),
        text_lengths=jnp.asarray([T_text, 7]),
        feats=jnp.asarray(rng.randn(B, T_mel, 80), jnp.float32),
        feats_lengths=jnp.asarray([T_mel, 20]),
        sids=jnp.asarray([0, 1]),
        duration=jnp.asarray(rng.rand(B, T_mel, T_text), jnp.float32),
        train=True,
    )
    got = set(traverse_util.flatten_dict(variables["params"]))
    want = set(traverse_util.flatten_dict(init["params"]))
    assert got == want, (sorted(want - got)[:8], sorted(got - want)[:8])


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference not mounted")
def test_matcha_inference_parity():
    """Deterministic (temperature=0) full-stack Euler-ODE inference parity:
    RoPE text encoder + prenet, duration predictor, Gaussian upsampling,
    UNet estimator (snakebeta transformer blocks, diffusers additive-mask
    attention quirk) (`matcha/model.py:201-250`)."""
    import torch
    import jax
    import jax.numpy as jnp

    from viet_tts_tpu.train.torch_import import import_matcha

    tm, fm, variables = _matcha_pair(MATCHA_HP)
    # random-init duration predictors round everything to zero frames; bias
    # the log-duration head so predicted durations are ~2 frames/token
    tm.duration_predictor.linear.bias.data.fill_(1.2)
    variables = import_matcha(tm.state_dict(), MATCHA_HP)
    for seed in range(3, 13):
        rng = np.random.RandomState(seed)
        text = rng.randint(1, 90, (1, 9))
        lens = np.asarray([9])
        sids = np.asarray([1])
        with torch.no_grad():
            try:
                t_mel, t_lens = tm.inference(
                    torch.from_numpy(text).long(),
                    torch.from_numpy(lens).long(),
                    sids=torch.from_numpy(sids).long(),
                    n_timesteps=4,
                    temperature=0.0,
                )
            except RuntimeError:
                continue  # degenerate all-zero predicted durations
        if int(t_lens.max()) < 8:
            continue
        t_mel = t_mel.transpose(1, 2).numpy()  # (B, T, n_mels)

        from viet_tts_tpu.models.matcha.model import fix_len_compatibility

        budget = fix_len_compatibility(int(t_lens.max()))
        j_mel, j_lens, _ = fm.apply(
            variables,
            jnp.asarray(sids),
            jnp.asarray(text),
            jnp.asarray(lens),
            budget,
            n_timesteps=4,
            temperature=0.0,
            method=fm.inference,
            rngs={"noise": jax.random.PRNGKey(0)},
        )
        np.testing.assert_array_equal(np.asarray(j_lens), t_lens.numpy())
        L = int(t_lens[0])
        np.testing.assert_allclose(
            np.asarray(j_mel)[0, :L], t_mel[0, :L], atol=2e-3
        )
        return
    pytest.fail("no non-degenerate seed found")


# ---------------------------------------------------------------------------
# AdaSpeech import parity
# ---------------------------------------------------------------------------

ADA_HP = {
    "max_seq_len": 1000,
    "encoder_layers": 2,
    "encoder_hidden": 32,
    "decoder_layers": 2,
    "decoder_hidden": 32,
    "use_cvae": False,
    "use_postnet": True,
    "building_block": {
        "block_type": "transformer",
        "transformer": {
            "encoder_head": 2,
            "decoder_head": 2,
            "conv_filter_size": 64,
            "conv_kernel_size": [9, 1],
            "encoder_dropout": 0.2,
            "decoder_dropout": 0.2,
        },
    },
    "variance": {
        "learn_alignment": False,
        "duration_modelling": {
            "use_gaussian": True,
            "aligner_temperature": 0.0005,
            "binarization_start_steps": 6000,
        },
        "variance_predictor": {
            "filter_size": 16,
            "kernel_size": 3,
            "dropout": 0.5,
            "dur_predictor_layers": 2,
            "dur_predictor_kernel": 3,
            "pit_predictor_layers": 2,
            "pit_predictor_kernel": 5,
            "ener_predictor_layers": 2,
            "ener_predictor_kernel": 5,
            "ffn_padding": "SAME",
            "ffn_act": "gelu",
        },
        "variance_embedding": {
            "n_bins": 16,
            "pitch_feature": "phoneme_level",
            "pitch_quantization": "linear",
            "energy_feature": "phoneme_level",
            "energy_quantization": "linear",
        },
        "reference_encoder": {
            "phoneme_level_encoder_step": 60000,
            "phn_latent_dim": 4,
            "utterance_encoder": {
                "idim": 80, "n_layers": 2, "n_chans": 32, "kernel_size": 5,
                "pool_kernel": 3, "dropout_rate": 0.5, "stride": 3,
            },
            "phoneme_level_encoder": {
                "idim": 80, "n_layers": 2, "n_chans": 16, "kernel_size": 3,
                "dropout_rate": 0.5, "stride": 1,
            },
            "phoneme_level_predictor": {
                "idim": 32, "n_layers": 2, "n_chans": 16, "kernel_size": 3,
                "dropout_rate": 0.5, "stride": 1,
            },
        },
    },
    "postnet": {"embedding_dim": 16, "conv_layers": 5, "kernel_size": 5},
}


def _load_reference_adaspeech():
    _stub_fs2_deps()
    sys.path.insert(0, str(REFERENCE))
    try:
        from models.tts.adaspeech.model import AdaSpeech as TorchAda
    finally:
        sys.path.remove(str(REFERENCE))
    return TorchAda


def _ada_pair(hp, seed=0):
    import copy
    import torch

    from viet_tts_tpu.models.adaspeech import AdaSpeech
    from viet_tts_tpu.train.torch_import import import_adaspeech

    TorchAda = _load_reference_adaspeech()
    torch.manual_seed(seed)
    tm = TorchAda(
        n_symbols=130, n_channels=80, hparams=copy.deepcopy(hp),
        stats=copy.deepcopy(FS2_STATS), n_speakers=3, n_accents=2,
    ).eval()
    fm = AdaSpeech(
        n_symbols=130, n_channels=80, hparams=copy.deepcopy(hp),
        stats=copy.deepcopy(FS2_STATS), n_speakers=3, n_accents=2,
    )
    variables = import_adaspeech(tm.state_dict(), hp)
    return tm, fm, variables


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference not mounted")
def test_adaspeech_import_tree_matches_init():
    import jax
    import jax.numpy as jnp
    from flax import traverse_util

    tm, fm, variables = _ada_pair(ADA_HP)
    rng = np.random.RandomState(0)
    B, T_text, T_mel = 2, 11, 40
    key = jax.random.PRNGKey(0)
    init = fm.init(
        {"params": key, "dropout": key},
        text=jnp.asarray(rng.randint(1, 130, (B, T_text))),
        text_lengths=jnp.asarray([T_text, 8]),
        feats=jnp.asarray(rng.randn(B, T_mel, 80), jnp.float32),
        feats_lengths=jnp.asarray([T_mel, 30]),
        duration=jnp.asarray(rng.randint(1, 5, (B, T_text)), jnp.float32),
        pitch=jnp.asarray(rng.randn(B, T_mel), jnp.float32),
        energy=jnp.asarray(rng.randn(B, T_mel), jnp.float32),
        sids=jnp.asarray([0, 1]),
        train=False,
    )
    got = set(traverse_util.flatten_dict(variables["params"]))
    want = set(traverse_util.flatten_dict(init["params"]))
    assert got == want, (sorted(want - got)[:8], sorted(got - want)[:8])
    got_bs = set(traverse_util.flatten_dict(variables.get("batch_stats", {})))
    want_bs = set(traverse_util.flatten_dict(init.get("batch_stats", {})))
    assert got_bs == want_bs


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference not mounted")
def test_adaspeech_teacher_forced_parity():
    import torch
    import jax.numpy as jnp

    tm, fm, variables = _ada_pair(ADA_HP)
    rng = np.random.RandomState(1)
    B, T_text = 2, 11
    text = rng.randint(1, 130, (B, T_text))
    text[1, 8:] = 0
    text_lens = np.asarray([T_text, 8])
    dur = rng.randint(1, 5, (B, T_text))
    dur[1, 8:] = 0
    feats_lens = dur.sum(1)
    T_mel = int(feats_lens.max())
    feats = rng.randn(B, T_mel, 80).astype(np.float32)
    pitch = rng.randn(B, T_mel).astype(np.float32)
    energy = rng.randn(B, T_mel).astype(np.float32)
    sids = np.asarray([0, 2])

    with torch.no_grad():
        # .copy(): the reference's frame2phoneme averages in place.
        (t_outs, t_post, t_logd, t_p, t_e, *_), (_, _, _, t_phn) = tm(
            torch.from_numpy(text).long(),
            torch.from_numpy(text_lens).long(),
            torch.from_numpy(feats.copy()),
            torch.from_numpy(feats_lens).long(),
            torch.from_numpy(dur).long(),
            torch.from_numpy(pitch.copy()),
            torch.from_numpy(energy.copy()),
            torch.from_numpy(sids).long(),
            None,
            0,
        )

    (j_outs, j_post, j_logd, j_p, j_e, *_), (_, _, _, j_phn) = fm.apply(
        variables,
        text=jnp.asarray(text),
        text_lengths=jnp.asarray(text_lens),
        feats=jnp.asarray(feats),
        feats_lengths=jnp.asarray(feats_lens),
        duration=jnp.asarray(dur, jnp.float32),
        pitch=jnp.asarray(pitch),
        energy=jnp.asarray(energy),
        sids=jnp.asarray(sids),
        train=False,
    )
    atol = 2e-4
    for b in range(B):
        lt, lm = int(text_lens[b]), int(feats_lens[b])
        np.testing.assert_allclose(
            np.asarray(j_phn)[b, :lt], t_phn.numpy()[b, :lt], atol=atol
        )
        np.testing.assert_allclose(
            np.asarray(j_logd)[b, :lt], t_logd.numpy()[b, :lt], atol=atol
        )
        np.testing.assert_allclose(
            np.asarray(j_p)[b, :lt], t_p.numpy()[b, :lt], atol=atol
        )
        np.testing.assert_allclose(
            np.asarray(j_e)[b, :lt], t_e.numpy()[b, :lt], atol=atol
        )
        np.testing.assert_allclose(
            np.asarray(j_outs)[b, :lm], t_outs.numpy()[b, :lm], atol=atol
        )
        np.testing.assert_allclose(
            np.asarray(j_post)[b, :lm], t_post.numpy()[b, :lm], atol=atol
        )


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference not mounted")
def test_adaspeech_inference_parity():
    import torch
    import jax.numpy as jnp

    tm, fm, variables = _ada_pair(ADA_HP)
    for seed in range(2, 12):
        rng = np.random.RandomState(seed)
        B, T_text, T_ref = 2, 9, 48
        text = rng.randint(1, 130, (B, T_text))
        text[1, 6:] = 0
        text_lens = np.asarray([T_text, 6])
        sids = np.asarray([1, 2])
        ref_mel = rng.randn(B, T_ref, 80).astype(np.float32)

        with torch.no_grad():
            try:
                t_mel, t_lens, t_emb = tm.inference(
                    torch.from_numpy(sids).long(),
                    torch.from_numpy(text).long(),
                    torch.from_numpy(text_lens).long(),
                    torch.from_numpy(ref_mel.copy()),
                )
            except RuntimeError:
                continue  # all-zero predicted durations
        if int(t_lens.min()) < 2:
            continue
        t_mel = t_mel.transpose(1, 2).numpy()

        j_mel, j_lens, j_emb = fm.apply(
            variables,
            sids=jnp.asarray(sids),
            text=jnp.asarray(text),
            text_lengths=jnp.asarray(text_lens),
            max_mel_frames=int(t_lens.max()),
            feats=jnp.asarray(ref_mel),
            method=fm.inference,
        )
        np.testing.assert_array_equal(np.asarray(j_lens), t_lens.numpy())
        np.testing.assert_allclose(np.asarray(j_emb), t_emb.numpy(), atol=1e-5)
        for b in range(B):
            L = int(t_lens[b])
            np.testing.assert_allclose(
                np.asarray(j_mel)[b, :L], t_mel[b, :L], atol=3e-4
            )
        return
    pytest.fail("no non-degenerate seed found")


# ---------------------------------------------------------------------------
# CVAE (AccentEncoderNetwork) import parity, via FastSpeech2
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference not mounted")
def test_fastspeech2_cvae_inference_parity():
    import copy
    import torch
    import jax.numpy as jnp

    from tests import espnet_torch_equiv

    from viet_tts_tpu.models.fastspeech2 import FastSpeech2
    from viet_tts_tpu.train.torch_import import import_fastspeech2

    # real (functional) espnet equivalents must win over _stub_fs2_deps'
    # bare-Module placeholders for the ReferenceEncoder to actually run
    espnet_torch_equiv.install(str(REFERENCE))
    TorchFS2 = _load_reference_fs2()

    hp = copy.deepcopy(FS2_HP)
    hp["use_cvae"] = True
    hp["vcae"] = {
        "conv_layers": 2,
        "conv_chans_list": [4, 4],
        "conv_kernel_size": 3,
        "conv_stride": 2,
        "gru_layers": 1,
        "gru_units": 16,
    }
    torch.manual_seed(0)
    tm = TorchFS2(
        n_symbols=130, n_channels=80, hparams=copy.deepcopy(hp),
        stats=copy.deepcopy(FS2_STATS), n_speakers=3, n_accents=2,
    ).eval()
    fm = FastSpeech2(
        n_symbols=130, n_channels=80, hparams=copy.deepcopy(hp),
        stats=copy.deepcopy(FS2_STATS), n_speakers=3, n_accents=2,
    )
    variables = import_fastspeech2(tm.state_dict(), hp)

    for seed in range(2, 12):
        rng = np.random.RandomState(seed)
        B, T_text, T_ref = 2, 9, 40
        text = rng.randint(1, 130, (B, T_text))
        text[1, 6:] = 0
        text_lens = np.asarray([T_text, 6])
        sids = np.asarray([1, 2])
        aids = np.asarray([0, 1])
        ref_mel = rng.randn(B, T_ref, 80).astype(np.float32)

        with torch.no_grad():
            try:
                t_mel, t_lens, t_emb = tm.inference(
                    torch.from_numpy(sids).long(),
                    torch.from_numpy(text).long(),
                    torch.from_numpy(text_lens).long(),
                    feats=torch.from_numpy(ref_mel.copy()),
                    aids=torch.from_numpy(aids).long(),
                )
            except RuntimeError:
                continue  # all-zero predicted durations
        if int(t_lens.min()) < 2:
            continue
        t_mel = t_mel.transpose(1, 2).numpy()

        j_mel, j_lens, j_emb = fm.apply(
            variables,
            sids=jnp.asarray(sids),
            text=jnp.asarray(text),
            text_lengths=jnp.asarray(text_lens),
            max_mel_frames=int(t_lens.max()),
            feats=jnp.asarray(ref_mel),
            aids=jnp.asarray(aids),
            method=fm.inference,
        )
        np.testing.assert_array_equal(np.asarray(j_lens), t_lens.numpy())
        np.testing.assert_allclose(
            np.asarray(j_emb), t_emb.numpy(), atol=1e-5
        )
        for b in range(B):
            L = int(t_lens[b])
            np.testing.assert_allclose(
                np.asarray(j_mel)[b, :L], t_mel[b, :L], atol=3e-4
            )
        return
    pytest.fail("no non-degenerate seed found")


# ---------------------------------------------------------------------------
# Conversion CLI round-trip
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference not mounted")
def test_convert_checkpoint_cli_roundtrip(tmp_path):
    import torch
    import jax
    import jax.numpy as jnp

    from viet_tts_tpu.models.hifigan import HiFiGANGenerator
    from viet_tts_tpu.train import torch_import
    from viet_tts_tpu.train.checkpoint import load_checkpoint, scan_checkpoint

    _stub_reference_deps()
    sys.path.insert(0, str(REFERENCE))
    try:
        from models.gan_tts.hifigan.generator import HiFiGAN as TorchHiFiGAN
    finally:
        sys.path.remove(str(REFERENCE))

    torch.manual_seed(0)
    tg = TorchHiFiGAN(channels=64).eval()
    src = tmp_path / "generator_epoch7_iteration123_statedict.pt"
    torch.save({"state_dict": tg.state_dict(), "optimizer": {}}, src)

    out_dir = tmp_path / "converted"
    torch_import.main([
        str(src), "--task", "hifigan", "--config", "config",
        "--out", str(out_dir),
    ])
    found = scan_checkpoint(str(out_dir), "generator")
    assert found is not None and "epoch7_iteration123" in found

    fg = HiFiGANGenerator(channels=64)
    mel = np.random.RandomState(0).randn(2, 37, 80).astype(np.float32)
    target = fg.init(jax.random.PRNGKey(0), jnp.zeros((2, 37, 80)))
    restored = load_checkpoint(found, dict(target))
    with torch.no_grad():
        ref = tg(torch.from_numpy(mel.transpose(0, 2, 1))).numpy()
    out = np.asarray(fg.apply(restored, jnp.asarray(mel)))[..., 0][:, None]
    np.testing.assert_allclose(out, ref, atol=2e-6)


# ---------------------------------------------------------------------------
# Shipped-config import coverage: the importers must produce trees matching
# our models when both sides are built from config/ (full-size hparams),
# not only the tiny test configs above. eval_shape keeps this cheap.
# ---------------------------------------------------------------------------


def _shipped_conf(task):
    from viet_tts_tpu.config import build_config, derive_task_config

    return derive_task_config(build_config("config"), task)


def _tree_matches(variables, model, rngs, /, **shaped_kwargs):
    """Importer output vs jax.eval_shape(model.init): same keys AND shapes."""
    import jax
    from flax import traverse_util

    static = {
        k: v for k, v in shaped_kwargs.items()
        if not isinstance(v, jax.ShapeDtypeStruct)
    }
    shaped = {
        k: v for k, v in shaped_kwargs.items()
        if isinstance(v, jax.ShapeDtypeStruct)
    }
    init_shapes = jax.eval_shape(
        lambda **kw: model.init(rngs, **kw, **static), **shaped
    )
    for col in set(variables) | set(
        c for c in ("params", "batch_stats") if c in init_shapes
    ):
        got = traverse_util.flatten_dict(variables.get(col, {}))
        want = traverse_util.flatten_dict(init_shapes.get(col, {}))
        assert set(got) == set(want), (
            col, sorted(set(want) - set(got))[:8],
            sorted(set(got) - set(want))[:8],
        )
        for k, leaf in got.items():
            assert tuple(np.shape(leaf)) == tuple(want[k].shape), (
                col, "/".join(k), np.shape(leaf), want[k].shape,
            )


def _sds(shape, dtype=np.float32):
    import jax

    return jax.ShapeDtypeStruct(shape, dtype)


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference not mounted")
@pytest.mark.parametrize("task", ["fastspeech2", "adaspeech"])
def test_shipped_config_import_acoustic(task):
    import copy
    import jax
    import torch

    conf = _shipped_conf(task)
    hp = copy.deepcopy(conf["models"][task])
    if task == "fastspeech2":
        assert "vcae" in hp  # shipped config carries the CVAE block
        TorchModel = _load_reference_fs2()
        from viet_tts_tpu.models.fastspeech2 import FastSpeech2 as FlaxModel
        from viet_tts_tpu.train.torch_import import import_fastspeech2 as imp
    else:
        TorchModel = _load_reference_adaspeech()
        from viet_tts_tpu.models.adaspeech import AdaSpeech as FlaxModel
        from viet_tts_tpu.train.torch_import import import_adaspeech as imp

    torch.manual_seed(0)
    tm = TorchModel(
        n_symbols=131, n_channels=80, hparams=copy.deepcopy(hp),
        stats=copy.deepcopy(FS2_STATS), n_speakers=3, n_accents=2,
    ).eval()
    fm = FlaxModel(
        n_symbols=131, n_channels=80, hparams=copy.deepcopy(hp),
        stats=copy.deepcopy(FS2_STATS), n_speakers=3, n_accents=2,
    )
    variables = imp(tm.state_dict(), hp)
    key = jax.random.PRNGKey(0)
    B, T_text, T_mel = 2, 16, 64
    _tree_matches(
        variables, fm,
        {"params": key, "dropout": key, "reparam": key},
        text=_sds((B, T_text), np.int32),
        text_lengths=_sds((B,), np.int32),
        feats=_sds((B, T_mel, 80)),
        feats_lengths=_sds((B,), np.int32),
        # shipped configs use learn_alignment=True: duration is the prior
        duration=_sds((B, T_mel, T_text)),
        pitch=_sds((B, T_mel)),
        energy=_sds((B, T_mel)),
        sids=_sds((B,), np.int32),
        aids=_sds((B,), np.int32),
        train=True,
    )


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference not mounted")
def test_shipped_config_import_jets():
    import copy
    import jax
    import torch

    conf = _shipped_conf("jets")
    hp = copy.deepcopy(conf["models"]["jets"]["generator_params"])
    from viet_tts_tpu.models.jets import JETS as FlaxJETS
    from viet_tts_tpu.train.torch_import import import_jets

    TorchJETS = _load_reference_jets()
    torch.manual_seed(0)
    tm = TorchJETS(
        idim=132, odim=80, spks=3, **hp
    ).eval()
    fm = FlaxJETS(n_symbols=131, n_channels=80, hparams=dict(hp), n_speakers=3)
    variables = import_jets(tm.state_dict(), hp)
    key = jax.random.PRNGKey(0)
    B, T_text, T_mel = 2, 16, 64
    _tree_matches(
        variables, fm,
        {"params": key, "dropout": key, "noise": key},
        text=_sds((B, T_text), np.int32),
        text_lengths=_sds((B,), np.int32),
        feats=_sds((B, T_mel, 80)),
        feats_lengths=_sds((B,), np.int32),
        pitch=_sds((B, T_mel, 1)),
        energy=_sds((B, T_mel, 1)),
        sids=_sds((B,), np.int32),
        train=True,
    )


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference not mounted")
def test_shipped_config_import_vits2():
    import copy
    import jax
    import torch

    conf = _shipped_conf("vits2")
    hp = copy.deepcopy(conf["models"]["vits2"])
    from viet_tts_tpu.models.vits2 import VITS2 as FlaxVITS2
    from viet_tts_tpu.train.torch_import import import_vits2

    TorchVITS2 = _load_reference_vits2()
    torch.manual_seed(0)
    tm = TorchVITS2(n_vocab=131, spec_channels=80, n_speakers=3, **hp).eval()
    fm = FlaxVITS2(n_symbols=131, hparams=dict(hp), n_speakers=3)
    variables = import_vits2(tm.state_dict(), hp)
    key = jax.random.PRNGKey(0)
    B, T_text, T_spec = 2, 16, 64
    _tree_matches(
        variables, fm,
        {"params": key, "dropout": key, "noise": key, "segment": key},
        text=_sds((B, T_text), np.int32),
        text_lengths=_sds((B,), np.int32),
        feats=_sds((B, T_spec, 80)),
        feats_lengths=_sds((B,), np.int32),
        sids=_sds((B,), np.int32),
        train=True,
    )


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference not mounted")
def test_shipped_config_import_matcha():
    import copy
    import jax
    import torch

    conf = _shipped_conf("matcha")
    hp = copy.deepcopy(conf["models"]["matcha"])
    from viet_tts_tpu.models.matcha import MatchaTTS as FlaxMatcha
    from viet_tts_tpu.train.torch_import import import_matcha

    TorchMatcha = _load_reference_matcha()
    torch.manual_seed(0)
    tm = TorchMatcha(
        n_symbols=131, n_speakers=3, n_channels=80,
        hparams=copy.deepcopy(hp), stats=dict(MATCHA_STATS), n_accents=2,
    ).eval()
    fm = FlaxMatcha(
        n_symbols=131, n_channels=80, hparams=copy.deepcopy(hp),
        stats=dict(MATCHA_STATS), n_speakers=3, n_accents=2,
    )
    variables = import_matcha(tm.state_dict(), hp)
    key = jax.random.PRNGKey(0)
    B, T_text, T_mel = 2, 16, 64
    _tree_matches(
        variables, fm,
        {"params": key, "dropout": key, "noise": key, "reparam": key},
        text=_sds((B, T_text), np.int32),
        text_lengths=_sds((B,), np.int32),
        feats=_sds((B, T_mel, 80)),
        feats_lengths=_sds((B,), np.int32),
        sids=_sds((B,), np.int32),
        aids=_sds((B,), np.int32),
        duration=_sds((B, T_mel, T_text)),
        train=True,
    )


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference not mounted")
def test_shipped_config_import_text2wav():
    import copy
    import importlib
    import jax
    import torch

    conf = _shipped_conf("text2wav")
    from tests import espnet_torch_equiv

    espnet_torch_equiv.install(str(REFERENCE))  # espnet2.gan_tts.utils etc.
    _load_reference_fs2()  # numba/GST stubs + cache reference tts modules
    sys.path.insert(0, str(REFERENCE))
    try:
        mod = importlib.import_module("models.gan_tts.text2wav.model")
    finally:
        sys.path.remove(str(REFERENCE))

    from viet_tts_tpu.models.text2wav import Text2Wav as FlaxText2Wav
    from viet_tts_tpu.train.torch_import import import_text2wav

    hp = copy.deepcopy(conf["models"]["fastspeech2"])
    torch.manual_seed(0)
    tm = mod.Text2Wav(
        vocabs=131,
        aux_channels=80,
        text2mel_params=dict(
            hparams=hp, stats=copy.deepcopy(FS2_STATS),
            n_speakers=3, n_accents=2,
        ),
        mel2wav_params={"segment_size": conf["models"]["hifigan"]["segment_size"]},
        version="fastspeech2",
    ).eval()
    fm = FlaxText2Wav(
        n_symbols=131, n_channels=80, conf=conf,
        stats=copy.deepcopy(FS2_STATS), n_speakers=3, n_accents=2,
        version="fastspeech2",
    )
    variables = import_text2wav(tm.state_dict(), conf)
    key = jax.random.PRNGKey(0)
    B, T_text, T_mel = 2, 16, 64
    _tree_matches(
        variables, fm,
        {"params": key, "dropout": key, "reparam": key, "noise": key},
        text=_sds((B, T_text), np.int32),
        text_lengths=_sds((B,), np.int32),
        feats=_sds((B, T_mel, 80)),
        feats_lengths=_sds((B,), np.int32),
        duration=_sds((B, T_mel, T_text)),
        pitch=_sds((B, T_mel)),
        energy=_sds((B, T_mel)),
        sids=_sds((B,), np.int32),
        aids=_sds((B,), np.int32),
        train=True,
    )
