"""JETS tests: training forward, adversarial step, fused inference, trainer."""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viet_tts_tpu.models.hifigan import MelSpectrogramLoss, MultiScaleMultiPeriodDiscriminator
from viet_tts_tpu.models.jets import JETS

from tests.synth_data import build_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_HP = {
    "adim": 32,
    "aheads": 2,
    "elayers": 1,
    "eunits": 64,
    "dlayers": 1,
    "dunits": 64,
    "positionwise_conv_kernel_size": 3,
    "duration_predictor_layers": 2,
    "duration_predictor_chans": 16,
    "duration_predictor_kernel_size": 3,
    "pitch_predictor_layers": 2,
    "pitch_predictor_chans": 16,
    "pitch_predictor_kernel_size": 5,
    "energy_predictor_layers": 2,
    "energy_predictor_chans": 16,
    "energy_predictor_kernel_size": 3,
    "use_gst": True,
    "gst_tokens": 4,
    "gst_heads": 2,
    "generator_channels": 16,
    "generator_upsample_scales": [8, 8, 2, 2],
    "generator_upsample_kernel_sizes": [16, 16, 4, 4],
    "generator_resblock_kernel_sizes": [3],
    "generator_resblock_dilations": [[1, 3]],
    "segment_size": 8,
}


def make_batch(B=2, T_text=9, T_mel=48, n_mels=80, seed=0):
    rng = np.random.RandomState(seed)
    return dict(
        text=jnp.asarray(rng.randint(1, 131, (B, T_text))),
        text_lengths=jnp.asarray([T_text, T_text - 3]),
        feats=jnp.asarray(rng.randn(B, T_mel, n_mels).astype(np.float32)),
        feats_lengths=jnp.asarray([T_mel, T_mel - 10]),
        pitch=jnp.asarray(rng.randn(B, T_mel, 1).astype(np.float32)),
        energy=jnp.asarray(rng.randn(B, T_mel, 1).astype(np.float32)),
        sids=jnp.asarray([0, 1]),
    )


@pytest.fixture(scope="module")
def jets_model():
    model = JETS(n_symbols=131, n_channels=80, hparams=TINY_HP, n_speakers=2)
    batch = make_batch()
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": key, "noise": key}, **batch, train=True
    )
    return model, variables, batch


def test_training_forward_tuple(jets_model):
    model, variables, batch = jets_model
    key = jax.random.PRNGKey(1)
    outs, _ = model.apply(
        variables,
        **batch,
        train=True,
        rngs={"dropout": key, "noise": key},
        mutable=["batch_stats"],
    )
    wav, bin_loss, log_p_attn, starts, d_outs, ds, p_outs, ps, e_outs, es = outs
    assert wav.shape == (2, 1, 8 * 256)
    assert log_p_attn.shape == (2, 48, 9)
    assert d_outs.shape == ds.shape == (2, 9)
    assert p_outs.shape == ps.shape == (2, 9, 1)
    # MAS durations cover the mel lengths
    ds = np.asarray(ds)
    assert ds[0].sum() == 48 and ds[1].sum() == 38
    assert np.isfinite(float(bin_loss))


def test_fused_inference(jets_model):
    model, variables, batch = jets_model

    @jax.jit
    def synth(variables, sids, text, lens):
        return model.apply(
            variables, sids, text, lens, 64, method=model.inference
        )

    wav, wav_lens = synth(
        variables, batch["sids"], batch["text"], batch["text_lengths"]
    )
    assert wav.shape == (2, 64 * 256)
    assert np.isfinite(np.asarray(wav)).all()
    assert (np.asarray(wav_lens) % 256 == 0).all()


@pytest.mark.parametrize("encoder_type", ["transformer", "conformer"])
def test_jets_remat_grads_match(encoder_type):
    """hparams["remat"]=True on the espnet stacks must leave the param tree
    and gradients unchanged up to float32 rounding (nn/espnet_transformer.py
    and nn/espnet_conformer.py `_layer_cls`)."""
    batch = make_batch()
    key = jax.random.PRNGKey(0)

    def grads_for(remat):
        hp = dict(TINY_HP)
        if encoder_type == "conformer":
            hp["encoder_type"] = hp["decoder_type"] = "conformer"
        if remat:
            hp["remat"] = True
        model = JETS(n_symbols=131, n_channels=80, hparams=hp, n_speakers=2)
        variables = model.init(
            {"params": key, "dropout": key, "noise": key}, **batch, train=True
        )

        def loss_fn(params):
            outs, _ = model.apply(
                {"params": params, **{k: v for k, v in variables.items() if k != "params"}},
                **batch, train=True,
                rngs={"dropout": key, "noise": key},
                mutable=["batch_stats"],
            )
            wav, bin_loss = outs[0], outs[1]
            return jnp.mean(wav**2) + bin_loss

        return jax.value_and_grad(loss_fn)(variables["params"])

    loss0, g0 = grads_for(False)
    loss1, g1 = grads_for(True)
    assert float(loss0) == pytest.approx(float(loss1), rel=1e-6)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = {tuple(p): g for p, g in jax.tree_util.tree_leaves_with_path(g1)}
    assert len(flat0) == len(flat1)
    for path, g in flat0:
        a, b = np.asarray(g), np.asarray(flat1[tuple(path)])
        scale = max(np.abs(a).max(), 1e-8)
        assert np.abs(a - b).max() <= 1e-4 * scale + 1e-7, jax.tree_util.keystr(path)


def test_jets_adversarial_step(jets_model):
    from viet_tts_tpu.train.gan import make_jets_train_step
    from viet_tts_tpu.train.state import TrainState, adamw_with_clip

    model, variables, batch = jets_model
    disc = MultiScaleMultiPeriodDiscriminator(
        scales=1,
        periods=(2,),
        scale_params={"channels": 8, "max_downsample_channels": 16},
        period_params={"channels": 4, "max_downsample_channels": 8},
    )
    key = jax.random.PRNGKey(0)
    speech = jnp.asarray(
        np.random.RandomState(0).randn(2, 48 * 256).astype(np.float32) * 0.1
    )
    dv = disc.init(key, jnp.zeros((2, 8 * 256, 1)))
    gen_state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=adamw_with_clip(2e-4)
    )
    disc_state = TrainState.create(
        apply_fn=disc.apply, params=dv["params"], tx=adamw_with_clip(2e-4)
    )
    step = jax.jit(
        make_jets_train_step(
            model,
            disc,
            MelSpectrogramLoss(log_base=None),
            {"adv": 1.0, "mel": 45.0, "fm": 2.0, "var": 1.0, "align": 2.0},
            hop=256,
        )
    )
    b = dict(batch)
    b["pitch"] = batch["pitch"][..., 0]
    b["energy"] = batch["energy"][..., 0]
    b["speech"] = speech
    first = None
    for _ in range(3):
        gen_state, disc_state, metrics = step(gen_state, disc_state, b, key)
        if first is None:
            first = {k: float(v) for k, v in metrics.items()}
    assert all(np.isfinite(float(v)) for v in metrics.values())
    assert float(metrics["disc"]) < first["disc"]


def test_jets_trainer_smoke(tmp_path):
    from viet_tts_tpu.config import build_config
    from viet_tts_tpu.train.gan import JETSTrainer

    data_dir, egs_dir = build_dataset(str(tmp_path), n_utts=4)
    conf = build_config(os.path.join(REPO, "config"))
    conf["train"]["batch_size"] = 2
    conf["models"]["jets"]["generator_params"] = dict(TINY_HP)
    conf["models"]["jets"]["discriminator_params"] = {
        "scales": 1,
        "periods": [2],
        "scale_discriminator_params": {"channels": 8, "max_downsample_channels": 16},
        "period_discriminator_params": {"channels": 4, "max_downsample_channels": 8},
    }
    args = argparse.Namespace(
        task="jets",
        input_folder=egs_dir,
        data_folder=data_dir,
        output_folder=os.path.join(str(tmp_path), "out"),
        checkpoint=None,
        acoustic_checkpoint=None,
        vocoder_checkpoint=None,
        version="fastspeech2",
        max_iter=2,
        is_finetune=False,
    )
    trainer = JETSTrainer(args, conf)
    trainer.run()
    out = args.output_folder
    assert any(f.startswith("generator") for f in os.listdir(out))


def test_jets_conformer_variant():
    """encoder/decoder_type=conformer builds and runs (espnet-style rel-pos
    conformer with macaron FF + CNN module)."""
    hp = dict(TINY_HP)
    hp.update(
        encoder_type="conformer",
        decoder_type="conformer",
        conformer_enc_kernel_size=7,
        conformer_dec_kernel_size=7,
    )
    model = JETS(n_symbols=131, n_channels=80, hparams=hp, n_speakers=2)
    batch = make_batch()
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": key, "noise": key}, **batch, train=True
    )
    outs, _ = model.apply(
        variables,
        **batch,
        train=True,
        rngs={"dropout": key, "noise": key},
        mutable=["batch_stats"],
    )
    assert np.isfinite(np.asarray(outs[0])).all()
    wav, _ = model.apply(
        variables,
        batch["sids"],
        batch["text"],
        batch["text_lengths"],
        64,
        method=model.inference,
    )
    assert wav.shape == (2, 64 * 256)


def test_shipped_config_discriminator_params():
    """The shipped espnet-style `discriminator_params` block (in_channels,
    nonlinear_activation, use_spectral_norm, ...) must construct and run the
    MSMPD exactly as JETSTrainer wires it (`train/gan.py:__init_model__`)."""
    from viet_tts_tpu.config import build_config, derive_task_config

    conf = derive_task_config(build_config(os.path.join(REPO, "config")), "jets")
    dp = conf["models"]["jets"]["discriminator_params"]
    disc = MultiScaleMultiPeriodDiscriminator(
        scales=dp.get("scales", 1),
        scale_params=dp.get("scale_discriminator_params"),
        periods=tuple(dp.get("periods", (2, 3, 5, 7, 11))),
        period_params=dp.get("period_discriminator_params"),
    )
    x = np.zeros((2, 1024, 1), np.float32)
    v = disc.init(jax.random.PRNGKey(0), x)
    outs = disc.apply(v, x)
    # 1 scale + 5 periods, each a list of per-layer feature maps
    assert len(outs) == 1 + 5
    assert all(np.isfinite(np.asarray(o[-1])).all() for o in outs)
    # the espnet negative_slope rides into our lrelu_slope field
    import pytest as _pytest

    with _pytest.raises(ValueError, match="spectral"):
        MultiScaleMultiPeriodDiscriminator(
            scale_params={"use_spectral_norm": True},
        ).init(jax.random.PRNGKey(0), x)
