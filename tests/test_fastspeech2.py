"""FastSpeech2 model tests: shapes, losses, grads, inference, jit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viet_tts_tpu.models.fastspeech2 import FastSpeech2, FastSpeech2Loss, total_loss


def tiny_hparams(block_type="transformer", learn_alignment=True, use_cvae=True):
    return {
        "max_seq_len": 100,
        "encoder_layers": 1,
        "encoder_hidden": 32,
        "decoder_layers": 1,
        "decoder_hidden": 32,
        "use_cvae": use_cvae,
        "vcae": {
            "conv_layers": 3,
            "conv_chans_list": [8, 8, 16],
            "conv_kernel_size": 3,
            "conv_stride": 2,
            "gru_layers": 1,
            "gru_units": 16,
        },
        "use_postnet": True,
        "building_block": {
            "block_type": block_type,
            "transformer": {
                "encoder_head": 2,
                "decoder_head": 2,
                "conv_filter_size": 64,
                "conv_kernel_size": [9, 1],
                "encoder_dropout": 0.2,
                "decoder_dropout": 0.2,
            },
            "conformer": {
                "encoder_head": 2,
                "decoder_head": 2,
                "ffn_expansion_factor": 2,
                "conv_kernel_size": 7,
                "conv_expansion_factor": 2,
                "half_step_residual": True,
                "encoder_dropout": 0.1,
                "decoder_dropout": 0.1,
            },
        },
        "variance": {
            "learn_alignment": learn_alignment,
            "duration_modelling": {
                "use_gaussian": True,
                "aligner_temperature": 0.0005,
                "binarization_start_steps": 10,
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
        "postnet": {"embedding_dim": 32, "conv_layers": 3, "kernel_size": 5},
    }


STATS = {"pitch": {"min": -2.0, "max": 8.0}, "energy": {"min": -2.0, "max": 8.0}}
LOSS_CONF = {
    "linbuild": {"start": 1e-4, "stop": 5e-4, "n_up": 10, "n_stop": 35},
    "dur_loss_lambda": {"pdur": 1.0, "wdur": 0.0, "sdur": 0.0},
    "binarization_loss_warmup_steps": 10,
    "binarization_loss_enable_steps": 18,
    "pitch_feature_level": "phoneme_level",
    "energy_feature_level": "phoneme_level",
}


def make_batch(n_mels=10, B=2, T_text=9, T_mel=24, seed=0, supervised=False):
    rng = np.random.RandomState(seed)
    text_lens = np.array([T_text, T_text - 3])
    feat_lens = np.array([T_mel, T_mel - 6])
    if supervised:
        # durations summing exactly to feat_lens
        dur = np.zeros((B, T_text), np.int32)
        for b in range(B):
            n, total = text_lens[b], feat_lens[b]
            d = np.ones(n, np.int32)
            for _ in range(total - n):
                d[rng.randint(n)] += 1
            dur[b, :n] = d
        dur_or_prior = dur
    else:
        dur_or_prior = rng.rand(B, T_mel, T_text).astype(np.float32)
    return dict(
        text=jnp.asarray(rng.randint(1, 131, (B, T_text))),
        text_lengths=jnp.asarray(text_lens),
        feats=jnp.asarray(rng.randn(B, T_mel, n_mels).astype(np.float32)),
        feats_lengths=jnp.asarray(feat_lens),
        duration=jnp.asarray(dur_or_prior),
        pitch=jnp.asarray(rng.randn(B, T_mel).astype(np.float32)),
        energy=jnp.asarray(rng.randn(B, T_mel).astype(np.float32)),
        sids=jnp.asarray([0, 1]),
        aids=jnp.asarray([0, 1]),
    )


def init_and_run(hp, batch, step=100):
    model = FastSpeech2(
        n_symbols=131, n_channels=10, hparams=hp, stats=STATS, n_speakers=4
    )
    key = jax.random.PRNGKey(0)
    rngs = {"params": key, "dropout": key, "reparam": key}
    variables = model.init(rngs, **batch, step=jnp.asarray(0), train=True)
    out, _ = model.apply(
        variables,
        **batch,
        step=jnp.asarray(step),
        train=True,
        rngs={"dropout": key, "reparam": key},
        mutable=["batch_stats"],
    )
    return model, variables, out


@pytest.mark.parametrize("block", ["transformer", "conformer"])
def test_forward_shapes(block):
    batch = make_batch()
    _, _, (y_pred, y_extra) = init_and_run(tiny_hparams(block), batch)
    assert y_pred[0].shape == (2, 24, 10)
    assert y_pred[1].shape == (2, 24, 10)
    assert y_pred[2].shape == (2, 9)
    assert all(np.isfinite(np.asarray(y_pred[0])).all() for _ in [0])
    # MAS durations sum to mel lengths
    ds = np.asarray(y_extra[0])
    assert ds[0].sum() == 24 and ds[1].sum() == 18


def test_loss_and_grads_unsupervised():
    hp = tiny_hparams("transformer", learn_alignment=True)
    batch = make_batch()
    model = FastSpeech2(
        n_symbols=131, n_channels=10, hparams=hp, stats=STATS, n_speakers=4
    )
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": key, "reparam": key},
        **batch,
        step=jnp.asarray(0),
        train=True,
    )
    crit = FastSpeech2Loss(LOSS_CONF)

    def loss_fn(params):
        (y_pred, y_extra), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            **batch,
            step=jnp.asarray(100),
            train=True,
            rngs={"dropout": key, "reparam": key},
            mutable=["batch_stats"],
        )
        targets = (batch["feats"], None, None, *y_extra)
        return total_loss(crit(y_pred, targets, step=jnp.asarray(100)))

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    gnorm = sum(
        float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads)
    )
    assert np.isfinite(gnorm) and gnorm > 0


@pytest.mark.parametrize("block", ["transformer", "conformer"])
def test_remat_grads_match(block):
    """hparams["remat"]=True must change neither the param tree nor the
    gradients — it only trades backward-pass memory for recompute
    (nn/conformer.py:_block_cls, nn/transformer.py:_block_cls)."""
    batch = make_batch()
    key = jax.random.PRNGKey(0)

    def grads_for(remat):
        hp = tiny_hparams(block, learn_alignment=True)
        if remat:
            hp["remat"] = True
        model = FastSpeech2(
            n_symbols=131, n_channels=10, hparams=hp, stats=STATS, n_speakers=4
        )
        variables = model.init(
            {"params": key, "dropout": key, "reparam": key},
            **batch, step=jnp.asarray(0), train=True,
        )
        crit = FastSpeech2Loss(LOSS_CONF)

        def loss_fn(params):
            (y_pred, y_extra), _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                **batch, step=jnp.asarray(100), train=True,
                rngs={"dropout": key, "reparam": key},
                mutable=["batch_stats"],
            )
            targets = (batch["feats"], None, None, *y_extra)
            return total_loss(crit(y_pred, targets, step=jnp.asarray(100)))

        return jax.value_and_grad(loss_fn)(variables["params"])

    loss0, g0 = grads_for(False)
    loss1, g1 = grads_for(True)
    assert float(loss0) == pytest.approx(float(loss1), rel=1e-6)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = {tuple(p): g for p, g in jax.tree_util.tree_leaves_with_path(g1)}
    assert len(flat0) == len(flat1)
    # remat recomputes the forward inside the backward sweep, so XLA fuses/
    # reassociates differently: grads agree to float32 rounding (~1e-7
    # relative, measured), not bit-for-bit. Bound the diff per leaf against
    # that leaf's own scale.
    for path, g in flat0:
        a, b = np.asarray(g), np.asarray(flat1[tuple(path)])
        scale = max(np.abs(a).max(), 1e-8)
        assert np.abs(a - b).max() <= 1e-4 * scale + 1e-7, jax.tree_util.keystr(path)


def test_supervised_durations():
    hp = tiny_hparams("transformer", learn_alignment=False, use_cvae=False)
    batch = make_batch(supervised=True)
    _, _, (y_pred, y_extra) = init_and_run(hp, batch)
    assert y_pred[10] is None  # no attn_outs
    np.testing.assert_array_equal(np.asarray(y_extra[0]), np.asarray(batch["duration"]))


def test_inference_jit():
    hp = tiny_hparams("transformer")
    batch = make_batch()
    model, variables, _ = init_and_run(hp, batch)

    @jax.jit
    def synth(variables, sids, text, text_lens, feats, aids):
        return model.apply(
            variables,
            sids,
            text,
            text_lens,
            64,
            feats=feats,
            aids=aids,
            method=model.inference,
        )

    mel, mel_lens, _ = synth(
        variables,
        batch["sids"],
        batch["text"],
        batch["text_lengths"],
        batch["feats"],
        batch["aids"],
    )
    assert mel.shape == (2, 64, 10)
    assert np.isfinite(np.asarray(mel)).all()
    assert (np.asarray(mel_lens) <= 64).all()


def test_binarization_warmup_soft_path():
    """Before binarization_start_steps the expansion uses soft attention."""
    hp = tiny_hparams("transformer")
    batch = make_batch()
    model = FastSpeech2(
        n_symbols=131, n_channels=10, hparams=hp, stats=STATS, n_speakers=4
    )
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": key, "reparam": key},
        **batch,
        step=jnp.asarray(0),
        train=True,
    )

    def run(step):
        (y_pred, _), _ = model.apply(
            variables,
            **batch,
            step=jnp.asarray(step),
            train=False,
            mutable=["batch_stats"],
        )[0], None
        return np.asarray(y_pred[0])

    early, late = run(0), run(1000)  # start steps = 10
    assert not np.allclose(early, late)
