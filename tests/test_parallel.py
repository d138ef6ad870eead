"""Multi-device (data-parallel) TRAINING tests on the 8-device CPU mesh.

SURVEY §4(d): sharded-step coverage as first-class CI, not only via the
driver's `__graft_entry__.dryrun_multichip`. Asserts the GSPMD-sharded step
computes the same global loss as the unsharded step (sharding is operand
placement, not math).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__ as ge
from viet_tts_tpu.parallel.mesh import make_mesh, shard_batch


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh (tests/conftest.py)")
    return make_mesh(len(jax.devices()))


def _fs2_setup(n_devices):
    from viet_tts_tpu.models.fastspeech2 import FastSpeech2Loss
    from viet_tts_tpu.train.state import TrainState, adamw_with_clip, init_on_cpu
    from viet_tts_tpu.train.steps import make_fs2_train_step

    conf = ge._tiny_conf()
    m = conf["models"]["fastspeech2"]
    m.update(encoder_layers=1, encoder_hidden=32, decoder_layers=1,
             decoder_hidden=32)
    m["building_block"]["block_type"] = "transformer"
    m["building_block"]["transformer"]["conv_filter_size"] = 64
    m["vcae"].update(conv_layers=3, conv_chans_list=[8, 8, 16], gru_units=16)
    m["postnet"].update(embedding_dim=32, conv_layers=3)
    m["variance"]["variance_predictor"]["filter_size"] = 16
    m["variance"]["variance_embedding"]["n_bins"] = 16

    model = ge._make_model(conf)
    B, T_text, T_mel = n_devices * 2, 16, 64
    rng = np.random.RandomState(0)
    batch = dict(
        text=rng.randint(1, 131, (B, T_text)).astype(np.int32),
        text_lengths=np.full(B, T_text, np.int32),
        feats=rng.randn(B, T_mel, 80).astype(np.float32),
        feats_lengths=np.full(B, T_mel, np.int32),
        duration=rng.rand(B, T_mel, T_text).astype(np.float32),
        pitch=rng.randn(B, T_mel).astype(np.float32),
        energy=rng.randn(B, T_mel).astype(np.float32),
        sids=np.zeros(B, np.int32),
        aids=np.zeros(B, np.int32),
        word_ids=np.zeros((B, T_text), np.int32),
    )
    key = jax.random.PRNGKey(0)
    variables = init_on_cpu(
        model.init,
        {"params": key, "dropout": key, "reparam": key},
        text=jnp.asarray(batch["text"]),
        text_lengths=jnp.asarray(batch["text_lengths"]),
        feats=jnp.asarray(batch["feats"]),
        feats_lengths=jnp.asarray(batch["feats_lengths"]),
        duration=jnp.asarray(batch["duration"]),
        pitch=jnp.asarray(batch["pitch"]),
        energy=jnp.asarray(batch["energy"]),
        sids=jnp.asarray(batch["sids"]),
        aids=jnp.asarray(batch["aids"]),
        step=0,
        train=True,
    )
    criterion = FastSpeech2Loss(
        {
            "linbuild": {"start": 1e-4, "stop": 5e-4, "n_up": 10, "n_stop": 35},
            "dur_loss_lambda": {"pdur": 1.0, "wdur": 0.0, "sdur": 0.0},
            "binarization_loss_warmup_steps": 10,
            "binarization_loss_enable_steps": 18,
            "pitch_feature_level": "phoneme_level",
            "energy_feature_level": "phoneme_level",
        }
    )

    def make_state():
        return TrainState.create(
            apply_fn=model.apply,
            params=variables["params"],
            tx=adamw_with_clip(2e-4),
            batch_stats=variables.get("batch_stats", {}),
        )

    return model, criterion, make_state, batch


def test_fs2_sharded_step_matches_single_device(mesh):
    """One data-parallel FS2 training step over the mesh == unsharded step:
    same loss, same updated params."""
    from viet_tts_tpu.train.steps import make_fs2_train_step

    n = mesh.devices.size
    model, criterion, make_state, batch = _fs2_setup(n)
    step = jax.jit(make_fs2_train_step(model, criterion))
    key = jax.random.PRNGKey(0)

    sharded = shard_batch(mesh, batch)
    state_s, metrics_s = step(make_state(), batch, key)
    state_m, metrics_m = step(make_state(), sharded, key)

    for k in metrics_s:
        np.testing.assert_allclose(
            float(metrics_m[k]), float(metrics_s[k]), rtol=1e-4, atol=1e-6,
            err_msg=k,
        )
    # NOTE: raw post-Adam params are NOT compared leaf-by-leaf — at step 1
    # v~0, so update ~ lr*sign(grad) and reduction-order noise in near-zero
    # grads flips signs. The integrated check: a SECOND step's loss (which
    # feeds through the updated params) must still agree.
    _, metrics_s2 = step(state_s, batch, jax.random.fold_in(key, 1))
    _, metrics_m2 = step(state_m, sharded, jax.random.fold_in(key, 1))
    np.testing.assert_allclose(
        float(metrics_m2["total"]), float(metrics_s2["total"]), rtol=2e-3
    )


def test_fs2_sharded_steps_iterate(mesh):
    """Three consecutive sharded steps keep finite, decreasing-ish losses
    (optimizer state stays consistent under GSPMD)."""
    from viet_tts_tpu.train.steps import make_fs2_train_step

    n = mesh.devices.size
    model, criterion, make_state, batch = _fs2_setup(n)
    step = jax.jit(make_fs2_train_step(model, criterion))
    key = jax.random.PRNGKey(0)
    state = make_state()
    sharded = shard_batch(mesh, batch)
    totals = []
    for i in range(3):
        state, metrics = step(state, sharded, jax.random.fold_in(key, i))
        totals.append(float(metrics["total"]))
    assert all(np.isfinite(t) for t in totals), totals
    assert totals[-1] < totals[0], totals


def test_fs2_zero1_sharded_optimizer_matches_single_device(mesh):
    """ZeRO-1: AdamW moments sharded over ``data`` keep the step
    loss-identical to the unsharded step, the moments actually live
    sharded, and the layout survives donated step updates."""
    from viet_tts_tpu.parallel.mesh import shard_state_zero1
    from viet_tts_tpu.train.steps import make_fs2_train_step

    n = mesh.devices.size
    model, criterion, make_state, batch = _fs2_setup(n)
    key = jax.random.PRNGKey(0)

    plain = jax.jit(make_fs2_train_step(model, criterion))
    state_ref, metrics_ref = plain(make_state(), batch, key)

    state_z, shardings = shard_state_zero1(mesh, make_state())
    # the moments must actually be distributed, not replicated
    flat = jax.tree_util.tree_leaves(state_z.opt_state)
    big = [x for x in flat if hasattr(x, "sharding") and np.size(x) >= n]
    assert big, "no shardable optimizer-state leaves"
    assert any(not x.sharding.is_fully_replicated for x in big), (
        "ZeRO-1 left every optimizer-state leaf replicated")

    step_z = jax.jit(
        make_fs2_train_step(model, criterion),
        donate_argnums=(0,),
        out_shardings=(shardings, None),
    )
    sharded = shard_batch(mesh, batch)
    state_z, metrics_z = step_z(state_z, sharded, key)
    for k in metrics_ref:
        np.testing.assert_allclose(
            float(metrics_z[k]), float(metrics_ref[k]),
            rtol=1e-4, atol=1e-6, err_msg=k,
        )
    # layout preserved after the donated update
    flat = jax.tree_util.tree_leaves(state_z.opt_state)
    big = [x for x in flat if hasattr(x, "sharding") and np.size(x) >= n]
    assert any(not x.sharding.is_fully_replicated for x in big)
    # second step (feeds through updated params + moments) still agrees
    _, metrics_ref2 = plain(state_ref, batch, jax.random.fold_in(key, 1))
    _, metrics_z2 = step_z(state_z, sharded, jax.random.fold_in(key, 1))
    np.testing.assert_allclose(
        float(metrics_z2["total"]), float(metrics_ref2["total"]), rtol=2e-3
    )


def test_jets_gan_sharded_step(mesh):
    """One sharded JETS adversarial step (generator + discriminator
    updates) runs on the mesh with finite losses (and, with >=4 devices,
    the tp+dp variant inside the dryrun asserts loss-identity)."""
    ge._dryrun_jets_gan(mesh, mesh.devices.size)


def test_fs2_grad_accum_matches_manual_accumulation():
    """grad_accum=2: the in-scan accumulation equals a hand-rolled loop
    over the exposed micro_loss with the same rng folds and BN chaining —
    same averaged grads, same updated params, same metrics."""
    from viet_tts_tpu.train.steps import make_fs2_train_step

    model, criterion, make_state, batch = _fs2_setup(2)  # B = 4
    A = 2
    step = make_fs2_train_step(model, criterion, grad_accum=A)
    jstep = jax.jit(step)
    key = jax.random.PRNGKey(0)
    state_s, metrics_s = jstep(make_state(), batch, key)

    # oracle: replicate the accumulation with plain Python
    state = make_state()
    step_rng = jax.random.fold_in(key, state.step)
    drop_rng, rep_rng = jax.random.split(step_rng)
    micro = jax.tree_util.tree_map(
        lambda x: np.reshape(x, (A, x.shape[0] // A, *x.shape[1:]))
        if np.ndim(x) else x,
        batch,
    )
    bstats = state.batch_stats
    gsum = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    tsum, lsum = 0.0, None
    for i in range(A):
        mb = jax.tree_util.tree_map(lambda x: x[i], micro)
        (tot_i, (losses_i, mut_i)), g_i = jax.value_and_grad(
            step.micro_loss, has_aux=True
        )(state.params, mb, bstats, state.step,
          jax.random.fold_in(drop_rng, i), jax.random.fold_in(rep_rng, i))
        bstats = mut_i["batch_stats"]
        gsum = jax.tree_util.tree_map(jnp.add, gsum, g_i)
        tsum += float(tot_i)
        lsum = losses_i if lsum is None else jax.tree_util.tree_map(
            jnp.add, lsum, losses_i)
    grads = jax.tree_util.tree_map(lambda g: g / A, gsum)
    state_o = state.apply_gradients(grads=grads, batch_stats=bstats)

    np.testing.assert_allclose(
        float(metrics_s["total"]), tsum / A, rtol=1e-5
    )
    for k in lsum:
        np.testing.assert_allclose(
            float(metrics_s[k]), float(lsum[k]) / A, rtol=1e-4, atol=1e-6,
            err_msg=k,
        )
    # NOTE: post-Adam params are not compared leaf-by-leaf (near-zero
    # step-1 grads make the update ~ lr*sign(grad); reassociation noise
    # between the scan and the python loop flips signs — same caveat as
    # test_fs2_sharded_step_matches_single_device). Integrated check: a
    # second step through each updated state must agree.
    _, m_s2 = jstep(state_s, batch, jax.random.fold_in(key, 1))
    _, m_o2 = jstep(state_o, batch, jax.random.fold_in(key, 1))
    np.testing.assert_allclose(
        float(m_s2["total"]), float(m_o2["total"]), rtol=2e-3
    )


def test_fs2_fsdp_sharded_params_match_single_device(mesh):
    """FSDP (ZeRO-3): params AND moments sharded over ``data`` keep the
    step loss-identical; both trees actually live distributed."""
    from viet_tts_tpu.parallel.mesh import shard_state_fsdp
    from viet_tts_tpu.train.steps import make_fs2_train_step

    n = mesh.devices.size
    model, criterion, make_state, batch = _fs2_setup(n)
    key = jax.random.PRNGKey(0)
    plain = jax.jit(make_fs2_train_step(model, criterion))
    state_ref, metrics_ref = plain(make_state(), batch, key)

    state_f, shardings = shard_state_fsdp(mesh, make_state())
    for tree in (state_f.params, state_f.opt_state):
        big = [x for x in jax.tree_util.tree_leaves(tree)
               if hasattr(x, "sharding") and np.size(x) >= n]
        assert any(not x.sharding.is_fully_replicated for x in big)
    step_f = jax.jit(
        make_fs2_train_step(model, criterion),
        donate_argnums=(0,),
        out_shardings=(shardings, None),
    )
    state_f, metrics_f = step_f(state_f, shard_batch(mesh, batch), key)
    for k in metrics_ref:
        np.testing.assert_allclose(
            float(metrics_f[k]), float(metrics_ref[k]),
            rtol=1e-4, atol=1e-6, err_msg=k,
        )
    big = [x for x in jax.tree_util.tree_leaves(state_f.params)
           if hasattr(x, "sharding") and np.size(x) >= n]
    assert any(not x.sharding.is_fully_replicated for x in big)
    _, metrics_ref2 = plain(state_ref, batch, jax.random.fold_in(key, 1))
    _, metrics_f2 = step_f(state_f, shard_batch(mesh, batch),
                           jax.random.fold_in(key, 1))
    np.testing.assert_allclose(
        float(metrics_f2["total"]), float(metrics_ref2["total"]), rtol=2e-3
    )


def test_jets_gan_zero1_matches_single_device(mesh):
    """ZeRO-1 on BOTH adversarial optimizers (gen + disc): losses identical
    to the unsharded step and both moment trees actually sharded."""
    from viet_tts_tpu.parallel.mesh import shard_state_zero1

    n = mesh.devices.size
    step, make_gen_state, make_disc_state, batch = ge._jets_gan_setup(n * 2)
    raw = step.__wrapped__  # re-jit with pinned ZeRO-1 output layouts
    key = jax.random.PRNGKey(0)
    _, _, metrics_ref = step(make_gen_state(), make_disc_state(), batch, key)

    gen_z, gen_sh = shard_state_zero1(mesh, make_gen_state())
    disc_z, disc_sh = shard_state_zero1(mesh, make_disc_state())
    for st in (gen_z, disc_z):
        big = [x for x in jax.tree_util.tree_leaves(st.opt_state)
               if hasattr(x, "sharding") and np.size(x) >= n]
        assert any(not x.sharding.is_fully_replicated for x in big)
    step_z = jax.jit(
        raw, donate_argnums=(0, 1), out_shardings=(gen_sh, disc_sh, None)
    )
    gen_z, disc_z, metrics_z = step_z(
        gen_z, disc_z, shard_batch(mesh, batch), key
    )
    for k in metrics_ref:
        np.testing.assert_allclose(
            float(metrics_z[k]), float(metrics_ref[k]),
            rtol=2e-4, atol=1e-6, err_msg=k,
        )
    big = [x for x in jax.tree_util.tree_leaves(gen_z.opt_state)
           if hasattr(x, "sharding") and np.size(x) >= n]
    assert any(not x.sharding.is_fully_replicated for x in big)


def test_jets_gan_tensor_parallel_matches_single_device():
    """2-D (data x model) mesh on the ADVERSARIAL step: Megatron shardings
    on the JETS generator encoder/decoder keep both the disc and gen
    updates loss-identical to the unsharded step (VERDICT r2 item 5)."""
    from jax.sharding import PartitionSpec as P
    import flax.traverse_util as tu

    from viet_tts_tpu.parallel.mesh import (
        make_mesh,
        param_partition_specs,
        shard_batch,
        shard_params_tp,
    )

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 virtual devices")
    mesh2d = make_mesh(len(jax.devices()), model_parallel=2)
    n_data = mesh2d.devices.shape[0]

    step, make_gen_state, make_disc_state, batch = ge._jets_gan_setup(
        n_data * 2
    )
    key = jax.random.PRNGKey(0)
    _, _, metrics_ref = step(make_gen_state(), make_disc_state(), batch, key)

    gen_tp = make_gen_state()
    specs = param_partition_specs(gen_tp.params, model_parallel=2)
    flat = tu.flatten_dict(specs)
    sharded_paths = ["/".join(k) for k, v in flat.items() if v != P()]
    # the rules must fire on the espnet encoder/decoder attention + FFN
    assert any("linear_q" in p for p in sharded_paths), sharded_paths[:5]
    assert any("w_2" in p for p in sharded_paths), sharded_paths[:5]
    # ... and on the HiFiGAN vocoder MRF pairs (the serving-roofline bulk)
    assert any("conv1_0/conv/kernel" in p for p in sharded_paths), (
        sharded_paths[:5])
    assert any("conv2_0/conv/kernel" in p for p in sharded_paths), (
        sharded_paths[:5])
    gen_tp = shard_params_tp(mesh2d, gen_tp, specs)

    _, _, metrics_tp = step(
        gen_tp, make_disc_state(), shard_batch(mesh2d, batch), key
    )
    for k in metrics_ref:
        np.testing.assert_allclose(
            float(metrics_tp[k]), float(metrics_ref[k]),
            rtol=2e-4, atol=1e-6, err_msg=k,
        )


def _vits2_gan_setup(B):
    """Tiny VITS2 3-optimizer adversarial step for the TP tests."""
    import jax.numpy as jnp

    from tests.test_vits2 import TINY_HP
    from viet_tts_tpu.models.vits2 import (
        VITS2,
        DurationDiscriminator,
        MultiPeriodDiscriminator,
    )
    from viet_tts_tpu.train.state import TrainState, adamw_with_clip, init_on_cpu
    from viet_tts_tpu.train.vits2_trainer import make_vits2_train_step

    hp = dict(TINY_HP)
    model = VITS2(n_symbols=131, hparams=hp, n_speakers=2, spec_channels=80)
    disc = MultiPeriodDiscriminator(periods=(2,))
    dur_disc = DurationDiscriminator(
        in_channels=hp["hidden_channels"],
        filter_channels=hp["hidden_channels"],
        variant="dur_disc_1",
    )
    T_text, T_mel, hop = 9, 40, 256
    rng = np.random.RandomState(0)
    batch = dict(
        text=jnp.asarray(rng.randint(1, 131, (B, T_text))),
        text_lengths=jnp.full((B,), T_text, jnp.int32),
        feats=jnp.asarray(rng.randn(B, T_mel, 80).astype(np.float32)),
        feats_lengths=jnp.full((B,), T_mel, jnp.int32),
        sids=jnp.zeros((B,), jnp.int32),
        speech=jnp.asarray(0.1 * rng.randn(B, T_mel * hop).astype(np.float32)),
    )
    key = jax.random.PRNGKey(0)
    rngs = {"params": key, "dropout": key, "noise": key, "segment": key}
    gv = init_on_cpu(
        model.init, rngs,
        **{k: v for k, v in batch.items() if k != "speech"},
        step=0, train=True,
    )
    seg = int(hp.get("segment_size", 8192))
    dv = init_on_cpu(
        disc.init, key,
        np.zeros((2, seg, 1), np.float32), np.zeros((2, seg, 1), np.float32),
    )
    ddv = init_on_cpu(
        dur_disc.init, key,
        np.zeros((2, T_text, hp["hidden_channels"]), np.float32),
        np.ones((2, T_text, 1), np.float32),
        np.zeros((2, T_text, 1), np.float32),
        np.zeros((2, T_text, 1), np.float32),
    )
    mel_kw = dict(
        sr=22050, n_fft=1024, hop_length=hop, win_length=1024, window="hann",
        n_mels=80, fmin=0.0, fmax=None, log_base=None,
    )
    step = jax.jit(
        make_vits2_train_step(
            model, disc, dur_disc, mel_kw, {"c_mel": 45.0, "c_kl": 1.0}, hop
        )
    )

    def make_states():
        return (
            TrainState.create(
                apply_fn=model.apply, params=gv["params"],
                tx=adamw_with_clip(2e-4),
            ),
            TrainState.create(
                apply_fn=disc.apply, params=dv["params"],
                tx=adamw_with_clip(2e-4),
            ),
            TrainState.create(
                apply_fn=dur_disc.apply, params=ddv["params"],
                tx=adamw_with_clip(2e-4),
            ),
        )

    return step, make_states, batch


def test_vits2_gan_tensor_parallel_matches_single_device():
    """2-D (data x model) mesh on the VITS2 3-optimizer step: TP shardings
    on the generator (text-encoder attention kernels) keep all three
    updates loss-identical to the unsharded step."""
    from jax.sharding import PartitionSpec as P
    import flax.traverse_util as tu

    from viet_tts_tpu.parallel.mesh import (
        make_mesh,
        param_partition_specs,
        shard_batch,
        shard_params_tp,
    )

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 virtual devices")
    mesh2d = make_mesh(len(jax.devices()), model_parallel=2)
    n_data = mesh2d.devices.shape[0]

    step, make_states, batch = _vits2_gan_setup(n_data * 2)
    key = jax.random.PRNGKey(0)
    gen_s, disc_s, dur_s = make_states()
    _, _, _, metrics_ref = step(gen_s, disc_s, dur_s, batch, key)

    gen_tp, disc_tp, dur_tp = make_states()
    specs = param_partition_specs(gen_tp.params, model_parallel=2)
    flat = tu.flatten_dict(specs)
    sharded_paths = ["/".join(k) for k, v in flat.items() if v != P()]
    # rules must fire on the VITS attention 1x1-conv kernels and on the
    # waveform-decoder MRF pairs
    assert any("conv_q" in p for p in sharded_paths), sharded_paths[:5]
    assert any("conv_o" in p for p in sharded_paths), sharded_paths[:5]
    assert any(
        "res_" in p and "conv1_0/conv/kernel" in p for p in sharded_paths
    ), sharded_paths[:5]
    gen_tp = shard_params_tp(mesh2d, gen_tp, specs)

    _, _, _, metrics_tp = step(
        gen_tp, disc_tp, dur_tp, shard_batch(mesh2d, batch), key
    )
    for k in metrics_ref:
        np.testing.assert_allclose(
            float(metrics_tp[k]), float(metrics_ref[k]),
            rtol=2e-4, atol=1e-6, err_msg=k,
        )


def test_fs2_mixed_precision_train_step():
    """bf16 mixed-precision step (train.mixed_precision): finite losses,
    close to the fp32 step, params stay fp32."""
    from viet_tts_tpu.train.steps import make_fs2_train_step

    model, criterion, make_state, batch = _fs2_setup(2)
    key = jax.random.PRNGKey(0)
    step32 = jax.jit(make_fs2_train_step(model, criterion))
    step16 = jax.jit(make_fs2_train_step(model, criterion, mixed_precision=True))
    state32, m32 = step32(make_state(), batch, key)
    state16, m16 = step16(make_state(), batch, key)
    assert np.isfinite(float(m16["total"]))
    np.testing.assert_allclose(
        float(m16["total"]), float(m32["total"]), rtol=5e-2
    )
    for leaf in jax.tree_util.tree_leaves(state16.params):
        assert leaf.dtype == jnp.float32


def test_fs2_tensor_parallel_step_matches_single_device():
    """2-D (data x model) mesh: Megatron-style kernel shardings keep the
    training-step math identical while actually sharding the big kernels."""
    from jax.sharding import PartitionSpec as P

    from viet_tts_tpu.parallel.mesh import (
        MODEL_AXIS,
        make_mesh,
        param_partition_specs,
        shard_batch,
        shard_params_tp,
    )
    from viet_tts_tpu.train.steps import make_fs2_train_step

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 virtual devices")
    mesh2d = make_mesh(len(jax.devices()), model_parallel=2)
    n_data = mesh2d.devices.shape[0]

    model, criterion, make_state, batch = _fs2_setup(n_data)
    step = jax.jit(make_fs2_train_step(model, criterion))
    key = jax.random.PRNGKey(0)

    state = make_state()
    specs = param_partition_specs(state.params, model_parallel=2)
    # the rules must actually fire on the attention/FFN kernels
    import flax.traverse_util as tu

    flat = tu.flatten_dict(specs)
    sharded_paths = ["/".join(k) for k, v in flat.items() if v != P()]
    assert any("w_qs" in p for p in sharded_paths), sharded_paths[:5]
    assert any("w_2" in p for p in sharded_paths), sharded_paths[:5]

    state_tp = shard_params_tp(mesh2d, state, specs)
    placed = tu.flatten_dict(state_tp.params)
    for k, v in flat.items():
        if v != P():
            assert placed[k].sharding.spec == v, (k, placed[k].sharding)

    batch_tp = shard_batch(mesh2d, batch)
    state_ref, metrics_ref = step(make_state(), batch, key)
    state_out, metrics_tp = step(state_tp, batch_tp, key)
    for k in metrics_ref:
        np.testing.assert_allclose(
            float(metrics_tp[k]), float(metrics_ref[k]),
            rtol=1e-4, atol=1e-6, err_msg=k,
        )
    # second step through the TP-updated params still agrees
    _, m2_ref = step(state_ref, batch, jax.random.fold_in(key, 1))
    _, m2_tp = step(state_out, batch_tp, jax.random.fold_in(key, 1))
    np.testing.assert_allclose(
        float(m2_tp["total"]), float(m2_ref["total"]), rtol=2e-3
    )


def test_tp_rules_cover_conformer_ffn_kernels():
    """The partition rules must fire on the FS2-conformer ff1/ff2 Dense
    pairs and the espnet-conformer *_w_1/*_w_2 FFN convs, not only the
    FFT-block names."""
    from jax.sharding import PartitionSpec as P
    import flax.traverse_util as tu

    from viet_tts_tpu.nn.conformer import ConformerEncoder
    from viet_tts_tpu.nn.espnet_conformer import EspnetConformerEncoder
    from viet_tts_tpu.parallel.mesh import MODEL_AXIS, param_partition_specs

    key = jax.random.PRNGKey(0)
    m = ConformerEncoder(
        n_symbols=30, n_layers=1, d_model=32, num_heads=2, max_seq_len=64
    )
    v = m.init(
        {"params": key, "dropout": key},
        jnp.zeros((1, 8), jnp.int32), jnp.zeros((1, 8), bool),
    )
    specs = tu.flatten_dict(param_partition_specs(v["params"], 2))
    by_path = {"/".join(k): s for k, s in specs.items()}
    assert by_path["layer_0/ff1/Dense_0/kernel"] == P(None, MODEL_AXIS)
    assert by_path["layer_0/ff1/Dense_1/kernel"] == P(MODEL_AXIS, None)
    assert by_path["layer_0/mhsa/query_proj/kernel"] == P(None, MODEL_AXIS)
    assert by_path["layer_0/mhsa/out_proj/kernel"] == P(MODEL_AXIS, None)
    assert by_path["layer_0/conv/dw_conv/kernel"] == P()  # depthwise stays

    e = EspnetConformerEncoder(
        d_model=32, num_heads=2, linear_units=64, num_blocks=1
    )
    ve = e.init(
        {"params": key, "dropout": key},
        jnp.zeros((1, 8, 32)), jnp.ones((1, 8), bool),
    )
    specs_e = tu.flatten_dict(param_partition_specs(ve["params"], 2))
    # FFN convs are 3-D kernels: col = last dim sharded, row = input dim
    fired_col = [
        "/".join(k) for k, s in specs_e.items()
        if k[-1] == "kernel" and "_w_1" in k[-2]
        and len(s) >= 2 and s[-1] == MODEL_AXIS
    ]
    fired_row = [
        "/".join(k) for k, s in specs_e.items()
        if k[-1] == "kernel" and "_w_2" in k[-2]
        and len(s) >= 2 and s[-2] == MODEL_AXIS
    ]
    assert fired_col and fired_row, (
        sorted("/".join(k) for k in specs_e)[:12]
    )


def test_tp_rules_cover_vocoder_mrf_pairs():
    """The vocoder rules shard each MRF conv1 (output channels) / conv2
    (input channels) pair, skip non-divisible channel counts, leave
    WeightNorm scales/biases and the duration-predictor's conv_1/conv_2
    replicated."""
    from jax.sharding import PartitionSpec as P
    import flax.traverse_util as tu

    from viet_tts_tpu.models.hifigan import HiFiGANGenerator
    from viet_tts_tpu.parallel.mesh import MODEL_AXIS, param_partition_specs

    g = HiFiGANGenerator(
        in_channels=16, channels=16,
        upsample_scales=(4, 4, 2, 2), upsample_kernel_sizes=(8, 8, 4, 4),
        resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),),
    )
    v = g.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 16)))
    specs = tu.flatten_dict(param_partition_specs(v["params"], 2))
    by_path = {"/".join(k): s for k, s in specs.items()}
    # stage 0 (C=8): conv1 col (bias shards with the output features),
    # conv2 row (bias replicated: added after the all-reduce); WN scales
    # stay replicated (read shard-locally, no comm)
    assert by_path["block_0_0/conv1_0/conv/kernel"] == P(None, None, MODEL_AXIS)
    assert by_path["block_0_0/conv2_0/conv/kernel"] == P(None, MODEL_AXIS, None)
    assert by_path["block_0_0/conv1_0/conv/bias"] == P(MODEL_AXIS)
    assert by_path["block_0_0/conv2_0/conv/bias"] == P()
    assert by_path["block_0_0/conv1_0/wn/conv/kernel/scale"] == P()
    # last stage has C=1: not divisible -> replicated
    assert by_path["block_3_0/conv1_0/conv/kernel"] == P()
    # input/output convs and upsample kernels stay replicated
    assert by_path["input_conv/conv/kernel"] == P()
    assert by_path["output_conv/conv/kernel"] == P()
    assert by_path["upsample_0/kernel_v"] == P()

    # duration-predictor style conv_1/conv_2 names (underscore-digit) must
    # NOT match the MRF-pair rule
    from viet_tts_tpu.models.vits2.layers import VitsDurationPredictor

    dp = VitsDurationPredictor(filter_channels=16)
    dv = dp.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 8, 16)), jnp.ones((1, 8, 1)),
    )
    specs_dp = tu.flatten_dict(param_partition_specs(dv["params"], 2))
    for k, s in specs_dp.items():
        assert s == P(), ("/".join(map(str, k)), s)


def test_jets_sequence_parallel_inference_matches_single_device(mesh):
    """Sequence-parallel serving: time-sharding the vocoder input
    (`parallel.mesh.seq_sharded` -> JETS.inference(seq_sharding=...))
    spatially partitions the decode over the mesh with identical waveform
    output (GSPMD halo exchanges, math unchanged)."""
    from viet_tts_tpu.models.jets import JETS
    from viet_tts_tpu.parallel.mesh import replicated, seq_sharded
    from viet_tts_tpu.text import NUM_SYMBOLS
    from viet_tts_tpu.train.state import init_on_cpu

    hp = {
        "adim": 32, "aheads": 2, "elayers": 1, "eunits": 64,
        "dlayers": 1, "dunits": 64,
        "duration_predictor_chans": 16, "pitch_predictor_chans": 16,
        "pitch_predictor_layers": 2, "energy_predictor_chans": 16,
        "generator_channels": 16,
        "generator_resblock_kernel_sizes": [3],
        "generator_resblock_dilations": [[1, 3]],
        "segment_size": 8,
    }
    model = JETS(
        n_symbols=NUM_SYMBOLS, n_channels=80, hparams=hp, n_speakers=2
    )
    B, T_text, T_mel = 2, 12, 64
    rng = np.random.RandomState(0)
    text = jnp.asarray(rng.randint(1, NUM_SYMBOLS, (B, T_text)), jnp.int32)
    lens = jnp.full((B,), T_text, jnp.int32)
    sids = jnp.zeros((B,), jnp.int32)
    key = jax.random.PRNGKey(0)
    variables = init_on_cpu(
        model.init, {"params": key, "dropout": key, "noise": key},
        sids, text, lens, T_mel, method=model.inference,
    )

    def synth(variables, sids, text, lens, seq_sharding=None):
        return model.apply(
            variables, sids, text, lens, T_mel,
            seq_sharding=seq_sharding, method=model.inference,
        )

    wav_ref, len_ref = jax.jit(synth)(variables, sids, text, lens)

    variables_r = jax.device_put(variables, replicated(mesh))
    wav_sp, len_sp = jax.jit(
        lambda v, s, t, l: synth(v, s, t, l, seq_sharding=seq_sharded(mesh))
    )(variables_r, sids, text, lens)

    np.testing.assert_array_equal(np.asarray(len_sp), np.asarray(len_ref))
    np.testing.assert_allclose(
        np.asarray(wav_sp), np.asarray(wav_ref), rtol=1e-5, atol=1e-5
    )


def test_hybrid_mesh_single_slice_fallback(mesh):
    """`make_hybrid_mesh` on a single-slice host (the CI's virtual CPU
    devices carry no `slice_index`) falls back to `make_mesh` with the same
    axis names, 1-D and 2-D, and the 2-D mesh drives a TP-sharded FS2 step
    to finite losses."""
    from viet_tts_tpu.parallel.mesh import (
        make_hybrid_mesh,
        param_partition_specs,
        shard_params_tp,
    )
    from viet_tts_tpu.train.steps import make_fs2_train_step

    m1 = make_hybrid_mesh()
    assert m1.axis_names == ("data",)
    assert m1.devices.size == len(jax.devices())

    m2 = make_hybrid_mesh(model_parallel=2)
    assert m2.axis_names == ("data", "model")
    assert m2.shape["model"] == 2

    n = m2.shape["data"]
    model, criterion, make_state, batch = _fs2_setup(n)
    step = jax.jit(make_fs2_train_step(model, criterion))
    state = make_state()
    specs = param_partition_specs(state.params, model_parallel=2)
    state = shard_params_tp(m2, state, specs)
    sharded = shard_batch(m2, batch)
    state, metrics = step(state, sharded, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["total"]))
