"""Adversarial trainers: HiFi-GAN (and later JETS / VITS2).

The reference's two-phase loop (`hifigan_trainer.py:140-170`) — disc step on
detached fakes, then gen step against the UPDATED discriminator — is one
jitted function over a (gen_state, disc_state) pair; `.detach()` becomes
`stop_gradient`, and the discriminator update happens inside the same graph
before the generator grads are taken.
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp

from viet_tts_tpu.data.vocoder import (
    VocoderBatcher,
    VocoderDataset,
    VocoderSegmentCollate,
)
from viet_tts_tpu.models.hifigan import (
    HiFiGANGenerator,
    MelSpectrogramLoss,
    MultiScaleMultiPeriodDiscriminator,
    discriminator_adversarial_loss,
    feature_match_loss,
    generator_adversarial_loss,
)
from viet_tts_tpu.train.state import (
    TrainState,
    adamw_with_clip,
    exponential_lr,
    init_on_cpu,
    set_learning_rate,
)
from viet_tts_tpu.train.trainer import BaseTrainer, jit_train_step, log


def make_hifigan_train_step(gen, disc, mel_loss: MelSpectrogramLoss, lambdas=None):
    lambdas = lambdas or {"mel": 45.0, "fm": 2.0, "adv": 1.0}

    def train_step(gen_state: TrainState, disc_state: TrainState, batch):
        mel, speech = batch["mel"], batch["speech"]
        g = batch.get("g")

        y_hat = gen.apply({"params": gen_state.params}, mel, g)
        y_hat_sg = jax.lax.stop_gradient(y_hat)

        # ---- discriminator update (fake detached) ----
        def disc_loss_fn(dparams):
            p_hat = disc.apply({"params": dparams}, y_hat_sg)
            p = disc.apply({"params": dparams}, speech)
            real, fake = discriminator_adversarial_loss(p_hat, p)
            return real + fake, (real, fake)

        (d_all, (d_real, d_fake)), d_grads = jax.value_and_grad(
            disc_loss_fn, has_aux=True
        )(disc_state.params)
        disc_state = disc_state.apply_gradients(grads=d_grads)

        # ---- generator update against the updated discriminator ----
        def gen_loss_fn(gparams):
            y_hat = gen.apply({"params": gparams}, mel, g)
            p_hat = disc.apply({"params": disc_state.params}, y_hat)
            p = jax.lax.stop_gradient(
                disc.apply({"params": disc_state.params}, speech)
            )
            loss_mel = mel_loss(y_hat, speech) * lambdas["mel"]
            loss_fm = feature_match_loss(p_hat, p) * lambdas["fm"]
            loss_adv = generator_adversarial_loss(p_hat) * lambdas["adv"]
            total = loss_adv + loss_fm + loss_mel
            return total, {"gen": total, "mel": loss_mel, "fm": loss_fm, "adv": loss_adv}

        (g_all, g_metrics), g_grads = jax.value_and_grad(gen_loss_fn, has_aux=True)(
            gen_state.params
        )
        gen_state = gen_state.apply_gradients(grads=g_grads)

        metrics = dict(g_metrics)
        metrics.update(disc=d_all, disc_real=d_real, disc_fake=d_fake)
        return gen_state, disc_state, metrics

    return train_step


def make_jets_train_step(
    model, disc, mel_loss: MelSpectrogramLoss, lambdas: Dict[str, float], hop: int
):
    """JETS adversarial step (`jets_trainer.py:135-200`): generator forward,
    disc update on detached fake vs aligned real segments, generator update
    (mel*45 + adv + fm*2 + var + align*2) against the updated discriminator."""

    from viet_tts_tpu.models.jets.loss import forward_sum_with_prior, variance_loss
    from viet_tts_tpu.ops import get_segments

    seg = int(model.hparams.get("segment_size", 64))

    def gen_forward(params, batch_stats, batch, rng):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            text=batch["text"],
            text_lengths=batch["text_lengths"],
            feats=batch["feats"],
            feats_lengths=batch["feats_lengths"],
            pitch=batch["pitch"][..., None],
            energy=batch["energy"][..., None],
            sids=batch["sids"],
            train=True,
            rngs={"noise": rng, "dropout": jax.random.fold_in(rng, 1)},
            mutable=["batch_stats"],
        )

    def train_step(gen_state, disc_state, batch, rng):
        rng = jax.random.fold_in(rng, gen_state.step)
        outs, _ = gen_forward(gen_state.params, gen_state.batch_stats, batch, rng)
        wav_hat = jnp.swapaxes(outs[0], 1, 2)  # (B, S*up, 1)
        start_idxs = outs[3]
        speech_seg = get_segments(
            batch["speech"][:, None, :], start_idxs * hop, seg * hop
        )
        speech_seg = jnp.swapaxes(speech_seg, 1, 2)  # (B, S*up, 1)

        def disc_loss_fn(dparams):
            p_hat = disc.apply({"params": dparams}, jax.lax.stop_gradient(wav_hat))
            p = disc.apply({"params": dparams}, speech_seg)
            real, fake = discriminator_adversarial_loss(p_hat, p)
            return real + fake, (real, fake)

        (d_all, (d_real, d_fake)), d_grads = jax.value_and_grad(
            disc_loss_fn, has_aux=True
        )(disc_state.params)
        disc_state = disc_state.apply_gradients(grads=d_grads)

        def gen_loss_fn(gparams):
            # same rng -> same random segments as the disc phase
            outs, mut = gen_forward(gparams, gen_state.batch_stats, batch, rng)
            (
                wav,
                bin_loss,
                log_p_attn,
                _,
                d_outs,
                ds,
                p_outs,
                ps,
                e_outs,
                es,
            ) = outs
            wav = jnp.swapaxes(wav, 1, 2)
            p_hat = disc.apply({"params": disc_state.params}, wav)
            p = jax.lax.stop_gradient(
                disc.apply({"params": disc_state.params}, speech_seg)
            )
            l_mel = mel_loss(wav, speech_seg) * lambdas["mel"]
            l_adv = generator_adversarial_loss(p_hat) * lambdas["adv"]
            l_fm = feature_match_loss(p_hat, p) * lambdas["fm"]
            dur, pit, ene = variance_loss(
                d_outs, ds, p_outs, ps, e_outs, es, batch["text_lengths"]
            )
            l_var = (dur + pit + ene) * lambdas["var"]
            fsum = forward_sum_with_prior(
                log_p_attn, batch["text_lengths"], batch["feats_lengths"]
            )
            l_align = (fsum + bin_loss) * lambdas["align"]
            total = l_mel + l_adv + l_fm + l_var + l_align
            return total, (
                {
                    "gen": total,
                    "mel": l_mel,
                    "adv": l_adv,
                    "fm": l_fm,
                    "var": l_var,
                    "align": l_align,
                },
                mut,
            )

        (g_all, (g_metrics, mut)), g_grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True
        )(gen_state.params)
        gen_state = gen_state.apply_gradients(
            grads=g_grads, batch_stats=mut["batch_stats"]
        )
        metrics = dict(g_metrics)
        metrics.update(disc=d_all, disc_real=d_real, disc_fake=d_fake)
        return gen_state, disc_state, metrics

    return train_step


class HiFiGANTrainer(BaseTrainer):
    """Vocoder GAN training (`src/trainer/hifigan_trainer.py`)."""

    task = "hifigan"

    def __init_dataset__(self):
        audio_conf = self.conf["audio"]
        seg = self.conf["models"]["hifigan"]["segment_size"]
        up = audio_conf["stft"]["hop_length"]
        bs = self.conf["train"]["batch_size"]
        seed = self.conf["train"]["seed"]
        self.train_loader = VocoderBatcher(
            VocoderDataset(self.train_set, audio_conf),
            bs,
            VocoderSegmentCollate(seg, up, seed=seed),
            seed=seed,
        )
        self.valid_loader = VocoderBatcher(
            VocoderDataset(self.test_set, audio_conf),
            bs,
            VocoderSegmentCollate(seg, up, seed=seed + 1),
            seed=seed + 1,
        )
        self.stats = None

    def __init_model__(self):
        hp = self.conf["models"]["hifigan"]
        self.model = HiFiGANGenerator(
            in_channels=self.conf["audio"]["mel"]["channels"],
            channels=hp["upsample_initial_channel"],
            global_channels=192 if hp.get("use_spk") else -1,
            upsample_scales=tuple(hp["upsample_rates"]),
            upsample_kernel_sizes=tuple(hp["upsample_kernel_sizes"]),
            resblock_kernel_sizes=tuple(hp["resblock_kernel_sizes"]),
            resblock_dilations=tuple(map(tuple, hp["resblock_dilation_sizes"])),
        )
        dp = hp.get("discriminator_params", {})
        self.discriminator = MultiScaleMultiPeriodDiscriminator(
            scales=dp.get("scales", 1),
            scale_params=dp.get("scale_discriminator_params"),
            periods=tuple(dp.get("periods", (2, 3, 5, 7, 11))),
            period_params=dp.get("period_discriminator_params"),
        )

        batch = next(iter(self.valid_loader))
        self.gen_variables = init_on_cpu(self.model.init, self.rng, batch["mel"])
        wav_shape = batch["speech"]
        self.disc_variables = init_on_cpu(
            self.discriminator.init, self.rng, wav_shape
        )

    def __init_loss__(self):
        a = self.conf["audio"]
        self.mel_loss = MelSpectrogramLoss(
            fs=a["signal"]["sampling_rate"],
            n_fft=a["stft"]["filter_length"],
            hop_length=a["stft"]["hop_length"],
            win_length=a["stft"]["win_length"],
            window=a["stft"]["window"],
            n_mels=a["mel"]["channels"],
            fmin=a["mel"]["fmin"],
            fmax=a["mel"]["fmax"],
        )

    def __init_optimizer__(self):
        opt = self.conf["train"]["hifigan"]["optimizer"]
        self.base_lr = opt["lr"]
        self.gamma = self.conf["train"]["hifigan"].get("scheduler", {}).get(
            "gamma", 0.999875
        )

        def make_tx():
            return adamw_with_clip(
                self.base_lr,
                betas=tuple(opt.get("betas", (0.8, 0.99))),
                eps=opt.get("eps", 1e-9),
                weight_decay=opt.get("weight_decay", 0.0),
                grad_clip=self.conf["train"]["grad_clip_thresh"],
            )

        self.state = TrainState.create(
            apply_fn=self.model.apply, params=self.gen_variables["params"], tx=make_tx()
        )
        self.disc_state = TrainState.create(
            apply_fn=self.discriminator.apply,
            params=self.disc_variables["params"],
            tx=make_tx(),
        )
        self.try_resume()
        self.try_resume_discriminator()
        self.train_step, (self.state, self.disc_state) = jit_train_step(
            self.conf,
            self.mesh,
            make_hifigan_train_step(self.model, self.discriminator, self.mel_loss),
            [self.state, self.disc_state],
        )

        def _valid(gen_params, batch):
            y_hat = self.model.apply({"params": gen_params}, batch["mel"])
            return self.mel_loss(y_hat, batch["speech"])

        self.valid_step = jax.jit(_valid)

    # discriminator rides in a separate file like the reference's
    # last_dicriminator_statedict.pt (`base.py:119-126`)
    def save_model(self):
        super().save_model()
        payload = {
            "params": jax.device_get(self.disc_state.params),
            "opt_state": jax.device_get(self.disc_state.opt_state),
        }
        path = os.path.join(
            self.args.output_folder, "last_discriminator_statedict.msgpack"
        )
        from flax import serialization

        with open(path, "wb") as f:
            f.write(serialization.to_bytes(payload))

    def try_resume_discriminator(self):
        from flax import serialization

        path = os.path.join(
            self.args.output_folder, "last_discriminator_statedict.msgpack"
        )
        if not os.path.exists(path):
            if self.iter:
                log.warning(
                    "no discriminator checkpoint found; fresh discriminator "
                    "can make resumed GAN training harder"
                )
            return
        target = {
            "params": jax.device_get(self.disc_state.params),
            "opt_state": jax.device_get(self.disc_state.opt_state),
        }
        with open(path, "rb") as f:
            loaded = serialization.from_bytes(target, f.read())
        self.disc_state = self.disc_state.replace(
            params=loaded["params"], opt_state=loaded["opt_state"]
        )

    def train_one_epoch(self):
        log_step = self.conf["train"]["log_step"]
        for batch in self.train_loader:
            batch = self._device_batch(batch)
            self.state, self.disc_state, metrics = self.train_step(
                self.state, self.disc_state, batch
            )
            if self.iter % log_step == 0:
                host = {k: float(v) for k, v in metrics.items()}
                lr = float(self.state.opt_state.hyperparams["learning_rate"])
                self.train_logger.log(host, self.iter, lr=lr)
                log.info(
                    f"iter {self.iter} | "
                    + " ".join(f"{k}={v:.3f}" for k, v in host.items())
                )
            self.iter += 1
            if self.iter >= self.args.max_iter:
                break

    def valid_one_epoch(self):
        self.state = set_learning_rate(
            self.state, exponential_lr(self.base_lr, self.gamma, self.epoch + 1)
        )
        self.disc_state = set_learning_rate(
            self.disc_state, exponential_lr(self.base_lr, self.gamma, self.epoch + 1)
        )
        total, n = 0.0, 0
        for batch in self.valid_loader:
            batch = self._device_batch(batch)
            total += float(self.valid_step(self.state.params, batch))
            n += 1
        val = total / max(n, 1)
        self.valid_logger.log({"mel": val}, self.iter)
        self._report_validation({"mel": val})


class JETSTrainer(BaseTrainer):
    """End-to-end adversarial training (`src/trainer/jets_trainer.py`)."""

    task = "jets"

    def __init_dataset__(self):
        from viet_tts_tpu.data.batching import BucketBatcher, make_jets_collate
        from viet_tts_tpu.data.dataset import AcousticDataset, load_stats, save_stats

        audio_conf = self.conf["audio"]
        stats_path = os.path.join(self.args.output_folder, "stats.json")
        stats = load_stats(stats_path) if os.path.exists(stats_path) else None
        kw = dict(
            speakers=self.speakers,
            accents=self.accents,
            include_speech=True,
            load_duration=False,
        )
        self.train_data = AcousticDataset(
            self.train_set, audio_conf, stats=stats, **kw
        )
        self.stats = self.train_data.stats
        os.makedirs(self.args.output_folder, exist_ok=True)
        if not os.path.exists(stats_path):
            save_stats(self.stats, stats_path)
        self.valid_data = AcousticDataset(
            self.test_set, audio_conf, stats=self.stats, **kw
        )
        bs = self.conf["train"]["batch_size"]
        seed = self.conf["train"]["seed"]
        collate = make_jets_collate(audio_conf["stft"]["hop_length"])
        self.train_loader = BucketBatcher(
            self.train_data, bs, seed=seed, collate_fn=collate
        )
        self.valid_loader = BucketBatcher(
            self.valid_data, bs, seed=seed, collate_fn=collate
        )

    def __init_model__(self):
        from viet_tts_tpu.models.jets import JETS

        hp = self.conf["models"]["jets"]
        self.model = JETS(
            n_symbols=self.n_symbols,
            n_channels=self.conf["audio"]["mel"]["channels"],
            hparams=hp["generator_params"],
            n_speakers=len(self.speakers) if self.speakers else 1,
        )
        dp = hp.get("discriminator_params", {})
        self.discriminator = MultiScaleMultiPeriodDiscriminator(
            scales=dp.get("scales", 1),
            scale_params=dp.get("scale_discriminator_params"),
            periods=tuple(dp.get("periods", (2, 3, 5, 7, 11))),
            period_params=dp.get("period_discriminator_params"),
        )

        batch = next(iter(self.valid_loader))
        key = self.rng
        self.gen_variables = init_on_cpu(
            self.model.init,
            {"params": key, "dropout": key, "noise": key},
            text=batch["text"],
            text_lengths=batch["text_lengths"],
            feats=batch["feats"],
            feats_lengths=batch["feats_lengths"],
            pitch=batch["pitch"][..., None],
            energy=batch["energy"][..., None],
            sids=batch["sids"],
            train=True,
        )
        init_type = self.model.hparams.get("init_type", "pytorch")
        if init_type != "pytorch":
            from viet_tts_tpu.train.state import apply_init_scheme

            self.gen_variables = dict(self.gen_variables)
            self.gen_variables["params"] = apply_init_scheme(
                self.gen_variables["params"], init_type, self.rng
            )
        seg = int(self.model.hparams.get("segment_size", 64)) * self.conf[
            "audio"
        ]["stft"]["hop_length"]
        import numpy as np

        self.disc_variables = init_on_cpu(
            self.discriminator.init, key, np.zeros((2, seg, 1), np.float32)
        )

    def __init_loss__(self):
        a = self.conf["audio"]
        loss_conf = self.conf["train"]["jets"]["loss"]
        # JETS mel loss uses natural log (`jets/loss.py:39-48` log_base None)
        self.mel_loss = MelSpectrogramLoss(
            fs=a["signal"]["sampling_rate"],
            n_fft=a["stft"]["filter_length"],
            hop_length=a["stft"]["hop_length"],
            win_length=a["stft"]["win_length"],
            window=a["stft"]["window"],
            n_mels=a["mel"]["channels"],
            fmin=a["mel"]["fmin"],
            fmax=a["mel"]["fmax"],
            log_base=None,
        )
        self.lambdas = {
            "adv": loss_conf.get("lambda_adv", 1.0),
            "mel": loss_conf.get("lambda_mel", 45.0),
            "fm": loss_conf.get("lambda_feat_match", 2.0),
            "var": loss_conf.get("lambda_var", 1.0),
            "align": loss_conf.get("lambda_align", 2.0),
        }

    def __init_optimizer__(self):
        opt = self.conf["train"]["jets"]["optimizer"]
        gen_conf = opt.get("gen_optim_conf", {"lr": 2e-4})
        dis_conf = opt.get("dis_optim_conf", gen_conf)
        self.base_lr = gen_conf["lr"]
        self.dis_lr = dis_conf["lr"]
        self.gamma = opt.get("gen_scheduler_conf", {}).get("gamma", 0.999875)
        self.dis_gamma = opt.get("dis_scheduler_conf", {}).get("gamma", 0.999875)

        def tx(conf):
            return adamw_with_clip(
                conf["lr"],
                betas=tuple(conf.get("betas", (0.8, 0.99))),
                eps=conf.get("eps", 1e-9),
                weight_decay=conf.get("weight_decay", 0.0),
                grad_clip=self.conf["train"]["grad_clip_thresh"],
            )

        self.state = TrainState.create(
            apply_fn=self.model.apply,
            params=self.gen_variables["params"],
            tx=tx(gen_conf),
            batch_stats=self.gen_variables.get("batch_stats", {}),
        )
        self.disc_state = TrainState.create(
            apply_fn=self.discriminator.apply,
            params=self.disc_variables["params"],
            tx=tx(dis_conf),
        )
        self.try_resume()
        HiFiGANTrainer.try_resume_discriminator(self)
        self.train_step, (self.state, self.disc_state) = jit_train_step(
            self.conf,
            self.mesh,
            make_jets_train_step(
                self.model,
                self.discriminator,
                self.mel_loss,
                self.lambdas,
                self.conf["audio"]["stft"]["hop_length"],
            ),
            [self.state, self.disc_state],
        )

        def _valid(gen_params, batch_stats, batch, rng):
            outs = self.model.apply(
                {"params": gen_params, "batch_stats": batch_stats},
                text=batch["text"],
                text_lengths=batch["text_lengths"],
                feats=batch["feats"],
                feats_lengths=batch["feats_lengths"],
                pitch=batch["pitch"][..., None],
                energy=batch["energy"][..., None],
                sids=batch["sids"],
                train=False,
                rngs={"noise": rng},
            )
            from viet_tts_tpu.ops import get_segments

            hop = self.conf["audio"]["stft"]["hop_length"]
            wav_hat = jnp.swapaxes(outs[0], 1, 2)
            speech_seg = jnp.swapaxes(
                get_segments(
                    batch["speech"][:, None, :],
                    outs[3] * hop,
                    int(self.model.hparams.get("segment_size", 64)) * hop,
                ),
                1,
                2,
            )
            return self.mel_loss(wav_hat, speech_seg)

        self.valid_step = jax.jit(_valid)

    def save_model(self):
        BaseTrainer.save_model(self)
        from flax import serialization

        payload = {
            "params": jax.device_get(self.disc_state.params),
            "opt_state": jax.device_get(self.disc_state.opt_state),
        }
        path = os.path.join(
            self.args.output_folder, "last_discriminator_statedict.msgpack"
        )
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(payload))

    def train_one_epoch(self):
        log_step = self.conf["train"]["log_step"]
        for batch in self.train_loader:
            batch = self._device_batch(batch)
            self.state, self.disc_state, metrics = self.train_step(
                self.state, self.disc_state, batch, self.rng
            )
            if self.iter % log_step == 0:
                host = {k: float(v) for k, v in metrics.items()}
                lr = float(self.state.opt_state.hyperparams["learning_rate"])
                self.train_logger.log(host, self.iter, lr=lr)
                log.info(
                    f"iter {self.iter} | "
                    + " ".join(f"{k}={v:.3f}" for k, v in host.items())
                )
            self.iter += 1
            if self.iter >= self.args.max_iter:
                break

    def valid_one_epoch(self):
        self.state = set_learning_rate(
            self.state, exponential_lr(self.base_lr, self.gamma, self.epoch + 1)
        )
        self.disc_state = set_learning_rate(
            self.disc_state,
            exponential_lr(self.dis_lr, self.dis_gamma, self.epoch + 1),
        )
        total, n = 0.0, 0
        for batch in self.valid_loader:
            batch = self._device_batch(batch)
            total += float(
                self.valid_step(
                    self.state.params, self.state.batch_stats, batch, self.rng
                )
            )
            n += 1
        val = total / max(n, 1)
        self.valid_logger.log({"mel": val}, self.iter)
        self._report_validation({"mel": val})


from viet_tts_tpu.train.vits2_trainer import VITS2Trainer  # noqa: E402  (CLI import point)
