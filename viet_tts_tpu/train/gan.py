"""Adversarial trainers: HiFi-GAN (and later JETS / VITS2).

The reference's two-phase loop (`hifigan_trainer.py:140-170`) — disc step on
detached fakes, then gen step against the UPDATED discriminator — is one
jitted function over a (gen_state, disc_state) pair; `.detach()` becomes
`stop_gradient`, and the discriminator update happens inside the same graph
before the generator grads are taken.
"""

from __future__ import annotations

import os
from typing import Any, Dict

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
from viet_tts_tpu.train import checkpoint as ckpt
from viet_tts_tpu.train.state import (
    TrainState,
    adamw_with_clip,
    exponential_lr,
    init_on_cpu,
    set_learning_rate,
)
from viet_tts_tpu.train.trainer import BaseTrainer, log
from viet_tts_tpu.utils.logging import text_colors


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
        self.train_step = jax.jit(
            make_hifigan_train_step(self.model, self.discriminator, self.mel_loss),
            donate_argnums=(0, 1),
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
