"""VITS2 trainer: 3-optimizer adversarial loop (`src/trainer/vits2_trainer.py`).

One jitted step updates the duration discriminator, the multi-period
discriminator, then the generator — mel recomputed in-graph from the sliced
waveforms (the reference's feats-extractor round trip, `vits2_trainer.py:175-176`),
MAS noise-scale annealing rides on the traced step (the reference's
per-iteration host update at `:151-156`, with its initial/delta swap bug fixed).
"""

from __future__ import annotations

import os
import jax
import jax.numpy as jnp
import numpy as np

from viet_tts_tpu.data.batching import BucketBatcher, collate_acoustic
from viet_tts_tpu.data.dataset import AcousticDataset, load_stats, save_stats
from viet_tts_tpu.dsp.stft import log_mel_spectrogram
from viet_tts_tpu.models.vits2 import (
    VITS2,
    DurationDiscriminator,
    MultiPeriodDiscriminator,
    discriminator_loss,
    feature_loss,
    generator_loss,
    kl_loss,
)
from viet_tts_tpu.ops import get_segments
from viet_tts_tpu.train.state import (
    TrainState,
    adamw_with_clip,
    exponential_lr,
    init_on_cpu,
    set_learning_rate,
)
from viet_tts_tpu.train.trainer import BaseTrainer, jit_train_step, log


def intersperse_ids(ids: np.ndarray, item: int = 0) -> np.ndarray:
    out = np.full(len(ids) * 2 + 1, item, ids.dtype)
    out[1::2] = ids
    return out


class InterspersedDataset:
    """Blank token 0 interleaved between phonemes (`vits_loader.py:33,128-132`)."""

    def __init__(self, base: AcousticDataset):
        self.base = base
        self.inputs = base.inputs

    def __len__(self):
        return len(self.base)

    def __getitem__(self, i):
        item = self.base[i]
        item["text"] = intersperse_ids(item["text"])
        item["word_ids"] = np.full(len(item["text"]), -1, np.int32)
        return item


def make_vits2_train_step(model, disc, dur_disc, mel_kw, lambdas, hop):
    seg_wav = int(model.hparams.get("segment_size", 8192))

    def gen_forward(params, batch, rng, step):
        return model.apply(
            {"params": params},
            text=batch["text"],
            text_lengths=batch["text_lengths"],
            feats=batch["feats"],
            feats_lengths=batch["feats_lengths"],
            sids=batch["sids"],
            step=step,
            train=True,
            rngs={
                "noise": rng,
                "dropout": jax.random.fold_in(rng, 1),
                "segment": jax.random.fold_in(rng, 2),
            },
        )

    def mel_of(wav):
        return log_mel_spectrogram(wav, **mel_kw)

    def train_step(gen_state, disc_state, dur_state, batch, rng):
        rng = jax.random.fold_in(rng, gen_state.step)
        outs = gen_forward(gen_state.params, batch, rng, gen_state.step)
        (
            y_hat,
            l_length,
            attn,
            ids_slice,
            x_mask,
            y_mask,
            (z, z_p, m_p, logs_p, m_q, logs_q),
            (hidden_x, logw, logw_),
        ) = outs
        y = get_segments(
            batch["speech"][:, None, :], ids_slice * hop, seg_wav
        )[:, 0, :]  # (B, seg_wav)
        y3 = y[..., None]
        y_hat_sg = jax.lax.stop_gradient(y_hat)

        # --- duration discriminator update ---
        def dur_loss_fn(dparams):
            probs = dur_disc.apply(
                {"params": dparams},
                jax.lax.stop_gradient(hidden_x),
                jax.lax.stop_gradient(x_mask),
                jax.lax.stop_gradient(logw_),
                jax.lax.stop_gradient(logw),
            )
            loss, _, _ = discriminator_loss([probs[0]], [probs[1]])
            return loss

        dd_loss, dd_grads = jax.value_and_grad(dur_loss_fn)(dur_state.params)
        dur_state = dur_state.apply_gradients(grads=dd_grads)

        # --- waveform discriminator update ---
        def disc_loss_fn(dparams):
            y_d_r, y_d_g, _, _ = disc.apply({"params": dparams}, y3, y_hat_sg)
            loss, _, _ = discriminator_loss(y_d_r, y_d_g)
            return loss

        d_loss, d_grads = jax.value_and_grad(disc_loss_fn)(disc_state.params)
        disc_state = disc_state.apply_gradients(grads=d_grads)

        # --- generator update (vs updated discriminators) ---
        y_mel = mel_of(y)

        def gen_loss_fn(gparams):
            outs = gen_forward(gparams, batch, rng, gen_state.step)
            (
                y_hat,
                l_length,
                _,
                _,
                x_mask,
                y_mask,
                (z, z_p, m_p, logs_p, m_q, logs_q),
                (hidden_x, logw, logw_),
            ) = outs
            y_hat_mel = mel_of(y_hat[..., 0])
            y_d_r, y_d_g, fmap_r, fmap_g = disc.apply(
                {"params": disc_state.params}, y3, y_hat
            )
            dur_probs = dur_disc.apply(
                {"params": dur_state.params},
                jax.lax.stop_gradient(hidden_x),
                jax.lax.stop_gradient(x_mask),
                logw_,
                logw,
            )
            loss_dur = jnp.sum(l_length)
            loss_mel = jnp.mean(jnp.abs(y_mel - y_hat_mel)) * lambdas["c_mel"]
            loss_kl = kl_loss(z_p, logs_q, m_p, logs_p, y_mask) * lambdas["c_kl"]
            loss_fm = feature_loss(fmap_r, fmap_g)
            loss_gen, _ = generator_loss(y_d_g)
            loss_dur_gen, _ = generator_loss([dur_probs[1]])
            total = loss_gen + loss_fm + loss_mel + loss_dur + loss_kl + loss_dur_gen
            return total, {
                "gen": total,
                "mel": loss_mel,
                "kl": loss_kl,
                "fm": loss_fm,
                "adv": loss_gen,
                "dur": loss_dur,
                "dur_adv": loss_dur_gen,
            }

        (g_all, g_metrics), g_grads = jax.value_and_grad(gen_loss_fn, has_aux=True)(
            gen_state.params
        )
        gen_state = gen_state.apply_gradients(grads=g_grads)
        metrics = dict(g_metrics)
        metrics.update(disc=d_loss, dur_disc=dd_loss)
        return gen_state, disc_state, dur_state, metrics

    return train_step


class VITS2Trainer(BaseTrainer):
    task = "vits2"

    def __init_dataset__(self):
        audio_conf = self.conf["audio"]
        stats_path = os.path.join(self.args.output_folder, "stats.json")
        stats = load_stats(stats_path) if os.path.exists(stats_path) else None
        kw = dict(
            speakers=self.speakers,
            accents=self.accents,
            include_speech=True,
            load_duration=False,
        )
        base_train = AcousticDataset(self.train_set, audio_conf, stats=stats, **kw)
        self.stats = base_train.stats
        os.makedirs(self.args.output_folder, exist_ok=True)
        if not os.path.exists(stats_path):
            save_stats(self.stats, stats_path)
        base_valid = AcousticDataset(
            self.test_set, audio_conf, stats=self.stats, **kw
        )
        self.train_data = InterspersedDataset(base_train)
        self.valid_data = InterspersedDataset(base_valid)

        hop = audio_conf["stft"]["hop_length"]

        def collate(items, t_text, t_mel):
            # items arrive already interspersed; buckets were computed on
            # the interspersed lengths
            batch = collate_acoustic(items, t_text, t_mel)
            del batch["duration"]
            B = len(items)
            speech = np.zeros((B, t_mel * hop), np.float32)
            for i, it in enumerate(items):
                a = it["speech"][: t_mel * hop]
                speech[i, : len(a)] = a
            batch["speech"] = speech
            return batch

        bs = self.conf["train"]["batch_size"]
        seed = self.conf["train"]["seed"]
        self.train_loader = BucketBatcher(
            self.train_data, bs, seed=seed, collate_fn=collate
        )
        self.valid_loader = BucketBatcher(
            self.valid_data, bs, seed=seed, collate_fn=collate
        )

    def __init_model__(self):
        hp = self.conf["models"]["vits2"]
        n_mels = self.conf["audio"]["mel"]["channels"]
        self.model = VITS2(
            n_symbols=self.n_symbols,
            hparams=hp,
            n_speakers=len(self.speakers) if self.speakers else 1,
            spec_channels=n_mels,
        )
        self.discriminator = MultiPeriodDiscriminator(
            periods=tuple(hp.get("mpd_periods", (2, 3, 5, 7, 11)))
        )
        self.duration_discriminator = DurationDiscriminator(
            in_channels=hp["hidden_channels"],
            filter_channels=hp["hidden_channels"],
            variant=hp.get("duration_discriminator_type", "dur_disc_1"),
        )

        batch = next(iter(self.valid_loader))
        key = self.rng
        rngs = {"params": key, "dropout": key, "noise": key, "segment": key}
        self.gen_variables = init_on_cpu(
            self.model.init,
            rngs,
            text=batch["text"],
            text_lengths=batch["text_lengths"],
            feats=batch["feats"],
            feats_lengths=batch["feats_lengths"],
            sids=batch["sids"],
            step=0,
            train=True,
        )
        seg = int(hp.get("segment_size", 8192))
        self.disc_variables = init_on_cpu(
            self.discriminator.init,
            key,
            np.zeros((2, seg, 1), np.float32),
            np.zeros((2, seg, 1), np.float32),
        )
        hidden = hp["hidden_channels"]
        T = batch["text"].shape[1]
        self.dur_variables = init_on_cpu(
            self.duration_discriminator.init,
            key,
            np.zeros((2, T, hidden), np.float32),
            np.ones((2, T, 1), np.float32),
            np.zeros((2, T, 1), np.float32),
            np.zeros((2, T, 1), np.float32),
        )

    def __init_loss__(self):
        a = self.conf["audio"]
        self.mel_kw = dict(
            sr=a["signal"]["sampling_rate"],
            n_fft=a["stft"]["filter_length"],
            hop_length=a["stft"]["hop_length"],
            win_length=a["stft"]["win_length"],
            window=a["stft"]["window"],
            n_mels=a["mel"]["channels"],
            fmin=a["mel"]["fmin"] or 0.0,
            fmax=a["mel"]["fmax"],
            log_base=a["mel"]["log_base"],
        )
        lc = self.conf["train"]["vits2"]["loss"]
        self.lambdas = {"c_mel": lc.get("c_mel", 45), "c_kl": lc.get("c_kl", 1.0)}

    def __init_optimizer__(self):
        opt = self.conf["train"]["vits2"]["optimizer"]
        self.base_lr = opt["lr"]
        self.gamma = self.conf["train"]["vits2"].get("scheduler", {}).get(
            "gamma", 0.999875
        )

        def tx():
            return adamw_with_clip(
                self.base_lr,
                betas=tuple(opt.get("betas", (0.8, 0.99))),
                eps=opt.get("eps", 1e-9),
                weight_decay=opt.get("weight_decay", 0.0),
                grad_clip=self.conf["train"]["grad_clip_thresh"],
            )

        self.state = TrainState.create(
            apply_fn=self.model.apply, params=self.gen_variables["params"], tx=tx()
        )
        self.disc_state = TrainState.create(
            apply_fn=self.discriminator.apply,
            params=self.disc_variables["params"],
            tx=tx(),
        )
        self.dur_state = TrainState.create(
            apply_fn=self.duration_discriminator.apply,
            params=self.dur_variables["params"],
            tx=tx(),
        )
        self.try_resume()
        self.try_resume_discriminators()
        self.train_step, (
            self.state, self.disc_state, self.dur_state
        ) = jit_train_step(
            self.conf,
            self.mesh,
            make_vits2_train_step(
                self.model,
                self.discriminator,
                self.duration_discriminator,
                self.mel_kw,
                self.lambdas,
                self.conf["audio"]["stft"]["hop_length"],
            ),
            [self.state, self.disc_state, self.dur_state],
        )

        def _valid(params, batch, rng):
            outs = self.model.apply(
                {"params": params},
                text=batch["text"],
                text_lengths=batch["text_lengths"],
                feats=batch["feats"],
                feats_lengths=batch["feats_lengths"],
                sids=batch["sids"],
                step=0,
                train=False,
                rngs={
                    "noise": rng,
                    "segment": jax.random.fold_in(rng, 2),
                },
            )
            y_hat, ids_slice = outs[0], outs[3]
            hop = self.conf["audio"]["stft"]["hop_length"]
            seg = int(self.model.hparams.get("segment_size", 8192))
            y = get_segments(batch["speech"][:, None, :], ids_slice * hop, seg)[
                :, 0, :
            ]
            return jnp.mean(
                jnp.abs(
                    log_mel_spectrogram(y, **self.mel_kw)
                    - log_mel_spectrogram(y_hat[..., 0], **self.mel_kw)
                )
            )

        self.valid_step = jax.jit(_valid)

    # VITS2 nests the duration-disc state beside the main discriminator, like
    # the reference's dur_state_dict keys (`vits2_trainer.py:121-128`)
    def save_model(self):
        BaseTrainer.save_model(self)
        from flax import serialization

        payload = {
            "params": jax.device_get(self.disc_state.params),
            "opt_state": jax.device_get(self.disc_state.opt_state),
            "dur_params": jax.device_get(self.dur_state.params),
            "dur_opt_state": jax.device_get(self.dur_state.opt_state),
        }
        path = os.path.join(
            self.args.output_folder, "last_discriminator_statedict.msgpack"
        )
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(payload))

    def try_resume_discriminators(self):
        from flax import serialization

        path = os.path.join(
            self.args.output_folder, "last_discriminator_statedict.msgpack"
        )
        if not os.path.exists(path):
            return
        target = {
            "params": jax.device_get(self.disc_state.params),
            "opt_state": jax.device_get(self.disc_state.opt_state),
            "dur_params": jax.device_get(self.dur_state.params),
            "dur_opt_state": jax.device_get(self.dur_state.opt_state),
        }
        with open(path, "rb") as f:
            loaded = serialization.from_bytes(target, f.read())
        self.disc_state = self.disc_state.replace(
            params=loaded["params"], opt_state=loaded["opt_state"]
        )
        self.dur_state = self.dur_state.replace(
            params=loaded["dur_params"], opt_state=loaded["dur_opt_state"]
        )

    def train_one_epoch(self):
        log_step = self.conf["train"]["log_step"]
        for batch in self.train_loader:
            batch = self._device_batch(batch)
            self.state, self.disc_state, self.dur_state, metrics = self.train_step(
                self.state, self.disc_state, self.dur_state, batch, self.rng
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
        for state_attr in ("state", "disc_state", "dur_state"):
            setattr(
                self,
                state_attr,
                set_learning_rate(
                    getattr(self, state_attr),
                    exponential_lr(self.base_lr, self.gamma, self.epoch + 1),
                ),
            )
        total, n = 0.0, 0
        for batch in self.valid_loader:
            batch = self._device_batch(batch)
            total += float(self.valid_step(self.state.params, batch, self.rng))
            n += 1
        val = {"mel": total / max(n, 1)}
        self.valid_logger.log(val, self.iter)
        self._report_validation(val)
