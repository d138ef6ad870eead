"""Joint acoustic+vocoder training (text2wav task) and speaker finetuning.

Parity targets: `src/trainer/joint_trainer.py` (adversarial step vocoding
predicted-mel segments, acoustic criterion with is_joint=True on ground
truth mel segments, warm start from separate acoustic/vocoder checkpoints)
and `src/trainer/joint_finetuner.py` (speaker/accent embedding-row surgery,
adapter-speaker-only data for the first 50 epochs).
"""

from __future__ import annotations

import json
import os
import jax
import jax.numpy as jnp
import numpy as np

from viet_tts_tpu.data.batching import BucketBatcher
from viet_tts_tpu.data.dataset import AcousticDataset, load_stats, save_stats
from viet_tts_tpu.models.hifigan import (
    MelSpectrogramLoss,
    MultiScaleMultiPeriodDiscriminator,
    discriminator_adversarial_loss,
    feature_match_loss,
    generator_adversarial_loss,
)
from viet_tts_tpu.models.text2wav import Text2Wav
from viet_tts_tpu.ops import get_segments
from viet_tts_tpu.train import checkpoint as ckpt
from viet_tts_tpu.train.gan import HiFiGANTrainer
from viet_tts_tpu.train.state import (
    TrainState,
    adamw_with_clip,
    exponential_lr,
    init_on_cpu,
    set_learning_rate,
)
from viet_tts_tpu.train.trainer import BaseTrainer, jit_train_step, log


def make_joint_train_step(model, disc, mel_loss, criterion, version, hop):
    seg = None  # resolved lazily from model hparams

    def gen_forward(params, batch_stats, batch, rng, step):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        return model.apply(
            variables,
            text=batch["text"],
            text_lengths=batch["text_lengths"],
            feats=batch["feats"],
            feats_lengths=batch["feats_lengths"],
            duration=batch["duration"],
            pitch=batch.get("pitch"),
            energy=batch.get("energy"),
            sids=batch["sids"],
            aids=batch["aids"],
            step=step,
            train=True,
            rngs={
                "noise": rng,
                "dropout": jax.random.fold_in(rng, 1),
                "reparam": jax.random.fold_in(rng, 2),
            },
            mutable=["batch_stats"],
        )

    segment_size = int(model.conf["models"]["hifigan"].get("segment_size", 64))

    def acoustic_losses(y_pred, y_extra, start_idxs, batch, step):
        feat_seg = jnp.swapaxes(
            get_segments(
                jnp.swapaxes(batch["feats"], 1, 2), start_idxs, segment_size
            ),
            1,
            2,
        )
        if version in ("fastspeech2", "adaspeech"):
            targets = (
                feat_seg,
                batch["word_ids"],
                batch["word_ids"].shape[1],
                *y_extra,
            )
            return criterion(y_pred[1:], targets, is_joint=True, step=step)
        # matcha: slice u and mu_y to the same segments
        u_seg = jnp.swapaxes(
            get_segments(jnp.swapaxes(y_pred[2], 1, 2), start_idxs, segment_size),
            1,
            2,
        )
        mu_seg = jnp.swapaxes(
            get_segments(jnp.swapaxes(y_pred[3], 1, 2), start_idxs, segment_size),
            1,
            2,
        )
        preds = (y_pred[1], u_seg, mu_seg) + tuple(y_pred[4:])
        return criterion(
            preds, (feat_seg, batch["text_lengths"]), is_joint=True, step=step
        )

    def train_step(gen_state, disc_state, batch, rng):
        rng = jax.random.fold_in(rng, gen_state.step)
        (y_pred, y_extra, start_idxs), _ = gen_forward(
            gen_state.params, gen_state.batch_stats, batch, rng, gen_state.step
        )
        wav_hat = y_pred[0]  # (B, S*up, 1)
        speech_seg = jnp.swapaxes(
            get_segments(
                batch["speech"][:, None, :],
                start_idxs * hop,
                segment_size * hop,
            ),
            1,
            2,
        )

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
            (y_pred, y_extra, start_idxs), mut = gen_forward(
                gparams, gen_state.batch_stats, batch, rng, gen_state.step
            )
            wav = y_pred[0]
            p_hat = disc.apply({"params": disc_state.params}, wav)
            p = jax.lax.stop_gradient(
                disc.apply({"params": disc_state.params}, speech_seg)
            )
            l_adv = generator_adversarial_loss(p_hat)
            l_fm = feature_match_loss(p_hat, p) * 2.0
            l_mel = mel_loss(wav, speech_seg) * 45.0
            var_losses = acoustic_losses(
                y_pred, y_extra, start_idxs, batch, gen_state.step
            )
            total = l_adv + l_fm + l_mel + sum(var_losses.values())
            metrics = {
                "gen": total,
                "mel": l_mel,
                "adv": l_adv,
                "fm": l_fm,
                **{f"var_{k}": v for k, v in var_losses.items()},
            }
            return total, (metrics, mut)

        (g_all, (g_metrics, mut)), g_grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True
        )(gen_state.params)
        gen_state = gen_state.apply_gradients(
            grads=g_grads,
            batch_stats=mut.get("batch_stats", gen_state.batch_stats),
        )
        metrics = dict(g_metrics)
        metrics.update(disc=d_all, disc_real=d_real, disc_fake=d_fake)
        return gen_state, disc_state, metrics

    return train_step


class JointTrainer(BaseTrainer):
    task = "text2wav"

    @property
    def version(self):
        return getattr(self.args, "version", "fastspeech2") or "fastspeech2"

    def _make_dataset(self, filelist, stats):
        if self.version == "matcha":
            from viet_tts_tpu.train.matcha import MelNormalizedDataset

            base = AcousticDataset(
                filelist,
                self.conf["audio"],
                self.speakers,
                self.accents,
                stats={"pitch": {"mean": 0, "std": 1}, "energy": {"mean": 0, "std": 1}},
                include_speech=True,
            )
            return MelNormalizedDataset(base, stats["mel_mean"], stats["mel_std"])
        return AcousticDataset(
            filelist,
            self.conf["audio"],
            self.speakers,
            self.accents,
            stats=stats,
            include_speech=True,
        )

    def __init_dataset__(self):
        from viet_tts_tpu.data.batching import collate_acoustic

        stats_path = os.path.join(self.args.output_folder, "stats.json")
        stats = None
        # reuse stats shipped with a pretrained acoustic checkpoint
        for src in (self.args.acoustic_checkpoint, self.args.checkpoint):
            if src:
                p = os.path.join(os.path.dirname(src), "stats.json")
                if os.path.exists(p):
                    stats = load_stats(p)
        if os.path.exists(stats_path):
            stats = load_stats(stats_path)

        if self.version == "matcha":
            from viet_tts_tpu.train.matcha import compute_mel_stats

            if stats is None:
                base = AcousticDataset(
                    self.train_set,
                    self.conf["audio"],
                    self.speakers,
                    self.accents,
                    stats={
                        "pitch": {"mean": 0, "std": 1},
                        "energy": {"mean": 0, "std": 1},
                    },
                )
                stats = compute_mel_stats(base)
        else:
            if stats is None:
                probe = AcousticDataset(
                    self.train_set,
                    self.conf["audio"],
                    self.speakers,
                    self.accents,
                )
                stats = probe.stats
        self.stats = stats
        os.makedirs(self.args.output_folder, exist_ok=True)
        if not os.path.exists(stats_path):
            save_stats(self.stats, stats_path)

        self.train_data = self._make_dataset(self.train_set, self.stats)
        self.valid_data = self._make_dataset(self.test_set, self.stats)

        hop = self.conf["audio"]["stft"]["hop_length"]

        def collate_with_speech(items, t_text, t_mel):
            batch = collate_acoustic(items, t_text, t_mel)
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
            self.train_data, bs, seed=seed, collate_fn=collate_with_speech
        )
        self.valid_loader = BucketBatcher(
            self.valid_data, bs, seed=seed, collate_fn=collate_with_speech
        )
        self._collate_with_speech = collate_with_speech

    def __init_model__(self):
        self.model = Text2Wav(
            n_symbols=self.n_symbols,
            n_channels=self.conf["audio"]["mel"]["channels"],
            conf=self.conf,
            stats=self.stats,
            n_speakers=len(self.speakers) if self.speakers else 1,
            n_accents=len(self.accents) if self.accents else 2,
            version=self.version,
        )
        dp = self.conf["models"]["hifigan"].get("discriminator_params", {})
        self.discriminator = MultiScaleMultiPeriodDiscriminator(
            scales=dp.get("scales", 1),
            scale_params=dp.get("scale_discriminator_params"),
            periods=tuple(dp.get("periods", (2, 3, 5, 7, 11))),
            period_params=dp.get("period_discriminator_params"),
        )
        batch = next(iter(self.valid_loader))
        key = self.rng
        rngs = {
            "params": key,
            "dropout": key,
            "reparam": key,
            "noise": key,
        }
        self.gen_variables = init_on_cpu(
            self.model.init,
            rngs,
            text=batch["text"],
            text_lengths=batch["text_lengths"],
            feats=batch["feats"],
            feats_lengths=batch["feats_lengths"],
            duration=batch["duration"],
            pitch=batch["pitch"],
            energy=batch["energy"],
            sids=batch["sids"],
            aids=batch["aids"],
            step=0,
            train=True,
        )
        seg = int(self.conf["models"]["hifigan"].get("segment_size", 64))
        hop = self.conf["audio"]["stft"]["hop_length"]
        self.disc_variables = init_on_cpu(
            self.discriminator.init, key, np.zeros((2, seg * hop, 1), np.float32)
        )

    def __init_loss__(self):
        a = self.conf["audio"]
        warm = bool(self.args.acoustic_checkpoint or self.args.checkpoint)
        if self.version in ("fastspeech2", "adaspeech"):
            loss_conf = dict(self.conf["train"][self.version]["loss"])
            ve = self.conf["models"][self.version]["variance"]["variance_embedding"]
            loss_conf["pitch_feature_level"] = ve["pitch_feature"]
            loss_conf["energy_feature_level"] = ve["energy_feature"]
            if self.version == "fastspeech2":
                from viet_tts_tpu.models.fastspeech2 import FastSpeech2Loss as L
            else:
                from viet_tts_tpu.models.adaspeech import AdaSpeechLoss as L

                loss_conf["phoneme_level_encoder_step"] = self.conf["models"][
                    self.version
                ]["variance"]["reference_encoder"]["phoneme_level_encoder_step"]
            self.criterion = L(loss_conf, is_finetune=warm)
        else:
            from viet_tts_tpu.models.matcha import MatchaTTSLoss

            loss_conf = dict(self.conf["train"]["matcha"]["loss"])
            loss_conf["n_channels"] = a["mel"]["channels"]
            self.criterion = MatchaTTSLoss(loss_conf, is_finetune=warm)

        self.mel_loss = MelSpectrogramLoss(
            fs=a["signal"]["sampling_rate"],
            n_fft=a["stft"]["filter_length"],
            hop_length=a["stft"]["hop_length"],
            win_length=a["stft"]["win_length"],
            window=a["stft"]["window"],
            n_mels=a["mel"]["channels"],
            fmin=a["mel"]["fmin"],
            fmax=a["mel"]["fmax"],
            log_base=a["mel"]["log_base"],
        )

    def __init_optimizer__(self):
        gen_opt = self.conf["train"][self.version]["optimizer"]
        dis_opt = self.conf["train"]["hifigan"]["optimizer"]
        self.base_lr = gen_opt["lr"]
        self.dis_lr = dis_opt["lr"]
        self.gamma = 0.999875

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
            tx=tx(gen_opt),
            batch_stats=self.gen_variables.get("batch_stats", {}),
        )
        self.disc_state = TrainState.create(
            apply_fn=self.discriminator.apply,
            params=self.disc_variables["params"],
            tx=tx(dis_opt),
        )

        # warm start / resume
        if self.args.checkpoint:
            loaded = ckpt.load_checkpoint(
                self.args.checkpoint,
                {
                    "params": jax.device_get(self.state.params),
                    "batch_stats": jax.device_get(self.state.batch_stats),
                    "opt_state": jax.device_get(self.state.opt_state),
                },
            )
            self.state = self.state.replace(
                params=loaded["params"], batch_stats=loaded["batch_stats"]
            )
            log.info("initial training from joint checkpoint")
        elif self.args.acoustic_checkpoint:
            self._warm_start_submodule(
                "text2mel", self.args.acoustic_checkpoint
            )
            if self.args.vocoder_checkpoint:
                self._warm_start_submodule(
                    "mel2wav", self.args.vocoder_checkpoint
                )
            else:
                log.info(
                    "training without pretrained vocoder can make the model "
                    "harder/slower to converge"
                )
        else:
            self.try_resume()
        HiFiGANTrainer.try_resume_discriminator(self)

        hop = self.conf["audio"]["stft"]["hop_length"]
        self.train_step, (self.state, self.disc_state) = jit_train_step(
            self.conf,
            self.mesh,
            make_joint_train_step(
                self.model,
                self.discriminator,
                self.mel_loss,
                self.criterion,
                self.version,
                hop,
            ),
            [self.state, self.disc_state],
        )

    def _warm_start_submodule(self, name: str, path: str):
        """Tolerant transfer of a pretrained sub-model (`joint_trainer.py:174-182`)."""
        from viet_tts_tpu.infer.api import load_params, resolve_checkpoint

        payload = load_params(resolve_checkpoint(path)).get("params", {})
        params = jax.device_get(self.state.params)
        merged, skipped = ckpt.apply_weights(params[name], payload)
        params = dict(params)
        params[name] = merged
        self.state = self.state.replace(params=params)
        log.info(f"loaded checkpoint for {name} from {path} ({len(skipped)} skipped)")

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
            self.disc_state, exponential_lr(self.dis_lr, self.gamma, self.epoch + 1)
        )
        # lightweight validation: mel loss over vocoded segments
        total, n = 0.0, 0
        hop = self.conf["audio"]["stft"]["hop_length"]
        seg = int(self.conf["models"]["hifigan"].get("segment_size", 64))
        for batch in self.valid_loader:
            batch = self._device_batch(batch)
            variables = {"params": self.state.params}
            if self.state.batch_stats:
                variables["batch_stats"] = self.state.batch_stats
            (y_pred, _, start_idxs), _ = self.model.apply(
                variables,
                text=batch["text"],
                text_lengths=batch["text_lengths"],
                feats=batch["feats"],
                feats_lengths=batch["feats_lengths"],
                duration=batch["duration"],
                pitch=batch["pitch"],
                energy=batch["energy"],
                sids=batch["sids"],
                aids=batch["aids"],
                step=self.state.step,
                train=False,
                rngs={"noise": self.rng},
                mutable=["batch_stats"],
            )
            speech_seg = jnp.swapaxes(
                get_segments(
                    batch["speech"][:, None, :], start_idxs * hop, seg * hop
                ),
                1,
                2,
            )
            total += float(self.mel_loss(y_pred[0], speech_seg))
            n += 1
        val = {"mel": total / max(n, 1)}
        self.valid_logger.log(val, self.iter)
        self._report_validation(val)


class JointFinetuner(JointTrainer):
    """Speaker adaptation via embedding surgery (`joint_finetuner.py`)."""

    threshold_epoch = 50

    def __init_parameter__(self):
        assert self.args.checkpoint is not None, (
            "Adapter VoiceAI Task must have a pre-trained model checkpoint"
        )
        ckpt_dir = os.path.dirname(self.args.checkpoint)
        with open(os.path.join(ckpt_dir, "speakers.json"), encoding="utf8") as f:
            self.src_speakers = json.load(f)
        if self.src_speakers == self.speakers:
            raise NotImplementedError(
                "=> Speakers is still same! Training is not effective.."
            )
        self.adapter_speakers = [
            s for s in self.speakers if s not in self.src_speakers
        ]
        src_acc_path = os.path.join(ckpt_dir, "accents.json")
        self.src_accents = (
            json.load(open(src_acc_path, encoding="utf8"))
            if os.path.exists(src_acc_path)
            else self.accents
        )
        self._base_checkpoint = self.args.checkpoint
        self.args.checkpoint = None  # surgery replaces direct loading

    @staticmethod
    def _get_node(tree, keys):
        for k in keys:
            tree = tree[k]
        return tree

    def _surgery(self, params, payload, layer: str, src_table, tgt_table):
        """Copy overlapping embedding rows, random-init new ones
        (`joint_finetuner.py:33-57`). Tables live under
        text2mel/speaker_emb/cvae/<layer>/embedding."""
        try:
            old = np.asarray(
                self._get_node(
                    payload, ["text2mel", "speaker_emb", "cvae", layer, "embedding"]
                )
            )
            tgt = self._get_node(params, ["text2mel", "speaker_emb", "cvae", layer])
        except (KeyError, TypeError):
            log.warning(f"could not perform {layer} surgery (layout mismatch)")
            return
        new = np.array(
            jax.random.uniform(self.rng, (len(tgt_table), old.shape[1]))
        )  # np.array: jax arrays are read-only views under np.asarray
        for name, idx in src_table.items():
            if name in tgt_table:
                new[tgt_table[name]] = old[idx]
        tgt["embedding"] = jnp.asarray(new)

    def __init_optimizer__(self):
        super().__init_optimizer__()
        # surgery: warm-start everything, then rebuild embedding tables
        from viet_tts_tpu.infer.api import load_params

        payload = load_params(self._base_checkpoint).get("params", {})
        params = jax.device_get(self.state.params)
        merged, _ = ckpt.apply_weights(params, payload)
        params = jax.tree_util.tree_map(np.asarray, merged)

        self._surgery(
            params, payload, "embedding_layer_spk", self.src_speakers, self.speakers
        )
        log.info(
            f"re-initialised speaker embeddings for: {', '.join(self.adapter_speakers)}"
        )
        if self.src_accents != self.accents and self.accents:
            self._surgery(
                params, payload, "embedding_layer_acc", self.src_accents, self.accents
            )

        self.state = self.state.replace(params=params)
        # persist as the epoch-0 checkpoint like the reference
        self.save_model()

    def __init_dataset__(self):
        super().__init_dataset__()
        self.all_train_loader = self.train_loader
        adapter_set = [
            row for row in self.train_set if row[1] in getattr(self, "adapter_speakers", [])
        ]
        if adapter_set:
            adapter_data = self._make_dataset(adapter_set, self.stats)
            self.adapter_train_loader = BucketBatcher(
                adapter_data,
                self.conf["train"]["batch_size"],
                seed=self.conf["train"]["seed"],
                collate_fn=self._collate_with_speech,
            )
        else:
            self.adapter_train_loader = self.train_loader

    def train_one_epoch(self):
        self.train_loader = (
            self.all_train_loader
            if self.epoch >= self.threshold_epoch
            else self.adapter_train_loader
        )
        super().train_one_epoch()

    def valid_one_epoch(self):
        if self.epoch >= self.threshold_epoch:
            super().valid_one_epoch()
        else:
            self.state = set_learning_rate(
                self.state, exponential_lr(self.base_lr, self.gamma, self.epoch + 1)
            )
