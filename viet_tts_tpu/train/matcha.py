"""Matcha-TTS trainer (`src/trainer/matcha_trainer.py`).

Dataset = acoustic dataset with global mel MVN (the MatchaLoader's
mel_mean/mel_std statistics, `matcha_loader.py:37-53`); mel buckets are
already multiples of 4 so the UNet's fix_len_compatibility holds.
Validation tracks diff/prior (`matcha_trainer.py:146-156`).
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import numpy as np

from viet_tts_tpu.data.batching import BucketBatcher
from viet_tts_tpu.data.dataset import AcousticDataset, load_stats, save_stats
from viet_tts_tpu.train.state import (
    TrainState,
    adamw_with_clip,
    exponential_lr,
    init_on_cpu,
    set_learning_rate,
)
from viet_tts_tpu.train.trainer import BaseTrainer, jit_train_step, log


class MelNormalizedDataset:
    """Wraps AcousticDataset, applying global mel MVN to feats."""

    def __init__(self, base: AcousticDataset, mel_mean: float, mel_std: float):
        self.base = base
        self.mel_mean = mel_mean
        self.mel_std = mel_std
        self.inputs = base.inputs

    def __len__(self):
        return len(self.base)

    def __getitem__(self, i):
        item = self.base[i]
        item["feat"] = (item["feat"] - self.mel_mean) / self.mel_std
        return item


def compute_mel_stats(dataset: AcousticDataset) -> Dict[str, float]:
    """Global scalar mel mean/std over the whole dataset
    (`matcha_loader.py:37-53`)."""
    total, sq, n = 0.0, 0.0, 0
    for i in range(len(dataset)):
        feat = dataset[i]["feat"].astype(np.float64)
        total += feat.sum()
        sq += (feat**2).sum()
        n += feat.size
    mean = total / max(n, 1)
    std = float(np.sqrt(max(sq / max(n, 1) - mean * mean, 1e-20)))
    return {"mel_mean": float(mean), "mel_std": std}


def make_matcha_train_step(model, criterion):
    def train_step(state: TrainState, batch, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        rngs = {
            "dropout": step_rng,
            "reparam": jax.random.fold_in(step_rng, 1),
            "noise": jax.random.fold_in(step_rng, 2),
        }

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            preds, mut = model.apply(
                variables,
                text=batch["text"],
                text_lengths=batch["text_lengths"],
                feats=batch["feats"],
                feats_lengths=batch["feats_lengths"],
                sids=batch["sids"],
                aids=batch["aids"],
                duration=batch["duration"],
                step=state.step,
                train=True,
                rngs=rngs,
                mutable=["batch_stats"],
            )
            losses = criterion(
                preds, (batch["feats"], batch["text_lengths"]), step=state.step
            )
            total = sum(losses.values())
            return total, (losses, mut)

        (tot, (losses, mut)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(
            grads=grads, batch_stats=mut.get("batch_stats", state.batch_stats)
        )
        metrics = dict(losses)
        metrics["total"] = tot
        return state, metrics

    return train_step


def make_matcha_valid_step(model, criterion):
    def valid_step(state: TrainState, batch, rng):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        preds, _ = model.apply(
            variables,
            text=batch["text"],
            text_lengths=batch["text_lengths"],
            feats=batch["feats"],
            feats_lengths=batch["feats_lengths"],
            sids=batch["sids"],
            aids=batch["aids"],
            duration=batch["duration"],
            step=state.step,
            train=False,
            rngs={"noise": rng},
            mutable=["batch_stats"],
        )
        return criterion(preds, (batch["feats"], batch["text_lengths"]), step=None)

    return valid_step


class MatchaTrainer(BaseTrainer):
    task = "matcha"

    def __init_dataset__(self):
        audio_conf = self.conf["audio"]
        stats_path = os.path.join(self.args.output_folder, "stats.json")
        base_train = AcousticDataset(
            self.train_set,
            audio_conf,
            self.speakers,
            self.accents,
            stats={"pitch": {"mean": 0, "std": 1}, "energy": {"mean": 0, "std": 1}},
        )
        if os.path.exists(stats_path):
            self.stats = load_stats(stats_path)
        else:
            self.stats = compute_mel_stats(base_train)
            os.makedirs(self.args.output_folder, exist_ok=True)
            save_stats(self.stats, stats_path)
        base_valid = AcousticDataset(
            self.test_set,
            audio_conf,
            self.speakers,
            self.accents,
            stats={"pitch": {"mean": 0, "std": 1}, "energy": {"mean": 0, "std": 1}},
        )
        self.train_data = MelNormalizedDataset(
            base_train, self.stats["mel_mean"], self.stats["mel_std"]
        )
        self.valid_data = MelNormalizedDataset(
            base_valid, self.stats["mel_mean"], self.stats["mel_std"]
        )
        bs = self.conf["train"]["batch_size"]
        seed = self.conf["train"]["seed"]
        self.train_loader = BucketBatcher(self.train_data, bs, seed=seed)
        self.valid_loader = BucketBatcher(self.valid_data, bs, seed=seed)

    def __init_model__(self):
        from viet_tts_tpu.models.matcha import MatchaTTS

        self.model = MatchaTTS(
            n_symbols=self.n_symbols,
            n_channels=self.conf["audio"]["mel"]["channels"],
            hparams=self.conf["models"]["matcha"],
            stats=self.stats,
            n_speakers=len(self.speakers) if self.speakers else 1,
            n_accents=len(self.accents) if self.accents else 2,
        )
        batch = next(iter(self.valid_loader))
        key = self.rng
        rngs = {
            "params": key,
            "dropout": key,
            "reparam": key,
            "noise": key,
        }
        self.variables = init_on_cpu(
            self.model.init,
            rngs,
            text=batch["text"],
            text_lengths=batch["text_lengths"],
            feats=batch["feats"],
            feats_lengths=batch["feats_lengths"],
            sids=batch["sids"],
            aids=batch["aids"],
            duration=batch["duration"],
            step=0,
            train=True,
        )

    def __init_loss__(self):
        from viet_tts_tpu.models.matcha import MatchaTTSLoss

        loss_conf = dict(self.conf["train"]["matcha"]["loss"])
        loss_conf["n_channels"] = self.conf["audio"]["mel"]["channels"]
        self.criterion = MatchaTTSLoss(
            loss_conf, is_finetune=getattr(self.args, "is_finetune", False)
        )

    def __init_optimizer__(self):
        opt = self.conf["train"]["matcha"]["optimizer"]
        self.base_lr = opt["lr"]
        self.gamma = self.conf["train"]["matcha"].get("scheduler", {}).get("gamma", 1.0)
        tx = adamw_with_clip(
            self.base_lr,
            betas=tuple(opt.get("betas", (0.9, 0.999))),
            eps=opt.get("eps", 1e-8),
            weight_decay=opt.get("weight_decay", 0.0),
            grad_clip=self.conf["train"]["grad_clip_thresh"],
        )
        self.state = TrainState.create(
            apply_fn=self.model.apply,
            params=self.variables["params"],
            tx=tx,
            batch_stats=self.variables.get("batch_stats", {}),
        )
        self.try_resume()
        self.train_step, (self.state,) = jit_train_step(
            self.conf,
            self.mesh,
            make_matcha_train_step(self.model, self.criterion),
            [self.state],
        )
        self.valid_step = jax.jit(make_matcha_valid_step(self.model, self.criterion))

    def train_one_epoch(self):
        log_step = self.conf["train"]["log_step"]
        for batch in self.train_loader:
            batch = self._device_batch(batch)
            self.state, metrics = self.train_step(self.state, batch, self.rng)
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
        val, n = {"diff": 0.0, "prior": 0.0}, 0
        for batch in self.valid_loader:
            batch = self._device_batch(batch)
            losses = self.valid_step(self.state, batch, self.rng)
            val["diff"] += float(losses["diff"])
            val["prior"] += float(losses["prior"])
            n += 1
        val = {k: v / max(n, 1) for k, v in val.items()}
        self.valid_logger.log(val, self.iter)
        self._report_validation(val)
