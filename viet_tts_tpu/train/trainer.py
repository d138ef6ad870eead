"""Host-side training loops.

Template parity with the reference trainer lifecycle
(`src/trainer/base.py`): speakers/accents loading, filelist auto-creation,
dataset -> model -> loss -> optimizer init hooks, epoch loop until
``max_iter``, per-epoch validation with the coloured delta report,
save/resume with sidecar metadata. The compute per step is one jitted,
mesh-sharded function; the host only feeds bucketed batches.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Dict, Optional

import jax
import numpy as np

from viet_tts_tpu.config import derive_task_config
from viet_tts_tpu.data.batching import BucketBatcher
from viet_tts_tpu.data.dataset import AcousticDataset, load_stats, save_stats
from viet_tts_tpu.data.filelist import (
    create_filelist,
    create_unknown_filelist,
    read_filelist,
)
from viet_tts_tpu.parallel.mesh import (
    make_hybrid_mesh,
    pad_batch_to_devices,
    shard_batch,
)
from viet_tts_tpu.text import NUM_SYMBOLS
from viet_tts_tpu.train import checkpoint as ckpt
from viet_tts_tpu.train.state import (
    TrainState,
    adamw_with_clip,
    exponential_lr,
    init_on_cpu,
    set_learning_rate,
)
from viet_tts_tpu.utils.logging import StepTimer, TensorLogger, text_colors

log = logging.getLogger("viet_tts_tpu")


def jit_train_step(conf, mesh, step_fn, states):
    """jit a train step whose leading args/outputs are the given
    TrainStates (then batch/rng..., then a metrics dict output).

    Under ``train.zero1`` (optimizer moments sharded over ``data``; ZeRO-1)
    or ``train.fsdp`` (params AND moments sharded; ZeRO-3) on a
    multi-device mesh, places every state accordingly and pins the output
    layout so donated updates keep it. Returns
    ``(jitted_step, placed_states)``.
    """
    n = len(states)
    donate = tuple(range(n))
    fsdp = conf["train"].get("fsdp", False)
    zero1 = conf["train"].get("zero1", False)
    if not ((fsdp or zero1) and mesh.devices.size > 1):
        return jax.jit(step_fn, donate_argnums=donate), list(states)
    from viet_tts_tpu.parallel.mesh import shard_state_fsdp, shard_state_zero1

    place = shard_state_fsdp if fsdp else shard_state_zero1
    placed, shardings = [], []
    for s in states:
        p, sh = place(mesh, s)
        placed.append(p)
        shardings.append(sh)
    fn = jax.jit(
        step_fn, donate_argnums=donate, out_shardings=(*shardings, None)
    )
    return fn, placed


class Preempted(BaseException):
    """Raised by the SIGTERM handler (preemption notice). Derives from
    BaseException so ordinary `except Exception` guards in step code can't
    swallow the shutdown request."""
logging.basicConfig(level=logging.INFO, format="%(asctime)s | %(message)s")


class BaseTrainer:
    """Shared lifecycle; subclasses implement the __init_*__ hooks."""

    task: str = "base"
    ckpt_prefix: str = "generator"

    def __init__(self, args, conf: Dict[str, Any]):
        self.args = args
        self.conf = derive_task_config(conf, self.task, getattr(args, "version", None))
        self.n_symbols = NUM_SYMBOLS

        inp = args.input_folder
        self.speakers = self._load_json(os.path.join(inp, "speakers.json"))
        self.accents = self._load_json(os.path.join(inp, "accents.json"))

        if not os.path.isfile(os.path.join(inp, "train.txt")):
            if self.speakers is None:
                create_unknown_filelist(args.data_folder, inp)
            else:
                create_filelist(args.data_folder, self.speakers, inp)
        self.train_set = read_filelist(os.path.join(inp, "train.txt"))
        self.test_set = read_filelist(os.path.join(inp, "test.txt"))

        # hybrid-aware: on a multi-slice pod the data axis spans DCN x ICI
        # (make_hybrid_mesh); single-slice hosts get the plain ICI mesh.
        self.mesh = make_hybrid_mesh()
        self.epoch, self.iter = 0, 0
        self.rng = jax.random.PRNGKey(self.conf["train"]["seed"])

        self.__init_parameter__()
        self.__init_dataset__()
        self.__init_model__()
        self.__init_loss__()
        self.__init_optimizer__()

        n_params = sum(
            x.size for x in jax.tree_util.tree_leaves(self.state.params)
        )
        log.info("=" * 70)
        log.info(f" ---> Number of Model Parameters: {n_params}")
        log.info(f" ---> Number of devices in mesh: {len(jax.devices())}")
        log.info(f" ---> Total train samples: {len(self.train_set)}")
        log.info(f" ---> Total valid samples: {len(self.test_set)}")
        log.info(f" ---> Batch size in total: {self.conf['train']['batch_size']}")
        log.info("=" * 70)

        os.makedirs(args.output_folder, exist_ok=True)
        self.train_logger = TensorLogger(
            os.path.join(args.output_folder, "log/train"), "train"
        )
        self.valid_logger = TensorLogger(
            os.path.join(args.output_folder, "log/valid"), "valid"
        )
        self.save_information()
        self.best_val_loss: Optional[Dict[str, float]] = None
        self.timer = StepTimer()

    # -- hooks ----------------------------------------------------------
    def __init_parameter__(self):
        pass

    def __init_dataset__(self):
        raise NotImplementedError

    def __init_model__(self):
        raise NotImplementedError

    def __init_loss__(self):
        raise NotImplementedError

    def __init_optimizer__(self):
        raise NotImplementedError

    # -- helpers --------------------------------------------------------
    @staticmethod
    def _load_json(path):
        if os.path.exists(path):
            with open(path, "r", encoding="utf8") as f:
                return json.load(f)
        return None

    def _device_batch(self, batch):
        batch = pad_batch_to_devices(batch, len(self.mesh.devices.flat))
        return shard_batch(self.mesh, batch)

    def save_information(self):
        ckpt.save_information(
            self.args.output_folder,
            self.conf,
            self.speakers,
            self.accents,
            getattr(self, "stats", None),
        )

    def save_model(self):
        payload = {
            "params": jax.device_get(self.state.params),
            "batch_stats": jax.device_get(self.state.batch_stats),
            "opt_state": jax.device_get(self.state.opt_state),
        }
        path = ckpt.save_checkpoint(
            self.args.output_folder, self.ckpt_prefix, self.epoch, self.iter, payload
        )
        log.info(f"saved checkpoint: {path}")

    def try_resume(self):
        path = self.args.checkpoint or ckpt.scan_checkpoint(
            self.args.output_folder, self.ckpt_prefix
        )
        if path is None:
            return
        target = {
            "params": jax.device_get(self.state.params),
            "batch_stats": jax.device_get(self.state.batch_stats),
            "opt_state": jax.device_get(self.state.opt_state),
        }
        loaded = ckpt.load_checkpoint(path, target)
        self.state = self.state.replace(
            params=loaded["params"],
            batch_stats=loaded["batch_stats"],
            opt_state=loaded["opt_state"],
        )
        self.epoch, self.iter = ckpt.parse_checkpoint_name(path)
        self.state = self.state.replace(step=self.iter)
        log.info(f"resumed from {path} (epoch {self.epoch}, iter {self.iter})")

    # -- loop -----------------------------------------------------------
    def _install_preemption_handler(self):
        """SIGTERM (the TPU-pod / batch-scheduler preemption signal) raises
        `Preempted` between Python bytecodes — i.e. between train steps on
        the host side, never mid-rebind — so `run()` can write one last
        checkpoint inside the grace window and exit cleanly. The reference
        has no preemption story (SURVEY §5.3); resume-by-scan picks the
        preemption checkpoint up on restart."""
        import signal

        def _raise(signum, frame):
            raise Preempted()

        try:
            self._prev_sigterm = signal.signal(signal.SIGTERM, _raise)
            self._sigterm_installed = True
        except ValueError:  # not the main thread (e.g. under a test runner)
            self._prev_sigterm = None
            self._sigterm_installed = False

    def _restore_preemption_handler(self):
        """Put the pre-`run()` SIGTERM disposition back so the handler does
        not outlive training in an embedding process (servers, notebooks,
        test runners)."""
        import signal

        if not getattr(self, "_sigterm_installed", False):
            return
        self._sigterm_installed = False
        try:
            signal.signal(signal.SIGTERM, self._prev_sigterm)
        except (ValueError, TypeError):
            pass

    def run(self):
        log.info(f"{self.task}: start training on {jax.devices()[0].platform}")
        self._install_preemption_handler()
        try:
            if getattr(self.args, "profile", False):
                from viet_tts_tpu.utils.profiling import trace

                with trace(os.path.join(self.args.output_folder, "log/profile")):
                    self.train_one_epoch()
                log.info("profiler trace written to log/profile")
            try:
                while self.iter < self.args.max_iter:
                    t0 = time.time()
                    self.train_one_epoch()
                    self.valid_one_epoch()
                    self._log_histograms()
                    self.save_model()
                    log.info(
                        f"Epoch {self.epoch} done in {time.time() - t0:.1f}s "
                        f"(iter {self.iter}/{self.args.max_iter})"
                    )
                    self.epoch += 1
            except Preempted:
                log.info(
                    f"SIGTERM at epoch {self.epoch} iter {self.iter}: writing "
                    "preemption checkpoint"
                )
                self.save_model()
                log.info("preemption checkpoint saved; exiting cleanly")
                return
            log.info("training complete")
        finally:
            self._restore_preemption_handler()

    def _log_histograms(self):
        state = getattr(self, "state", None) or getattr(self, "gen_state", None)
        logger = getattr(self, "valid_logger", None)
        if state is None or logger is None:
            return
        try:
            logger.log_histograms(state.params, self.iter)
        except Exception as exc:  # histograms are best-effort observability
            log.warning(f"histogram logging failed: {exc}")

    def train_one_epoch(self):
        raise NotImplementedError

    def valid_one_epoch(self):
        raise NotImplementedError

    def _report_validation(self, val_loss: Dict[str, float]):
        msgs, improved = [], 0
        tracked = 0
        for k, v in val_loss.items():
            if v == 0:
                improved += 1
                continue
            tracked += 1
            if self.best_val_loss and k in self.best_val_loss and self.best_val_loss[k]:
                diff = (v - self.best_val_loss[k]) / self.best_val_loss[k]
            else:
                diff = -1.0
            if diff <= 0:
                improved += 1
                msgs.append(
                    f"{k}-loss {text_colors.OKGREEN}{v:.4f} (↓ {abs(diff)*100:.2f}%){text_colors.ENDC}"
                )
            else:
                msgs.append(
                    f"{k}-loss {text_colors.FAIL}{v:.4f} (↑ {abs(diff)*100:.2f}%){text_colors.ENDC}"
                )
        if improved == len(val_loss):
            self.best_val_loss = dict(val_loss)
        log.info(f"Epoch {self.epoch}: {' - '.join(msgs)}")


class FastSpeech2Trainer(BaseTrainer):
    """Acoustic-only training (`src/trainer/fastspeech2_trainer.py`)."""

    task = "fastspeech2"

    def model_class(self):
        from viet_tts_tpu.models.fastspeech2 import FastSpeech2

        return FastSpeech2

    def __init_dataset__(self):
        audio_conf = self.conf["audio"]
        stats_path = os.path.join(self.args.output_folder, "stats.json")
        stats = load_stats(stats_path) if os.path.exists(stats_path) else None
        self.train_data = AcousticDataset(
            self.train_set, audio_conf, self.speakers, self.accents, stats=stats
        )
        self.stats = self.train_data.stats
        os.makedirs(self.args.output_folder, exist_ok=True)
        if not os.path.exists(stats_path):
            save_stats(self.stats, stats_path)
        self.valid_data = AcousticDataset(
            self.test_set, audio_conf, self.speakers, self.accents, stats=self.stats
        )
        bs = self.conf["train"]["batch_size"]
        seed = self.conf["train"]["seed"]
        self.train_loader = BucketBatcher(self.train_data, bs, seed=seed)
        self.valid_loader = BucketBatcher(self.valid_data, bs, seed=seed)

    def __init_model__(self):
        hp = self.conf["models"][self.task]
        model_cls = self.model_class()
        self.model = model_cls(
            n_symbols=self.n_symbols,
            n_channels=self.conf["audio"]["mel"]["channels"],
            hparams=hp,
            stats=self.stats,
            n_speakers=len(self.speakers) if self.speakers else 1,
            n_accents=len(self.accents) if self.accents else 2,
        )
        batch = next(iter(self.valid_loader))
        init_rng = {"params": self.rng, "dropout": self.rng, "reparam": self.rng}
        self.variables = init_on_cpu(
            self.model.init,
            init_rng,
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

    def __init_loss__(self):
        from viet_tts_tpu.models.fastspeech2 import FastSpeech2Loss

        loss_conf = dict(self.conf["train"][self.task]["loss"])
        ve = self.conf["models"][self.task]["variance"]["variance_embedding"]
        loss_conf["pitch_feature_level"] = ve["pitch_feature"]
        loss_conf["energy_feature_level"] = ve["energy_feature"]
        self.criterion = FastSpeech2Loss(
            loss_conf, is_finetune=getattr(self.args, "is_finetune", False)
        )

    def __init_optimizer__(self):
        from viet_tts_tpu.train.steps import make_fs2_train_step, make_fs2_valid_step

        opt = self.conf["train"][self.task]["optimizer"]
        self.base_lr = opt["lr"]
        self.gamma = self.conf["train"][self.task].get("scheduler", {}).get(
            "gamma", 0.999875
        )
        tx = adamw_with_clip(
            self.base_lr,
            betas=tuple(opt.get("betas", (0.8, 0.99))),
            eps=opt.get("eps", 1e-9),
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
        step_fn = make_fs2_train_step(
            self.model,
            self.criterion,
            mixed_precision=bool(
                self.conf["train"].get("mixed_precision", False)
            ),
            grad_accum=int(self.conf["train"].get("grad_accum", 1)),
        )
        self.train_step, (self.state,) = jit_train_step(
            self.conf, self.mesh, step_fn, [self.state]
        )
        self.valid_step = jax.jit(make_fs2_valid_step(self.model, self.criterion))

    def train_one_epoch(self):
        log_step = self.conf["train"]["log_step"]
        for batch in self.train_loader:
            batch = self._device_batch(batch)
            self.state, metrics = self.train_step(self.state, batch, self.rng)
            if self.iter % log_step == 0:
                host = {k: float(v) for k, v in metrics.items()}
                lr = float(self.state.opt_state.hyperparams["learning_rate"])
                self.train_logger.log(host, self.iter, lr=lr)
                sps = self.timer.steps_per_sec
                log.info(
                    f"iter {self.iter} | "
                    + " ".join(f"{k}={v:.3f}" for k, v in host.items())
                    + (f" | {sps:.2f} it/s" if sps else "")
                )
            self.timer.tick()
            self.iter += 1
            if self.iter >= self.args.max_iter:
                break

    def valid_one_epoch(self):
        # per-epoch LR decay, like ExponentialLR.step() each epoch
        self.state = set_learning_rate(
            self.state, exponential_lr(self.base_lr, self.gamma, self.epoch + 1)
        )
        val, n = {"feat": 0.0, "feat_postnet": 0.0}, 0
        for batch in self.valid_loader:
            batch = self._device_batch(batch)
            losses = self.valid_step(self.state, batch)
            val["feat"] += float(losses["feat"])
            if "feat_postnet" in losses:
                val["feat_postnet"] += float(losses["feat_postnet"])
            n += 1
        val = {k: v / max(n, 1) for k, v in val.items()}
        self.valid_logger.log(val, self.iter)
        self._report_validation(val)


class AdaSpeechTrainer(FastSpeech2Trainer):
    """Same skeleton, AdaSpeech model (`src/trainer/adaspeech_trainer.py`)."""

    task = "adaspeech"

    def model_class(self):
        from viet_tts_tpu.models.adaspeech import AdaSpeech

        return AdaSpeech

    def __init_loss__(self):
        from viet_tts_tpu.models.adaspeech import AdaSpeechLoss

        loss_conf = dict(self.conf["train"][self.task]["loss"])
        var = self.conf["models"][self.task]["variance"]
        ve = var["variance_embedding"]
        loss_conf["pitch_feature_level"] = ve["pitch_feature"]
        loss_conf["energy_feature_level"] = ve["energy_feature"]
        loss_conf["phoneme_level_encoder_step"] = var["reference_encoder"][
            "phoneme_level_encoder_step"
        ]
        self.criterion = AdaSpeechLoss(
            loss_conf, is_finetune=getattr(self.args, "is_finetune", False)
        )
