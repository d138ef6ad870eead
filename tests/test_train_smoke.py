"""End-to-end training smoke test: synthetic wavs -> filelist -> feature
cache -> bucketed batches -> jitted FS2 train steps -> checkpoint/resume."""

import argparse
import os

import numpy as np
import pytest

from viet_tts_tpu.config import build_config

from tests.synth_data import build_dataset, tiny_model_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("fs2_smoke"))


def make_args(workdir, data_dir, egs_dir, max_iter=4):
    return argparse.Namespace(
        task="fastspeech2",
        input_folder=egs_dir,
        data_folder=data_dir,
        output_folder=os.path.join(workdir, "out"),
        checkpoint=None,
        acoustic_checkpoint=None,
        vocoder_checkpoint=None,
        version="fastspeech2",
        max_iter=max_iter,
        is_finetune=False,
    )


def test_fs2_end_to_end_train(workdir):
    from viet_tts_tpu.train.trainer import FastSpeech2Trainer

    data_dir, egs_dir = build_dataset(workdir, n_utts=6)
    conf = tiny_model_config(build_config(os.path.join(REPO, "config")))
    conf["train"]["batch_size"] = 4
    args = make_args(workdir, data_dir, egs_dir, max_iter=3)

    trainer = FastSpeech2Trainer(args, conf)
    assert len(trainer.train_set) > 0
    trainer.run()
    assert trainer.iter >= 3

    # artifacts: checkpoint + sidecars + feature cache
    out = args.output_folder
    ckpts = [f for f in os.listdir(out) if f.endswith(".msgpack")]
    assert len(ckpts) >= 1
    for sidecar in ("config.yaml", "speakers.json", "accents.json", "stats.json"):
        assert os.path.exists(os.path.join(out, sidecar)), sidecar
    spk_dir = os.path.join(data_dir, "hn_spk")
    for sub in ("feats", "pitch", "energy", "alignment"):
        assert os.listdir(os.path.join(spk_dir, sub))

    # resume: a fresh trainer picks up epoch/iter from the checkpoint scan
    args2 = make_args(workdir, data_dir, egs_dir, max_iter=5)
    trainer2 = FastSpeech2Trainer(args2, conf)
    assert trainer2.iter >= 3
    trainer2.run()
    assert trainer2.iter >= 5


def test_bucket_batcher_static_shapes(workdir):
    from viet_tts_tpu.data.batching import BucketBatcher
    from viet_tts_tpu.data.dataset import AcousticDataset
    from viet_tts_tpu.data.filelist import read_filelist
    from viet_tts_tpu.config import derive_task_config

    data_dir, egs_dir = build_dataset(workdir, n_utts=6)
    conf = derive_task_config(
        build_config(os.path.join(REPO, "config")), "fastspeech2"
    )
    if not os.path.exists(os.path.join(egs_dir, "train.txt")):
        from viet_tts_tpu.data.filelist import create_filelist

        create_filelist(
            data_dir, {"hn_spk": 0, "hcm_spk": 1}, egs_dir, seed=0
        )
    train = read_filelist(os.path.join(egs_dir, "train.txt"))
    ds = AcousticDataset(
        train, conf["audio"], {"hn_spk": 0, "hcm_spk": 1}, {"hn": 0, "hcm": 1}
    )
    shapes = set()
    for batch in BucketBatcher(ds, 4, seed=0):
        shapes.add((batch["text"].shape, batch["feats"].shape))
        assert batch["text"].shape[0] == 4  # always full batch
        assert batch["feats"].shape[1] in (128, 256, 384, 512, 640, 768, 896, 1008)
    assert len(shapes) <= 4  # few compile shapes


def test_apply_init_scheme():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from viet_tts_tpu.train.state import apply_init_scheme

    params = {
        "enc": {
            "dense": {"kernel": jnp.ones((8, 16)), "bias": jnp.ones((16,))},
            "norm": {"scale": jnp.full((16,), 2.0)},
        },
        "embed_tokens": {"embedding": jnp.full((10, 8), 3.0)},
    }
    out = apply_init_scheme(params, "xavier_uniform", jax.random.PRNGKey(0))
    k = np.asarray(out["enc"]["dense"]["kernel"])
    assert not np.allclose(k, 1.0)  # re-drawn
    bound = np.sqrt(6.0 / (8 + 16))
    assert np.abs(k).max() <= bound + 1e-6  # xavier-uniform range
    assert np.all(np.asarray(out["enc"]["dense"]["bias"]) == 0.0)
    # embeddings and norm scales untouched
    assert np.all(np.asarray(out["embed_tokens"]["embedding"]) == 3.0)
    assert np.all(np.asarray(out["enc"]["norm"]["scale"]) == 2.0)
    # pytorch scheme is identity
    same = apply_init_scheme(params, "pytorch", jax.random.PRNGKey(0))
    assert np.all(np.asarray(same["enc"]["dense"]["kernel"]) == 1.0)
    import pytest

    with pytest.raises(ValueError):
        apply_init_scheme(params, "bogus", jax.random.PRNGKey(0))


def test_preemption_sigterm_checkpoints_and_resumes(workdir):
    """SIGTERM mid-training (the TPU-pod preemption notice) writes one
    last checkpoint and run() exits cleanly; resume-by-scan picks it up.
    The real signal handler is exercised via os.kill on our own pid."""
    import signal
    import time

    from viet_tts_tpu.train import checkpoint as ckpt
    from viet_tts_tpu.train.trainer import FastSpeech2Trainer

    data_dir, egs_dir = build_dataset(
        os.path.join(workdir, "preempt"), n_utts=4
    )
    conf = tiny_model_config(build_config(os.path.join(REPO, "config")))
    conf["train"]["batch_size"] = 4
    args = make_args(
        os.path.join(workdir, "preempt"), data_dir, egs_dir, max_iter=10**6
    )
    trainer = FastSpeech2Trainer(args, conf)

    def preempted_epoch():
        trainer.iter += 7  # simulate progress before the notice lands
        os.kill(os.getpid(), signal.SIGTERM)
        time.sleep(10)  # never completes: the handler raises Preempted
        raise AssertionError("signal not delivered")

    trainer.train_one_epoch = preempted_epoch
    before_run = signal.getsignal(signal.SIGTERM)
    trainer.run()  # returns (no unhandled signal / exception)
    # the preemption handler must not leak past run() into the embedding
    # process (a later SIGTERM would raise Preempted in unrelated code)
    assert signal.getsignal(signal.SIGTERM) is before_run
    path = ckpt.scan_checkpoint(args.output_folder, trainer.ckpt_prefix)
    assert path is not None
    _, it = ckpt.parse_checkpoint_name(path)
    assert it == trainer.iter

    # resume-by-scan restores the preemption checkpoint's progress
    args2 = make_args(
        os.path.join(workdir, "preempt"), data_dir, egs_dir, max_iter=10**6
    )
    trainer2 = FastSpeech2Trainer(args2, conf)
    assert trainer2.iter == trainer.iter
