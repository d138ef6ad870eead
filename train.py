"""Training CLI — task dispatch compatible with the reference's train.py.

    python train.py --task fastspeech2 -i egs/dir -d data/dir -o out/dir
"""

from __future__ import annotations

import argparse
import random

import numpy as np

from viet_tts_tpu.config import build_config

TASKS = ["text2wav", "fastspeech2", "adaspeech", "jets", "vits2", "matcha", "hifigan"]


def build_arguments():
    parser = argparse.ArgumentParser()
    parser.add_argument("--task", default="text2wav", choices=TASKS,
                        help="task trainer, (default: %(default)s)")
    parser.add_argument("-i", "--input_folder", type=str, required=True,
                        help="directory holding filelists + speakers/accents json")
    parser.add_argument("-d", "--data_folder", type=str, required=True,
                        help="directory holding the dataset")
    parser.add_argument("-o", "--output_folder", type=str, required=True,
                        help="directory for checkpoints/logs")
    parser.add_argument("-c", "--checkpoint", type=str, default=None,
                        help="path to a joint pretrained checkpoint")
    parser.add_argument("-a", "--acoustic_checkpoint", type=str, default=None,
                        help="path to an acoustic pretrained checkpoint")
    parser.add_argument("-v", "--vocoder_checkpoint", type=str, default=None,
                        help="path to a vocoder pretrained checkpoint")
    parser.add_argument("--version", type=str, default="fastspeech2",
                        choices=["fastspeech2", "matcha", "adaspeech"],
                        help="acoustic model family for text2wav")
    parser.add_argument("--config", type=str, default="config/",
                        help="config directory (3-yaml layout)")
    parser.add_argument("--max_iter", type=int, default=2000000)
    parser.add_argument("--is_finetune", action="store_true")
    parser.add_argument("--profile", action="store_true",
                        help="write a jax.profiler trace of the first epoch")
    return parser.parse_args()


def set_seed(seed: int):
    random.seed(seed)
    np.random.seed(seed)


def make_trainer(args, conf):
    if args.task == "text2wav":
        if args.is_finetune:
            from viet_tts_tpu.train.joint import JointFinetuner as T
        else:
            from viet_tts_tpu.train.joint import JointTrainer as T
    elif args.task == "fastspeech2":
        from viet_tts_tpu.train.trainer import FastSpeech2Trainer as T
    elif args.task == "adaspeech":
        from viet_tts_tpu.train.trainer import AdaSpeechTrainer as T
    elif args.task == "hifigan":
        from viet_tts_tpu.train.gan import HiFiGANTrainer as T
    elif args.task == "jets":
        from viet_tts_tpu.train.gan import JETSTrainer as T
    elif args.task == "vits2":
        from viet_tts_tpu.train.gan import VITS2Trainer as T
    elif args.task == "matcha":
        from viet_tts_tpu.train.matcha import MatchaTrainer as T
    else:
        raise NotImplementedError(f"Not supported to training `{args.task}`...")
    return T(args, conf)


if __name__ == "__main__":
    args = build_arguments()
    conf = build_config(args.config)
    set_seed(conf["train"]["seed"])

    if args.is_finetune:
        assert args.task in ["text2wav"], (
            f"Fine-tuning model is not supported for `{args.task}` yet!"
        )

    trainer = make_trainer(args, conf)
    trainer.run()
