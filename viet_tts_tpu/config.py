"""Configuration loading.

Three YAML files in a config directory merge into a single dict with keys
``audio`` (preprocessing), ``models`` (per-model hparams), and ``train``
(per-task optimizer / loss settings) — the same surface as the reference's
`src/tools/tools_for_model.py:77-83`, so reference config directories load
unchanged.

Unlike the reference, which mutates the config dict at runtime inside
trainers, all derived settings are computed explicitly here via
:func:`derive_task_config`.
"""

from __future__ import annotations

import copy
import os
from typing import Any, Dict

import yaml

CONFIG_FILES = {
    "audio": "preprocessing_config.yaml",
    "models": "model_config.yaml",
    "train": "train_config.yaml",
}


def build_config(config_dir: str) -> Dict[str, Any]:
    """Load and merge the three config YAMLs from ``config_dir``."""
    conf: Dict[str, Any] = {}
    for key, fname in CONFIG_FILES.items():
        path = os.path.join(config_dir, fname)
        with open(path, "r", encoding="utf8") as f:
            conf[key] = yaml.safe_load(f)
    return conf


def upsample_factor(conf: Dict[str, Any]) -> int:
    """Total vocoder upsampling (== STFT hop length)."""
    return int(conf["audio"]["stft"]["hop_length"])


def derive_task_config(conf: Dict[str, Any], task: str, version: str | None = None) -> Dict[str, Any]:
    """Return a deep-copied config with task-derived fields filled in.

    Replaces the reference's in-trainer mutations (e.g. injecting
    ``audio.self_learning`` from the model's learn_alignment switch at
    `src/trainer/fastspeech2_trainer.py:35`).
    """
    conf = copy.deepcopy(conf)
    model_key = version if task in ("text2wav", "joint") and version else task
    model_conf = conf["models"].get(model_key, {})
    variance = model_conf.get("variance", model_conf)
    learn_alignment = bool(variance.get("learn_alignment", False)) or model_key == "matcha"
    conf["audio"]["self_learning"] = learn_alignment
    conf["task"] = task
    conf["version"] = version
    return conf
