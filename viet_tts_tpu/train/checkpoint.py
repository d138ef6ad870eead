"""Checkpointing with the reference's resume-by-scan semantics.

Format: one msgpack file per save, named
``{prefix}_epoch{E}_iteration{I}_statedict.msgpack`` (the reference's
torch.save naming at `src/trainer/base.py:110-127` with a different
serialisation); sidecar metadata (config.yaml, speakers/accents/stats json)
written next to checkpoints (`base.py:129-144`); newest 3 kept
(`tools_for_model.py:12-22`); tolerant name-by-name, shape-checked load
(`tools_for_model.py:48-74`).
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np
import yaml
from flax import serialization, traverse_util


def checkpoint_name(prefix: str, epoch: int, iteration: int) -> str:
    return f"{prefix}_epoch{epoch}_iteration{iteration}_statedict.msgpack"


def parse_checkpoint_name(path: str) -> Tuple[int, int]:
    m = re.search(r"epoch(\d+)_iteration(\d+)", os.path.basename(path))
    if not m:
        raise ValueError(f"unparseable checkpoint name: {path}")
    return int(m.group(1)), int(m.group(2))


def scan_checkpoint(ckpt_dir: str, prefix: str) -> Optional[str]:
    """Newest checkpoint by iteration number (`tools_for_model.py:38-45`)."""
    pattern = os.path.join(ckpt_dir, f"{prefix}*_statedict.msgpack")
    candidates = glob.glob(pattern)
    if not candidates:
        return None
    return max(candidates, key=lambda p: parse_checkpoint_name(p)[1])


def clear_disk(ckpt_dir: str, prefix: str, keep: int = 3) -> None:
    pattern = os.path.join(ckpt_dir, f"{prefix}*_statedict.msgpack")
    candidates = sorted(
        glob.glob(pattern), key=lambda p: parse_checkpoint_name(p)[1]
    )
    for path in candidates[:-keep]:
        os.remove(path)


def save_checkpoint(
    ckpt_dir: str,
    prefix: str,
    epoch: int,
    iteration: int,
    payload: Dict[str, Any],
    keep: int = 3,
) -> str:
    """Serialise a pytree payload (params / batch_stats / opt_state...)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, checkpoint_name(prefix, epoch, iteration))
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(payload))
    clear_disk(ckpt_dir, prefix, keep=keep)
    return path


def load_checkpoint(path: str, target: Dict[str, Any]) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


def apply_weights(
    target_params: Dict[str, Any], source_params: Dict[str, Any]
) -> Tuple[Dict[str, Any], list]:
    """Tolerant weight transfer: copy leaves whose path exists in the target
    with a matching shape; report what was skipped. This is what lets joint
    training warm-start from a bare acoustic checkpoint
    (`tools_for_model.py:48-74`, `joint_trainer.py:174-182`)."""
    flat_target = traverse_util.flatten_dict(target_params)
    flat_source = traverse_util.flatten_dict(source_params)
    skipped = []
    out = {}
    for k, v in flat_target.items():
        if k in flat_source and np.shape(flat_source[k]) == np.shape(v):
            out[k] = flat_source[k]
        else:
            out[k] = v
            skipped.append("/".join(map(str, k)))
    return traverse_util.unflatten_dict(out), skipped


def save_information(
    out_dir: str,
    conf: Dict[str, Any],
    speakers: Optional[dict] = None,
    accents: Optional[dict] = None,
    stats: Optional[dict] = None,
) -> None:
    """Sidecar metadata needed to reload a model for inference."""
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "config.yaml"), "w", encoding="utf8") as f:
        yaml.safe_dump(conf, f, sort_keys=False)
    for name, obj in (
        ("speakers.json", speakers),
        ("accents.json", accents),
        ("stats.json", stats),
    ):
        if obj is not None:
            with open(os.path.join(out_dir, name), "w", encoding="utf8") as f:
                json.dump(obj, f, indent=1, ensure_ascii=False)
