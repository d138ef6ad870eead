"""Model introspection helpers (role of reference `models/utils.py`)."""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np


def get_param_num(params: Dict[str, Any]) -> int:
    return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params)))


def show_params(params: Dict[str, Any], prefix: str = "") -> None:
    """Print the parameter tree with shapes and counts."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params)
    for k, v in sorted(flat.items()):
        print(f"{prefix}{'/'.join(map(str, k))}: {tuple(v.shape)}")
    print(f"Total parameters: {get_param_num(params):,}")


def show_model(module) -> None:
    """Print a flax module's structure."""
    print(module)
