"""PyTorch -> JAX checkpoint importer.

Lets users of the reference bring trained checkpoints across (SURVEY §7.3
hard part 6: the cheapest route to parity validation without retraining).

Weight-norm handling: torch stores (weight_g, weight_v); we import the
EFFECTIVE kernel W = g * v/||v|| and set our (v, g) to (W, ||W||), which the
normalised forward reproduces exactly regardless of norm-grouping
conventions.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _to_np(t) -> np.ndarray:
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def effective_weight(sd: Dict[str, Any], prefix: str) -> np.ndarray:
    """Effective conv weight from a (possibly weight-normed) torch module."""
    if f"{prefix}.weight_v" in sd:
        import torch

        v = sd[f"{prefix}.weight_v"]
        g = sd[f"{prefix}.weight_g"]
        dims = tuple(range(1, v.dim()))
        w = g * v / torch.norm(v, dim=dims, keepdim=True)
        return _to_np(w)
    # parametrize-style (torch >= 2.1 weight_norm)
    if f"{prefix}.parametrizations.weight.original1" in sd:
        import torch

        v = sd[f"{prefix}.parametrizations.weight.original1"]
        g = sd[f"{prefix}.parametrizations.weight.original0"]
        dims = tuple(range(1, v.dim()))
        w = g * v / torch.norm(v, dim=dims, keepdim=True)
        return _to_np(w)
    return _to_np(sd[f"{prefix}.weight"])


def conv1d_params(sd, prefix: str, weight_norm: bool) -> Dict[str, Any]:
    """torch Conv1d (out,in,k) -> our WNConv1d params."""
    w = effective_weight(sd, prefix)  # (out, in, k)
    kernel = np.transpose(w, (2, 1, 0))  # (k, in, out)
    out: Dict[str, Any] = {}
    conv = {"kernel": kernel}
    if f"{prefix}.bias" in sd:
        conv["bias"] = _to_np(sd[f"{prefix}.bias"])
    if weight_norm:
        # scale = ||kernel|| per out channel (reproduces W exactly);
        # flax WeightNorm stores it under the flat "conv/kernel/scale" key
        scale = np.linalg.norm(kernel.reshape(-1, kernel.shape[-1]), axis=0)
        out["conv"] = conv
        out["wn"] = {"conv/kernel/scale": scale}
    else:
        out["conv"] = conv
    return out


def conv_transpose1d_params(sd, prefix: str) -> Dict[str, Any]:
    """torch ConvTranspose1d (in,out,k) -> our WNConvTranspose1d params."""
    w = effective_weight(sd, prefix)  # (in, out, k)
    # our WNConvTranspose1d realises convT as an input-dilated regular conv,
    # which consumes the taps in reversed order -> spatial flip
    kernel_v = np.transpose(w, (2, 0, 1))[::-1].copy()  # (k, in, out)
    kernel_g = np.linalg.norm(
        kernel_v.reshape(-1, kernel_v.shape[-1]), axis=0
    )
    return {
        "kernel_v": kernel_v,
        "kernel_g": kernel_g,
        "bias": _to_np(sd[f"{prefix}.bias"]),
    }


def import_hifigan_generator(
    state_dict: Dict[str, Any],
    upsample_scales=(8, 8, 2, 2),
    resblock_kernel_sizes=(3, 7, 11),
    resblock_dilations=((1, 3, 5),) * 3,
    use_additional_convs: bool = True,
) -> Dict[str, Any]:
    """Reference `HiFiGAN` generator state_dict -> flax params tree.

    Reference layout (`models/gan_tts/hifigan/generator.py`):
      input_conv, upsamples.{i}.1 (ConvTranspose1d in a Sequential),
      blocks.{i*n+j}.convs1.{d}.1 / convs2.{d}.1, output_conv.1,
      optional global_conv.
    """
    sd = state_dict
    params: Dict[str, Any] = {}
    params["input_conv"] = conv1d_params(sd, "input_conv", weight_norm=True)
    if any(k.startswith("global_conv") for k in sd):
        params["global_conv"] = conv1d_params(sd, "global_conv", weight_norm=True)

    n_blocks = len(resblock_kernel_sizes)
    for i in range(len(upsample_scales)):
        params[f"upsample_{i}"] = conv_transpose1d_params(sd, f"upsamples.{i}.1")
        for j in range(n_blocks):
            blk: Dict[str, Any] = {}
            flat = i * n_blocks + j
            for d in range(len(resblock_dilations[j])):
                blk[f"conv1_{d}"] = conv1d_params(
                    sd, f"blocks.{flat}.convs1.{d}.1", weight_norm=True
                )
                if use_additional_convs:
                    blk[f"conv2_{d}"] = conv1d_params(
                        sd, f"blocks.{flat}.convs2.{d}.1", weight_norm=True
                    )
            params[f"block_{i}_{j}"] = blk
    params["output_conv"] = conv1d_params(sd, "output_conv.1", weight_norm=True)
    return params


def import_msmpd_discriminator(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Reference MSMPD -> flax params (scale + period discriminators).

    Reference layout (`models/gan_tts/hifigan/discriminator.py`): msd
    (`msd.discriminators.{s}.layers.{l}(.0)`) and mpd
    (`mpd.discriminators.{p}.convs.{l}.0` + `output_conv`).
    """
    sd = state_dict
    out: Dict[str, Any] = {"msd": {}, "mpd": {}}

    # scale discriminators
    s = 0
    while any(k.startswith(f"msd.discriminators.{s}.") for k in sd):
        scale: Dict[str, Any] = {}
        layers = sorted(
            {
                int(k.split(".")[3])
                for k in sd
                if k.startswith(f"msd.discriminators.{s}.layers.")
            }
        )
        n = len(layers)
        for li in layers:
            prefix = f"msd.discriminators.{s}.layers.{li}"
            prefix = prefix + (".0" if f"{prefix}.0.weight_v" in sd or f"{prefix}.0.weight" in sd else "")
            name = (
                "layer_0" if li == 0
                else f"layer_{li}" if li < n - 2
                else "layer_pre_out" if li == n - 2
                else "layer_out"
            )
            scale[name] = conv1d_params(sd, prefix, weight_norm=True)
        out["msd"][f"scale_{s}"] = scale
        s += 1

    # period discriminators
    p = 0
    while any(k.startswith(f"mpd.discriminators.{p}.") for k in sd):
        per: Dict[str, Any] = {}
        li = 0
        while any(
            k.startswith(f"mpd.discriminators.{p}.convs.{li}.") for k in sd
        ):
            w = effective_weight(sd, f"mpd.discriminators.{p}.convs.{li}.0")
            kernel = np.transpose(w, (2, 3, 1, 0))  # (kh,kw,in,out)
            scale = np.linalg.norm(kernel.reshape(-1, kernel.shape[-1]), axis=0)
            per[f"conv_{li}"] = {
                "kernel": kernel,
                "bias": _to_np(sd[f"mpd.discriminators.{p}.convs.{li}.0.bias"]),
            }
            per[f"wn_{li}"] = {f"conv_{li}/kernel/scale": scale}
            li += 1
        w = effective_weight(sd, f"mpd.discriminators.{p}.output_conv")
        kernel = np.transpose(w, (2, 3, 1, 0))
        per["conv_post"] = {
            "kernel": kernel,
            "bias": _to_np(sd[f"mpd.discriminators.{p}.output_conv.bias"]),
        }
        per["wn_post"] = {
            "conv_post/kernel/scale": np.linalg.norm(
                kernel.reshape(-1, kernel.shape[-1]), axis=0
            )
        }
        out["mpd"][f"period_{p}"] = per  # period value fixed by config order
        p += 1
    return out
