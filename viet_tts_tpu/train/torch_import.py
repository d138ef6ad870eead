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


# ---------------------------------------------------------------------------
# FastSpeech2 (transformer building block)
# ---------------------------------------------------------------------------


def linear_params(sd, prefix: str) -> Dict[str, Any]:
    """torch Linear (out,in) -> flax Dense {kernel (in,out), bias}."""
    p = {"kernel": _to_np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        p["bias"] = _to_np(sd[f"{prefix}.bias"])
    return p


def plain_conv1d_params(sd, prefix: str) -> Dict[str, Any]:
    """torch Conv1d (out,in,k) -> flax Conv {kernel (k,in,out), bias}."""
    p = {"kernel": np.transpose(_to_np(sd[f"{prefix}.weight"]), (2, 1, 0))}
    if f"{prefix}.bias" in sd:
        p["bias"] = _to_np(sd[f"{prefix}.bias"])
    return p


def layernorm_params(sd, prefix: str) -> Dict[str, Any]:
    return {
        "scale": _to_np(sd[f"{prefix}.weight"]),
        "bias": _to_np(sd[f"{prefix}.bias"]),
    }


def embed_params(sd, prefix: str) -> Dict[str, Any]:
    return {"embedding": _to_np(sd[f"{prefix}.weight"])}


def batchnorm_params(sd, prefix: str):
    """torch BatchNorm1d -> (flax params, flax batch_stats)."""
    return (
        {
            "scale": _to_np(sd[f"{prefix}.weight"]),
            "bias": _to_np(sd[f"{prefix}.bias"]),
        },
        {
            "mean": _to_np(sd[f"{prefix}.running_mean"]),
            "var": _to_np(sd[f"{prefix}.running_var"]),
        },
    )


def _fft_block_params(sd, prefix: str) -> Dict[str, Any]:
    """Reference FFTBlock (`blocks/transformer.py:171-193`) -> our FFTBlock."""
    return {
        "slf_attn": {
            "w_qs": linear_params(sd, f"{prefix}.slf_attn.w_qs"),
            "w_ks": linear_params(sd, f"{prefix}.slf_attn.w_ks"),
            "w_vs": linear_params(sd, f"{prefix}.slf_attn.w_vs"),
            "fc": linear_params(sd, f"{prefix}.slf_attn.fc"),
            "layer_norm": layernorm_params(sd, f"{prefix}.slf_attn.layer_norm"),
        },
        "pos_ffn": {
            "w_1": plain_conv1d_params(sd, f"{prefix}.pos_ffn.w_1"),
            "w_2": plain_conv1d_params(sd, f"{prefix}.pos_ffn.w_2"),
            "layer_norm": layernorm_params(sd, f"{prefix}.pos_ffn.layer_norm"),
        },
    }


def _conv_stack_params(sd, prefix: str, n_layers: int) -> Dict[str, Any]:
    """Reference predictor conv stack conv.{i}.{1=Conv1d,3=LayerNorm}
    (`layers.py:381-394`) -> our ConvReluNormStack {conv_i, ln_i}."""
    out: Dict[str, Any] = {}
    for i in range(n_layers):
        out[f"conv_{i}"] = plain_conv1d_params(sd, f"{prefix}.conv.{i}.1")
        out[f"ln_{i}"] = layernorm_params(sd, f"{prefix}.conv.{i}.3")
    return out


def _duration_predictor_params(sd, prefix: str, n_layers: int) -> Dict[str, Any]:
    return {
        "conv": _conv_stack_params(sd, prefix, n_layers),
        "linear": linear_params(sd, f"{prefix}.linear"),
    }


def _variance_predictor_params(sd, prefix: str, n_layers: int) -> Dict[str, Any]:
    return {
        "pos_embed_alpha": _to_np(sd[f"{prefix}.pos_embed_alpha"]),
        "conv": _conv_stack_params(sd, prefix, n_layers),
        "linear": linear_params(sd, f"{prefix}.linear"),
    }


def _aligner_params(sd, prefix: str) -> Dict[str, Any]:
    """Reference AlignmentEncoder (`layers.py:258-314`) -> our AlignmentEncoder.

    The reference spk projections are bias-free LinearNorm; our Dense has a
    bias which we zero-fill.
    """
    def dense_nobias(p, odim):
        w = _to_np(sd[f"{p}.linear.weight"])
        return {"kernel": w.T, "bias": np.zeros(odim, np.float32)}

    kq = {
        "key_conv1": plain_conv1d_params(sd, f"{prefix}.key_proj.0.conv"),
        "key_conv2": plain_conv1d_params(sd, f"{prefix}.key_proj.2.conv"),
        "query_conv1": plain_conv1d_params(sd, f"{prefix}.query_proj.0.conv"),
        "query_conv2": plain_conv1d_params(sd, f"{prefix}.query_proj.2.conv"),
        "query_conv3": plain_conv1d_params(sd, f"{prefix}.query_proj.4.conv"),
    }
    if f"{prefix}.key_spk_proj.linear.weight" in sd:
        wk = _to_np(sd[f"{prefix}.key_spk_proj.linear.weight"])
        wq = _to_np(sd[f"{prefix}.query_spk_proj.linear.weight"])
        kq["key_spk_proj"] = {"kernel": wk.T, "bias": np.zeros(wk.shape[0], np.float32)}
        kq["query_spk_proj"] = {"kernel": wq.T, "bias": np.zeros(wq.shape[0], np.float32)}
    return kq


def _postnet_params(sd, prefix: str, n_layers: int):
    """Reference Postnet convolutions.{i}.{0=ConvNorm,1=BatchNorm1d}
    (`layers.py:571-625`) -> (params, batch_stats)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i in range(n_layers):
        params[f"conv_{i}"] = plain_conv1d_params(
            sd, f"{prefix}.convolutions.{i}.0.conv"
        )
        p, s = batchnorm_params(sd, f"{prefix}.convolutions.{i}.1")
        params[f"bn_{i}"] = p
        stats[f"bn_{i}"] = s
    return params, stats


def _accent_encoder_params(sd, prefix: str, idim: int = 80):
    """AccentEncoderNetwork (`models/tts/fastspeech2/layers.py:628-821`):
    espnet ReferenceEncoder (Conv2d/BN stack + GRU) + CVAEnet accent and
    speaker heads -> our AccentEncoderNetwork {params, batch_stats}."""
    conv_layers = 0
    while f"{prefix}.encoder.convs.{3 * conv_layers}.weight" in sd:
        conv_layers += 1
    enc: Dict[str, Any] = {}
    enc_stats: Dict[str, Any] = {}
    k = _to_np(sd[f"{prefix}.encoder.convs.0.weight"]).shape[-1]
    stride, pad = 2, (k - 1) // 2
    f_dim = idim
    for i in range(conv_layers):
        w = _to_np(sd[f"{prefix}.encoder.convs.{3 * i}.weight"])
        enc[f"conv_{i}"] = {"kernel": np.transpose(w, (2, 3, 1, 0))}
        bn_p, bn_s = batchnorm_params(sd, f"{prefix}.encoder.convs.{3 * i + 1}")
        enc[f"bn_{i}"] = bn_p
        enc_stats[f"bn_{i}"] = bn_s
        f_dim = (f_dim - k + 2 * pad) // stride + 1
    gru_units = _to_np(sd[f"{prefix}.encoder.gru.weight_hh_l0"]).shape[1]
    layer = 0
    while f"{prefix}.encoder.gru.weight_ih_l{layer}" in sd:
        enc[f"GRUCell_{layer}"] = _torch_gru_params(
            sd, f"{prefix}.encoder.gru", layer,
            f_dim if layer == 0 else 0, gru_units,
        )
        layer += 1
    cvae: Dict[str, Any] = {}
    for tag in ("acc", "spk"):
        cvae[f"embedding_layer_{tag}"] = embed_params(
            sd, f"{prefix}.cvae.embedding_layer_{tag}"
        )
        cvae[f"linear_{tag}"] = linear_params(
            sd, f"{prefix}.cvae.linear_model_{tag}.0"
        )
        cvae[f"mu_{tag}"] = linear_params(
            sd, f"{prefix}.cvae.mu_layer_{tag}.linear"
        )
        cvae[f"logvar_{tag}"] = linear_params(
            sd, f"{prefix}.cvae.logvar_layer_{tag}.linear"
        )
    return {"encoder": enc, "cvae": cvae}, {"encoder": enc_stats}


def import_fastspeech2(
    state_dict: Dict[str, Any], hparams: Dict[str, Any]
) -> Dict[str, Any]:
    """Reference `FastSpeech2` state_dict -> flax variables
    {params, batch_stats}.

    Covers the transformer and conformer building blocks, the id-embedding
    and external-vector speaker modes, supervised or MAS-learned durations,
    and the optional Postnet (`models/tts/fastspeech2/model.py:23-103`).
    The CVAE speaker mode needs espnet's ReferenceEncoder at record time and
    is imported by `_accent_encoder_params` when its keys are present.
    """
    sd = state_dict
    hp = hparams
    block = hp["building_block"]["block_type"]
    vp = hp["variance"]["variance_predictor"]

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    # encoder / decoder stacks
    if block == "transformer":
        enc = {"src_word_emb": embed_params(sd, "encoder.src_word_emb")}
        for i in range(hp["encoder_layers"]):
            enc[f"layer_{i}"] = _fft_block_params(sd, f"encoder.layer_stack.{i}")
        dec = {}
        for i in range(hp["decoder_layers"]):
            dec[f"layer_{i}"] = _fft_block_params(sd, f"decoder.layer_stack.{i}")
        params["encoder"], params["decoder"] = enc, dec
    elif block == "conformer":
        params["encoder"], enc_stats = _conformer_stack_params(
            sd, "encoder", hp["encoder_layers"], with_embedding=True
        )
        params["decoder"], dec_stats = _conformer_stack_params(
            sd, "decoder", hp["decoder_layers"], with_embedding=False
        )
        stats["encoder"], stats["decoder"] = enc_stats, dec_stats
    else:
        raise NotImplementedError(f"unknown building block {block!r}")

    # speaker conditioning
    if any(k.startswith("speaker_emb.cvae.") for k in sd):
        params["speaker_emb"], stats["speaker_emb"] = _accent_encoder_params(
            sd, "speaker_emb"
        )
    elif "speaker_emb.weight" in sd and sd["speaker_emb.weight"].dim() == 2 and hp.get("spk_dims", -1) != -1:
        params["speaker_emb"] = linear_params(sd, "speaker_emb")
    elif "speaker_emb.weight" in sd:
        params["speaker_emb"] = embed_params(sd, "speaker_emb")

    # variance adaptor
    va: Dict[str, Any] = {
        "duration_predictor": _duration_predictor_params(
            sd, "variance_adaptor.duration_predictor", vp["dur_predictor_layers"]
        ),
        "pitch_predictor": _variance_predictor_params(
            sd, "variance_adaptor.pitch_predictor", vp["pit_predictor_layers"]
        ),
        "energy_predictor": _variance_predictor_params(
            sd, "variance_adaptor.energy_predictor", vp["ener_predictor_layers"]
        ),
        "pitch_embedding": embed_params(sd, "variance_adaptor.pitch_embedding"),
        "energy_embedding": embed_params(sd, "variance_adaptor.energy_embedding"),
    }
    if any(k.startswith("variance_adaptor.aligner.") for k in sd):
        va["aligner"] = _aligner_params(sd, "variance_adaptor.aligner")
    params["variance_adaptor"] = va

    params["feats_linear"] = linear_params(sd, "feats_linear")
    if any(k.startswith("postnet.") for k in sd):
        p, s = _postnet_params(sd, "postnet", hp["postnet"]["conv_layers"])
        params["postnet"] = p
        stats["postnet"] = s

    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def _conformer_ffn_params(sd, prefix: str) -> Dict[str, Any]:
    """Reference FeedForwardModule sequential {0=LN,1=Linear,4=Linear}
    (`blocks/conformer.py:275-307`) -> our FeedForwardModule."""
    return {
        "LayerNorm_0": layernorm_params(sd, f"{prefix}.sequential.0"),
        "Dense_0": linear_params(sd, f"{prefix}.sequential.1.linear"),
        "Dense_1": linear_params(sd, f"{prefix}.sequential.4.linear"),
    }


def _conformer_block_params(sd, prefix: str):
    """Reference ConformerBlock sequential
    {0=ff1,1=mhsa,2=conv,3=ff2,4=LN} (`blocks/conformer.py:215-250`)
    -> (our ConformerBlock params, batch_stats)."""
    attn = f"{prefix}.sequential.1.module.attention"

    def nobias_linear(name):
        # reference projections are bias-free LinearNorm; our Dense has a
        # bias which we zero-fill (pos_proj is bias-free on both sides)
        w = _to_np(sd[f"{attn}.{name}.linear.weight"])
        return {"kernel": w.T, "bias": np.zeros(w.shape[0], np.float32)}

    mhsa = {
        "query_proj": nobias_linear("query_proj"),
        "key_proj": nobias_linear("key_proj"),
        "value_proj": nobias_linear("value_proj"),
        "pos_proj": {"kernel": _to_np(sd[f"{attn}.pos_proj.linear.weight"]).T},
        "out_proj": nobias_linear("out_proj"),
        "u_bias": _to_np(sd[f"{attn}.u_bias"]),
        "v_bias": _to_np(sd[f"{attn}.v_bias"]),
    }
    convseq = f"{prefix}.sequential.2.module.sequential"
    bn_p, bn_s = batchnorm_params(sd, f"{convseq}.5")
    conv = {
        "LayerNorm_0": layernorm_params(sd, f"{convseq}.0"),
        "pw_conv1": plain_conv1d_params(sd, f"{convseq}.2.conv"),
        "dw_conv": plain_conv1d_params(sd, f"{convseq}.4.conv"),
        "bn": bn_p,
        "pw_conv2": plain_conv1d_params(sd, f"{convseq}.7.conv"),
    }
    params = {
        "ff1": _conformer_ffn_params(sd, f"{prefix}.sequential.0.module"),
        "mhsa_ln": layernorm_params(sd, f"{prefix}.sequential.1.module.layer_norm"),
        "mhsa": mhsa,
        "conv": conv,
        "ff2": _conformer_ffn_params(sd, f"{prefix}.sequential.3.module"),
        "final_ln": layernorm_params(sd, f"{prefix}.sequential.4"),
    }
    return params, {"conv": {"bn": bn_s}}


def _conformer_stack_params(sd, prefix: str, n_layers: int, with_embedding: bool):
    """(params, batch_stats) for a reference conformer Encoder/Decoder."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    if with_embedding:
        params["src_word_emb"] = embed_params(sd, f"{prefix}.src_word_emb")
    for i in range(n_layers):
        p, s = _conformer_block_params(sd, f"{prefix}.layer_stack.{i}")
        params[f"layer_{i}"] = p
        stats[f"layer_{i}"] = s
    return params, stats


# ---------------------------------------------------------------------------
# JETS (espnet-composed FastSpeech2 + HiFi-GAN)
# ---------------------------------------------------------------------------


def _espnet_mha_params(sd, prefix: str) -> Dict[str, Any]:
    """espnet MultiHeadedAttention -> our EspnetSelfAttention."""
    return {
        "linear_q": linear_params(sd, f"{prefix}.linear_q"),
        "linear_k": linear_params(sd, f"{prefix}.linear_k"),
        "linear_v": linear_params(sd, f"{prefix}.linear_v"),
        "linear_out": linear_params(sd, f"{prefix}.linear_out"),
    }


def _espnet_transformer_stack_params(
    sd, prefix: str, n_layers: int, has_embed: bool
) -> Dict[str, Any]:
    """espnet transformer Encoder (`jets/model.py:300-316,439-454`) ->
    our EspnetTransformerEncoder params."""
    out: Dict[str, Any] = {}
    if has_embed:
        out["embed"] = embed_params(sd, f"{prefix}.embed.0")
        pos_idx = 1
    else:
        pos_idx = 0
    if f"{prefix}.embed.{pos_idx}.alpha" in sd:
        out["pos_enc"] = {
            "alpha": _to_np(sd[f"{prefix}.embed.{pos_idx}.alpha"]).reshape(1)
        }
    for i in range(n_layers):
        lp = f"{prefix}.encoders.{i}"
        out[f"layer_{i}"] = {
            "norm1": layernorm_params(sd, f"{lp}.norm1"),
            "norm2": layernorm_params(sd, f"{lp}.norm2"),
            "self_attn": _espnet_mha_params(sd, f"{lp}.self_attn"),
            "feed_forward": {
                "w_1": plain_conv1d_params(sd, f"{lp}.feed_forward.w_1"),
                "w_2": plain_conv1d_params(sd, f"{lp}.feed_forward.w_2"),
            },
        }
    if f"{prefix}.after_norm.weight" in sd:
        out["after_norm"] = layernorm_params(sd, f"{prefix}.after_norm")
    return out


def _espnet_conformer_stack_params(
    sd, prefix: str, n_layers: int, has_embed: bool, ffn_type: str = "conv1d"
):
    """espnet conformer Encoder (`jets/model.py:317-341,455-477`) ->
    (our EspnetConformerEncoder params, batch_stats)."""
    out: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    if has_embed:
        out["embed"] = embed_params(sd, f"{prefix}.embed.0")

    def ffn(lp, torch_name, flax_name, layer):
        if ffn_type == "conv1d":
            layer[f"{flax_name}_w_1"] = plain_conv1d_params(
                sd, f"{lp}.{torch_name}.w_1"
            )
            layer[f"{flax_name}_w_2"] = plain_conv1d_params(
                sd, f"{lp}.{torch_name}.w_2"
            )
        else:
            layer[f"{flax_name}_w_1"] = linear_params(sd, f"{lp}.{torch_name}.w_1")
            layer[f"{flax_name}_w_2"] = linear_params(sd, f"{lp}.{torch_name}.w_2")

    for i in range(n_layers):
        lp = f"{prefix}.encoders.{i}"
        layer: Dict[str, Any] = {
            "norm_mha": layernorm_params(sd, f"{lp}.norm_mha"),
            "norm_ff": layernorm_params(sd, f"{lp}.norm_ff"),
            "self_attn": {
                **_espnet_mha_params(sd, f"{lp}.self_attn"),
                "linear_pos": {
                    "kernel": _to_np(sd[f"{lp}.self_attn.linear_pos.weight"]).T
                },
                "pos_bias_u": _to_np(sd[f"{lp}.self_attn.pos_bias_u"]),
                "pos_bias_v": _to_np(sd[f"{lp}.self_attn.pos_bias_v"]),
            },
        }
        ffn(lp, "feed_forward", "ff", layer)
        if f"{lp}.feed_forward_macaron.w_1.weight" in sd:
            layer["norm_ff_macaron"] = layernorm_params(sd, f"{lp}.norm_ff_macaron")
            ffn(lp, "feed_forward_macaron", "ff_macaron", layer)
        lstats: Dict[str, Any] = {}
        if f"{lp}.conv_module.pointwise_conv1.weight" in sd:
            bn_p, bn_s = batchnorm_params(sd, f"{lp}.conv_module.norm")
            layer["norm_conv"] = layernorm_params(sd, f"{lp}.norm_conv")
            layer["norm_final"] = layernorm_params(sd, f"{lp}.norm_final")
            layer["conv_module"] = {
                "pointwise_conv1": plain_conv1d_params(
                    sd, f"{lp}.conv_module.pointwise_conv1"
                ),
                "depthwise_conv": plain_conv1d_params(
                    sd, f"{lp}.conv_module.depthwise_conv"
                ),
                "norm": bn_p,
                "pointwise_conv2": plain_conv1d_params(
                    sd, f"{lp}.conv_module.pointwise_conv2"
                ),
            }
            lstats["conv_module"] = {"norm": bn_s}
        out[f"layer_{i}"] = layer
        if lstats:
            stats[f"layer_{i}"] = lstats
    if f"{prefix}.after_norm.weight" in sd:
        out["after_norm"] = layernorm_params(sd, f"{prefix}.after_norm")
    return out, stats


def _espnet_predictor_params(sd, prefix: str, n_layers: int) -> Dict[str, Any]:
    """espnet Duration/VariancePredictor conv.{i}.{0=Conv1d,2=LayerNorm} ->
    our Espnet{Duration,Variance}Predictor {conv_i, ln_i, linear}."""
    out: Dict[str, Any] = {}
    for i in range(n_layers):
        out[f"conv_{i}"] = plain_conv1d_params(sd, f"{prefix}.conv.{i}.0")
        out[f"ln_{i}"] = layernorm_params(sd, f"{prefix}.conv.{i}.2")
    out["linear"] = linear_params(sd, f"{prefix}.linear")
    return out


def _torch_gru_params(sd, prefix: str, layer: int, n_features: int, n_chans: int):
    """torch GRU layer -> flax GRUCell params.

    flax GRUCell: r = sig(ir(x) + hr(h)); z = sig(iz(x) + hz(h));
    n = tanh(in(x) + r * hn(h)); hr/hz have no bias, so torch's b_hh r/z
    parts fold into ir/iz biases; hn keeps b_hn (multiplied by r exactly
    like torch).  The conv-stack features reaching the GRU are flattened
    (C, F) C-major in torch but (F, C) F-major in our NHWC layout, so the
    input columns are permuted accordingly.
    """
    w_ih = _to_np(sd[f"{prefix}.weight_ih_l{layer}"])  # (3H, in)
    w_hh = _to_np(sd[f"{prefix}.weight_hh_l{layer}"])  # (3H, H)
    b_ih = _to_np(sd[f"{prefix}.bias_ih_l{layer}"])
    b_hh = _to_np(sd[f"{prefix}.bias_hh_l{layer}"])
    H = n_chans
    in_dim = w_ih.shape[1]
    if layer == 0 and n_features > 0:
        C = in_dim // n_features
        # flax idx f*C + c  <- torch idx c*F + f
        perm = np.arange(in_dim).reshape(C, n_features).T.reshape(-1)
        w_ih = w_ih[:, perm]
    w_ir, w_iz, w_in = w_ih[:H], w_ih[H : 2 * H], w_ih[2 * H :]
    w_hr, w_hz, w_hn = w_hh[:H], w_hh[H : 2 * H], w_hh[2 * H :]
    return {
        "ir": {"kernel": w_ir.T, "bias": b_ih[:H] + b_hh[:H]},
        "iz": {"kernel": w_iz.T, "bias": b_ih[H : 2 * H] + b_hh[H : 2 * H]},
        "in": {"kernel": w_in.T, "bias": b_ih[2 * H :]},
        "hr": {"kernel": w_hr.T},
        "hz": {"kernel": w_hz.T},
        "hn": {"kernel": w_hn.T, "bias": b_hh[2 * H :]},
    }


def _gst_params(sd, prefix: str, conv_layers: int = 6, gru_layers: int = 1,
                idim: int = 80, conv_kernel_size: int = 3, conv_stride: int = 2):
    """espnet StyleEncoder (`jets/model.py:344-357`) -> our StyleEncoder."""
    params: Dict[str, Any] = {"ref_enc": {}, "stl": {}}
    stats: Dict[str, Any] = {"ref_enc": {}}
    f_dim = idim
    pad = (conv_kernel_size - 1) // 2
    for i in range(conv_layers):
        w = _to_np(sd[f"{prefix}.ref_enc.convs.{3 * i}.weight"])  # (out,in,kh,kw)
        params["ref_enc"][f"conv_{i}"] = {"kernel": np.transpose(w, (2, 3, 1, 0))}
        bn_p, bn_s = batchnorm_params(sd, f"{prefix}.ref_enc.convs.{3 * i + 1}")
        params["ref_enc"][f"bn_{i}"] = bn_p
        stats["ref_enc"][f"bn_{i}"] = bn_s
        f_dim = (f_dim - conv_kernel_size + 2 * pad) // conv_stride + 1
    gru_units = _to_np(sd[f"{prefix}.ref_enc.gru.weight_hh_l0"]).shape[1]
    for i in range(gru_layers):
        # the GRUCell is constructed outside nn.RNN, so flax scopes it to
        # the parent module as GRUCell_{i}
        params["ref_enc"][f"GRUCell_{i}"] = _torch_gru_params(
            sd, f"{prefix}.ref_enc.gru", i, f_dim if i == 0 else 0, gru_units
        )
    params["stl"]["gst_embs"] = _to_np(sd[f"{prefix}.stl.gst_embs"])
    for name in ["linear_q", "linear_k", "linear_v", "linear_out"]:
        params["stl"][name] = linear_params(sd, f"{prefix}.stl.mha.{name}")
    return params, stats


def import_jets(state_dict: Dict[str, Any], hparams: Dict[str, Any],
                n_channels: int = 80) -> Dict[str, Any]:
    """Reference `JETS` state_dict (`models/gan_tts/jets/model.py`) ->
    flax variables {params, batch_stats}."""
    sd = state_dict
    hp = hparams
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    ffn_type = hp.get("positionwise_layer_type", "conv1d")
    for part, n_layers in [("encoder", hp["elayers"]), ("decoder", hp["dlayers"])]:
        kind = hp.get(f"{part}_type", "transformer")
        has_embed = part == "encoder"
        if kind == "conformer":
            p, s = _espnet_conformer_stack_params(
                sd, part, n_layers, has_embed, ffn_type
            )
            params[part] = p
            if s:
                stats[part] = s
        else:
            params[part] = _espnet_transformer_stack_params(
                sd, part, n_layers, has_embed
            )

    if "sid_emb.weight" in sd:
        params["sid_emb"] = embed_params(sd, "sid_emb")
    if any(k.startswith("gst.") for k in sd):
        p, s = _gst_params(
            sd, "gst",
            conv_layers=hp.get("gst_conv_layers", 6),
            gru_layers=hp.get("gst_gru_layers", 1),
            idim=n_channels,
            conv_kernel_size=hp.get("gst_conv_kernel_size", 3),
            conv_stride=hp.get("gst_conv_stride", 2),
        )
        params["gst"] = p
        stats["gst"] = s

    params["duration_predictor"] = _espnet_predictor_params(
        sd, "duration_predictor", hp.get("duration_predictor_layers", 2)
    )
    params["pitch_predictor"] = _espnet_predictor_params(
        sd, "pitch_predictor", hp.get("pitch_predictor_layers", 5)
    )
    params["energy_predictor"] = _espnet_predictor_params(
        sd, "energy_predictor", hp.get("energy_predictor_layers", 2)
    )
    params["pitch_embed"] = {"conv": plain_conv1d_params(sd, "pitch_embed.0")}
    params["energy_embed"] = {"conv": plain_conv1d_params(sd, "energy_embed.0")}

    params["alignment_module"] = {
        name: plain_conv1d_params(sd, f"alignment_module.{name}")
        for name in ["t_conv1", "t_conv2", "f_conv1", "f_conv2", "f_conv3"]
    }

    gen_sd = {
        k[len("generator."):]: v for k, v in sd.items()
        if k.startswith("generator.")
    }
    params["generator"] = import_hifigan_generator(
        gen_sd,
        upsample_scales=tuple(hp.get("generator_upsample_scales", (8, 8, 2, 2))),
        resblock_kernel_sizes=tuple(
            hp.get("generator_resblock_kernel_sizes", (3, 7, 11))
        ),
        resblock_dilations=tuple(
            map(tuple, hp.get("generator_resblock_dilations", ((1, 3, 5),) * 3))
        ),
        use_additional_convs=hp.get("generator_use_additional_convs", True),
    )

    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


# ---------------------------------------------------------------------------
# VITS2 (`models/gan_tts/vits2/generator.py`)
# ---------------------------------------------------------------------------


def _vits_ln_params(sd, prefix: str) -> Dict[str, Any]:
    """VITS LayerNorm stores gamma/beta (`vits2/sublayers.py:11-23`)."""
    return {
        "scale": _to_np(sd[f"{prefix}.gamma"]),
        "bias": _to_np(sd[f"{prefix}.beta"]),
    }


def _vits_attention_params(sd, prefix: str) -> Dict[str, Any]:
    out = {
        name: plain_conv1d_params(sd, f"{prefix}.{name}")
        for name in ["conv_q", "conv_k", "conv_v", "conv_o"]
    }
    if f"{prefix}.emb_rel_k" in sd:
        out["emb_rel_k"] = _to_np(sd[f"{prefix}.emb_rel_k"])
        out["emb_rel_v"] = _to_np(sd[f"{prefix}.emb_rel_v"])
    return out


def _vits_encoder_params(sd, prefix: str, n_layers: int) -> Dict[str, Any]:
    """VITS rel-pos Encoder (`vits2/attentions.py:11-91`) ->
    our VitsEncoder."""
    out: Dict[str, Any] = {}
    if f"{prefix}.spk_emb_linear.weight" in sd:
        out["spk_emb_linear"] = linear_params(sd, f"{prefix}.spk_emb_linear")
    for i in range(n_layers):
        out[f"attn_{i}"] = _vits_attention_params(sd, f"{prefix}.attn_layers.{i}")
        out[f"norm1_{i}"] = _vits_ln_params(sd, f"{prefix}.norm_layers_1.{i}")
        out[f"ffn_{i}"] = {
            "conv_1": plain_conv1d_params(sd, f"{prefix}.ffn_layers.{i}.conv_1"),
            "conv_2": plain_conv1d_params(sd, f"{prefix}.ffn_layers.{i}.conv_2"),
        }
        out[f"norm2_{i}"] = _vits_ln_params(sd, f"{prefix}.norm_layers_2.{i}")
    return out


def _wn_params(sd, prefix: str, n_layers: int) -> Dict[str, Any]:
    """WaveNet WN stack (`vits2/sublayers.py:127-213`) -> our WN."""
    out: Dict[str, Any] = {}
    for i in range(n_layers):
        out[f"in_{i}"] = conv1d_params(
            sd, f"{prefix}.in_layers.{i}", weight_norm=True
        )
        out[f"res_skip_{i}"] = conv1d_params(
            sd, f"{prefix}.res_skip_layers.{i}", weight_norm=True
        )
    if (
        f"{prefix}.cond_layer.weight_v" in sd
        or f"{prefix}.cond_layer.weight" in sd
    ):
        out["cond_layer"] = conv1d_params(
            sd, f"{prefix}.cond_layer", weight_norm=True
        )
    return out


def _wn_layer_count(sd, prefix: str) -> int:
    n = 0
    while f"{prefix}.in_layers.{n}.weight_v" in sd or (
        f"{prefix}.in_layers.{n}.weight" in sd
    ):
        n += 1
    return n


def _dds_conv_params(sd, prefix: str, n_layers: int = 3) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for i in range(n_layers):
        out[f"conv_sep_{i}"] = plain_conv1d_params(sd, f"{prefix}.convs_sep.{i}")
        out[f"conv_1x1_{i}"] = plain_conv1d_params(sd, f"{prefix}.convs_1x1.{i}")
        out[f"norm1_{i}"] = _vits_ln_params(sd, f"{prefix}.norms_1.{i}")
        out[f"norm2_{i}"] = _vits_ln_params(sd, f"{prefix}.norms_2.{i}")
    return out


def _conv_flow_params(sd, prefix: str) -> Dict[str, Any]:
    return {
        "pre": plain_conv1d_params(sd, f"{prefix}.pre"),
        "convs": _dds_conv_params(sd, f"{prefix}.convs", 3),
        "proj": plain_conv1d_params(sd, f"{prefix}.proj"),
    }


def _elementwise_affine_params(sd, prefix: str) -> Dict[str, Any]:
    return {
        "m": _to_np(sd[f"{prefix}.m"]).reshape(-1),
        "logs": _to_np(sd[f"{prefix}.logs"]).reshape(-1),
    }


def _sdp_params(sd, prefix: str, n_flows: int = 4) -> Dict[str, Any]:
    """StochasticDurationPredictor (`vits2/layers.py:188-297`)."""
    out: Dict[str, Any] = {
        "pre": plain_conv1d_params(sd, f"{prefix}.pre"),
        "proj": plain_conv1d_params(sd, f"{prefix}.proj"),
        "convs": _dds_conv_params(sd, f"{prefix}.convs", 3),
        "post_pre": plain_conv1d_params(sd, f"{prefix}.post_pre"),
        "post_proj": plain_conv1d_params(sd, f"{prefix}.post_proj"),
        "post_convs": _dds_conv_params(sd, f"{prefix}.post_convs", 3),
    }
    if f"{prefix}.cond.weight" in sd:
        out["cond"] = plain_conv1d_params(sd, f"{prefix}.cond")
    for group in ("flows", "post_flows"):
        out[f"{group}_0"] = _elementwise_affine_params(sd, f"{prefix}.{group}.0")
        for i in range(n_flows):
            j = 1 + 2 * i  # ConvFlow positions (odd); even are paramless Flips
            out[f"{group}_{j}"] = _conv_flow_params(sd, f"{prefix}.{group}.{j}")
    return out


def _vits_dp_params(sd, prefix: str) -> Dict[str, Any]:
    """Deterministic DurationPredictor (`vits2/layers.py:299-340`)."""
    out = {
        "conv_1": plain_conv1d_params(sd, f"{prefix}.conv_1"),
        "norm_1": _vits_ln_params(sd, f"{prefix}.norm_1"),
        "conv_2": plain_conv1d_params(sd, f"{prefix}.conv_2"),
        "norm_2": _vits_ln_params(sd, f"{prefix}.norm_2"),
        "proj": plain_conv1d_params(sd, f"{prefix}.proj"),
    }
    if f"{prefix}.cond.weight" in sd:
        out["cond"] = plain_conv1d_params(sd, f"{prefix}.cond")
    return out


def _vits_generator_params(sd, prefix: str, hp: Dict[str, Any]) -> Dict[str, Any]:
    """latent->waveform Generator (`vits2/layers.py:107-186`)."""
    out: Dict[str, Any] = {
        "conv_pre": plain_conv1d_params(sd, f"{prefix}.conv_pre"),
        "conv_post": plain_conv1d_params(sd, f"{prefix}.conv_post"),
    }
    if f"{prefix}.cond.weight" in sd:
        out["cond"] = plain_conv1d_params(sd, f"{prefix}.cond")
    kernels = hp["resblock_kernel_sizes"]
    dils = hp["resblock_dilation_sizes"]
    two_convs = str(hp.get("resblock", "1")) == "1"
    for i in range(len(hp["upsample_rates"])):
        out[f"up_{i}"] = conv_transpose1d_params(sd, f"{prefix}.ups.{i}")
        for j in range(len(kernels)):
            flat = i * len(kernels) + j
            blk: Dict[str, Any] = {}
            for d in range(len(dils[j])):
                if two_convs:
                    blk[f"conv1_{d}"] = conv1d_params(
                        sd, f"{prefix}.resblocks.{flat}.convs1.{d}",
                        weight_norm=True,
                    )
                    blk[f"conv2_{d}"] = conv1d_params(
                        sd, f"{prefix}.resblocks.{flat}.convs2.{d}",
                        weight_norm=True,
                    )
                else:
                    blk[f"conv_{d}"] = conv1d_params(
                        sd, f"{prefix}.resblocks.{flat}.convs.{d}",
                        weight_norm=True,
                    )
            out[f"res_{i}_{j}"] = blk
    return out


def _causal_fft_params(sd, prefix: str, n_layers: int) -> Dict[str, Any]:
    """FFT decoder stack with WN-gated speaker injection
    (`vits2/attentions.py:556-643`) -> our CausalFFT."""
    out: Dict[str, Any] = {}
    for i in range(n_layers):
        out[f"attn_{i}"] = _vits_attention_params(
            sd, f"{prefix}.self_attn_layers.{i}"
        )
        out[f"norm0_{i}"] = _vits_ln_params(sd, f"{prefix}.norm_layers_0.{i}")
        out[f"ffn_{i}"] = {
            "conv_1": plain_conv1d_params(sd, f"{prefix}.ffn_layers.{i}.conv_1"),
            "conv_2": plain_conv1d_params(sd, f"{prefix}.ffn_layers.{i}.conv_2"),
        }
        out[f"norm1_{i}"] = _vits_ln_params(sd, f"{prefix}.norm_layers_1.{i}")
    if (
        f"{prefix}.cond_layer.weight_v" in sd
        or f"{prefix}.cond_layer.weight" in sd
    ):
        # weight-normed 1x1 conv over (B, gin, 1) == Dense over (B, gin)
        w = effective_weight(sd, f"{prefix}.cond_layer")  # (out, in, 1)
        out["cond_layer"] = {
            "kernel": np.ascontiguousarray(w[:, :, 0].T),  # (in, out)
            "bias": _to_np(sd[f"{prefix}.cond_layer.bias"]),
        }
        out["cond_pre"] = plain_conv1d_params(sd, f"{prefix}.cond_pre")
    return out


def _vits_flow_block_params(sd, prefix: str, hp: Dict[str, Any]) -> Dict[str, Any]:
    """ResidualCouplingTransformersBlock (`vits2/layers.py:342-472`)."""
    ftype = hp.get("transformer_flow_type", "pre_conv")
    if not hp.get("use_transformer_flows", True):
        ftype = "none"
    n_flows = hp.get("n_flows", 4)
    mono = ftype in ("mono_layer_inter_residual", "mono_layer_post_residual")
    per = 3 if mono else 2
    out: Dict[str, Any] = {}
    for fi in range(n_flows):
        base = fi * per
        lp = f"{prefix}.flows.{base}"
        if ftype == "fft":
            # FFTransformerCouplingLayer (`vits2/layers.py:626-684`): the
            # coupling net is a causal FFT stack, not a WN stack. The block
            # constructs it with dilation_rate(=1) in the n_layers slot
            # (`vits2/layers.py:395-408`), so the stack is 1 layer deep.
            layer = {
                "pre": plain_conv1d_params(sd, f"{lp}.pre"),
                "enc": _causal_fft_params(sd, f"{lp}.enc", n_layers=1),
                "post": plain_conv1d_params(sd, f"{lp}.post"),
            }
            out[f"flows_{base}"] = layer
            continue
        layer: Dict[str, Any] = {
            "pre": plain_conv1d_params(sd, f"{lp}.pre"),
            "enc": _wn_params(sd, f"{lp}.enc", _wn_layer_count(sd, f"{lp}.enc")),
            "post": plain_conv1d_params(sd, f"{lp}.post"),
        }
        if ftype == "pre_conv":
            layer["pre_transformer"] = _vits_encoder_params(
                sd, f"{lp}.pre_transformer", 2
            )
        elif ftype == "pre_conv2":
            layer["pre_transformer"] = _vits_encoder_params(
                sd, f"{lp}.pre_transformer", 1
            )
        out[f"flows_{base}"] = layer
        if mono:
            out[f"flows_{base + 2}"] = {
                "pre_transformer": _vits_encoder_params(
                    sd, f"{prefix}.flows.{base + 2}.pre_transformer", 2
                ),
                "post": plain_conv1d_params(
                    sd, f"{prefix}.flows.{base + 2}.post"
                ),
            }
    return out


def import_vits2(state_dict: Dict[str, Any], hparams: Dict[str, Any]) -> Dict[str, Any]:
    """Reference `VITS2` state_dict -> flax variables {params}."""
    sd = state_dict
    hp = hparams
    params: Dict[str, Any] = {
        "emb_g": embed_params(sd, "emb_g"),
        "enc_p": {
            "emb": embed_params(sd, "enc_p.emb"),
            "encoder": _vits_encoder_params(sd, "enc_p.encoder", hp["n_layers"]),
            "proj": plain_conv1d_params(sd, "enc_p.proj"),
        },
        "enc_q": {
            "pre": plain_conv1d_params(sd, "enc_q.pre"),
            "enc": _wn_params(
                sd, "enc_q.enc", _wn_layer_count(sd, "enc_q.enc")
            ),
            "proj": plain_conv1d_params(sd, "enc_q.proj"),
        },
        "dec": _vits_generator_params(sd, "dec", hp),
        "flow": _vits_flow_block_params(sd, "flow", hp),
    }
    if hp.get("use_sdp", True):
        params["dp"] = _sdp_params(sd, "dp", hp.get("sdp_n_flows", 4))
    else:
        params["dp"] = _vits_dp_params(sd, "dp")
    return {"params": params}


# ---------------------------------------------------------------------------
# Matcha-TTS (`models/tts/matcha/model.py`)
# ---------------------------------------------------------------------------


def _matcha_ln_params(sd, prefix: str) -> Dict[str, Any]:
    """Matcha channel LayerNorm stores gamma/beta (`sub_layers.py:11-29`)."""
    return {
        "gamma": _to_np(sd[f"{prefix}.gamma"]),
        "beta": _to_np(sd[f"{prefix}.beta"]),
    }


def _matcha_prenet_params(sd, prefix: str, n_layers: int) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for i in range(n_layers):
        out[f"conv_{i}"] = plain_conv1d_params(sd, f"{prefix}.conv_layers.{i}")
        out[f"norm_{i}"] = _matcha_ln_params(sd, f"{prefix}.norm_layers.{i}")
    out["proj"] = plain_conv1d_params(sd, f"{prefix}.proj")
    return out


def _matcha_encoder_params(sd, prefix: str, n_layers: int) -> Dict[str, Any]:
    """RoPE Encoder (`sub_layers.py:254-302`) -> our RoPEEncoder."""
    out: Dict[str, Any] = {}
    for i in range(n_layers):
        out[f"attn_{i}"] = {
            name: plain_conv1d_params(sd, f"{prefix}.attn_layers.{i}.{name}")
            for name in ["conv_q", "conv_k", "conv_v", "conv_o"]
        }
        out[f"norm1_{i}"] = _matcha_ln_params(sd, f"{prefix}.norm_layers_1.{i}")
        out[f"ffn_{i}"] = {
            "conv_1": plain_conv1d_params(sd, f"{prefix}.ffn_layers.{i}.conv_1"),
            "conv_2": plain_conv1d_params(sd, f"{prefix}.ffn_layers.{i}.conv_2"),
        }
        out[f"norm2_{i}"] = _matcha_ln_params(sd, f"{prefix}.norm_layers_2.{i}")
    return out


def _unet_block1d_params(sd, prefix: str) -> Dict[str, Any]:
    """Block1D {block.0=Conv1d, block.1=GroupNorm} (`sub_layers.py:400-412`)."""
    gn = {
        "scale": _to_np(sd[f"{prefix}.block.1.weight"]),
        "bias": _to_np(sd[f"{prefix}.block.1.bias"]),
    }
    return {"conv": plain_conv1d_params(sd, f"{prefix}.block.0"), "norm": gn}


def _unet_resnet_params(sd, prefix: str) -> Dict[str, Any]:
    return {
        "block1": _unet_block1d_params(sd, f"{prefix}.block1"),
        "block2": _unet_block1d_params(sd, f"{prefix}.block2"),
        "mlp": linear_params(sd, f"{prefix}.mlp.1"),
        "res_conv": plain_conv1d_params(sd, f"{prefix}.res_conv"),
    }


def _unet_transformer_params(sd, prefix: str) -> Dict[str, Any]:
    """diffusers BasicTransformerBlock w/ snakebeta FF
    (`blocks/transformer.py:138-315`) -> our BasicTransformerBlock."""
    def ln(p):
        return {
            "scale": _to_np(sd[f"{p}.weight"]),
            "bias": _to_np(sd[f"{p}.bias"]),
        }

    return {
        "norm1": ln(f"{prefix}.norm1"),
        "to_q": {"kernel": _to_np(sd[f"{prefix}.attn1.to_q.weight"]).T},
        "to_k": {"kernel": _to_np(sd[f"{prefix}.attn1.to_k.weight"]).T},
        "to_v": {"kernel": _to_np(sd[f"{prefix}.attn1.to_v.weight"]).T},
        "to_out": linear_params(sd, f"{prefix}.attn1.to_out.0"),
        "norm3": ln(f"{prefix}.norm3"),
        "ff": {
            "proj_in": linear_params(sd, f"{prefix}.ff.net.0.proj"),
            "alpha": _to_np(sd[f"{prefix}.ff.net.0.alpha"]),
            "beta": _to_np(sd[f"{prefix}.ff.net.0.beta"]),
            "proj_out": linear_params(sd, f"{prefix}.ff.net.2"),
        },
    }


def _unet_decoder_params(sd, prefix: str, dec_hp: Dict[str, Any]) -> Dict[str, Any]:
    """UNet Decoder (`sub_layers.py:490-735`) -> our UNetDecoder."""
    channels = list(dec_hp.get("channels", (256, 256)))
    n_blocks = dec_hp.get("n_blocks", 1)
    n_mid = dec_hp.get("num_mid_blocks", 2)
    out: Dict[str, Any] = {
        "time_mlp": {
            "linear_1": linear_params(sd, f"{prefix}.time_mlp.linear_1"),
            "linear_2": linear_params(sd, f"{prefix}.time_mlp.linear_2"),
        },
        "final_block": _unet_block1d_params(sd, f"{prefix}.final_block"),
        "final_proj": plain_conv1d_params(sd, f"{prefix}.final_proj"),
    }
    for i in range(len(channels)):
        out[f"down_res_{i}"] = _unet_resnet_params(sd, f"{prefix}.down_blocks.{i}.0")
        for j in range(n_blocks):
            out[f"down_tf_{i}_{j}"] = _unet_transformer_params(
                sd, f"{prefix}.down_blocks.{i}.1.{j}"
            )
        dp = f"{prefix}.down_blocks.{i}.2"
        dp = dp + (".conv" if f"{dp}.conv.weight" in sd else "")
        out[f"down_conv_{i}"] = plain_conv1d_params(sd, dp)
    for i in range(n_mid):
        out[f"mid_res_{i}"] = _unet_resnet_params(sd, f"{prefix}.mid_blocks.{i}.0")
        for j in range(n_blocks):
            out[f"mid_tf_{i}_{j}"] = _unet_transformer_params(
                sd, f"{prefix}.mid_blocks.{i}.1.{j}"
            )
    n_up = len(channels)  # channels[::-1] + [channels[0]] -> len stages
    for i in range(n_up):
        out[f"up_res_{i}"] = _unet_resnet_params(sd, f"{prefix}.up_blocks.{i}.0")
        for j in range(n_blocks):
            out[f"up_tf_{i}_{j}"] = _unet_transformer_params(
                sd, f"{prefix}.up_blocks.{i}.1.{j}"
            )
        up = f"{prefix}.up_blocks.{i}.2"
        if f"{up}.conv.weight" in sd:  # ConvTranspose1d upsample
            ct = conv_transpose1d_params(sd, f"{up}.conv")
            out[f"up_kernel_{i}"] = ct["kernel_v"]
            out[f"up_bias_{i}"] = ct["bias"]
        else:  # last stage: plain conv
            out[f"up_conv_{i}"] = plain_conv1d_params(sd, up)
    return out


def import_matcha(state_dict: Dict[str, Any], hparams: Dict[str, Any]) -> Dict[str, Any]:
    """Reference `MatchaTTS` state_dict -> flax variables.

    Covers the embedding speaker mode; the CVAE accent mode reuses the GST
    reference-encoder import machinery when its keys are present.
    """
    sd = state_dict
    hp = hparams
    te = hp["text_encoder"]
    enc: Dict[str, Any] = {
        "src_word_emb": embed_params(sd, "encoder.src_word_emb"),
        "encoder": _matcha_encoder_params(
            sd, "encoder.encoder", te["encoder"]["n_layers"]
        ),
        "proj_m": plain_conv1d_params(sd, "encoder.proj_m"),
    }
    if te.get("use_prenet", True):
        enc["prenet"] = _matcha_prenet_params(
            sd, "encoder.prenet", te["prenet"]["n_layers"]
        )
    params: Dict[str, Any] = {
        "encoder": enc,
        "aligner": _aligner_params(sd, "aligner"),
        "duration_predictor": _duration_predictor_params(
            sd, "duration_predictor",
            hp["variance_predictor"]["dur_predictor_layers"],
        ),
        "decoder": {
            "estimator": _unet_decoder_params(
                sd, "decoder.estimator", hp["decoder"]
            )
        },
    }
    stats: Dict[str, Any] = {}
    if any(k.startswith("speaker_emb.cvae.") for k in sd):
        params["speaker_emb"], stats["speaker_emb"] = _accent_encoder_params(
            sd, "speaker_emb"
        )
    elif "speaker_emb.weight" in sd and sd["speaker_emb.weight"].dim() == 2 and hp.get("spk_dims", -1) in (-1, None):
        params["speaker_emb"] = embed_params(sd, "speaker_emb")
    elif "speaker_emb.weight" in sd:
        params["speaker_emb"] = linear_params(sd, "speaker_emb")
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


# ---------------------------------------------------------------------------
# AdaSpeech (`models/tts/adaspeech/model.py`)
# ---------------------------------------------------------------------------


def _cond_ln_params(sd, prefix: str) -> Dict[str, Any]:
    """CondionalLayerNorm (`adaspeech/blocks/cln.py:5-33`)."""
    return {
        "W_scale": linear_params(sd, f"{prefix}.W_scale"),
        "W_bias": linear_params(sd, f"{prefix}.W_bias"),
    }


def _cln_fft_block_params(sd, prefix: str) -> Dict[str, Any]:
    """CLN FFTBlock (`adaspeech/blocks/transformer.py:172-300`)."""
    return {
        "slf_attn": {
            "w_qs": linear_params(sd, f"{prefix}.slf_attn.w_qs"),
            "w_ks": linear_params(sd, f"{prefix}.slf_attn.w_ks"),
            "w_vs": linear_params(sd, f"{prefix}.slf_attn.w_vs"),
            "fc": linear_params(sd, f"{prefix}.slf_attn.fc"),
            "cln": _cond_ln_params(sd, f"{prefix}.slf_attn.layer_norm"),
        },
        "pos_ffn": {
            "w_1": plain_conv1d_params(sd, f"{prefix}.pos_ffn.w_1"),
            "w_2": plain_conv1d_params(sd, f"{prefix}.pos_ffn.w_2"),
            "cln": _cond_ln_params(sd, f"{prefix}.pos_ffn.layer_norm"),
        },
    }


def _conv_ln_stack_params(sd, prefix: str) -> Dict[str, Any]:
    """Named Sequential conv1d_{1,2}/layer_norm_{1,2}
    (`adaspeech/layers.py:321-356`) -> our _ConvLNStack."""
    out: Dict[str, Any] = {}
    for i, idx in enumerate((1, 2)):
        out[f"conv_{i}"] = plain_conv1d_params(sd, f"{prefix}.conv1d_{idx}")
        out[f"ln_{i}"] = layernorm_params(sd, f"{prefix}.layer_norm_{idx}")
    return out


def import_adaspeech(
    state_dict: Dict[str, Any], hparams: Dict[str, Any]
) -> Dict[str, Any]:
    """Reference `AdaSpeech` state_dict -> flax variables
    {params, batch_stats}.

    NOTE: the reference stores its sinusoid positional tables as trainable
    Parameters (`adaspeech/blocks/transformer.py:47,122`); this framework
    keeps them as fixed tables, so a checkpoint whose tables drifted from
    the sinusoid init will import with that drift dropped.
    """
    sd = state_dict
    hp = hparams
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    enc: Dict[str, Any] = {
        "src_word_emb": embed_params(sd, "encoder.src_word_emb")
    }
    for i in range(hp["encoder_layers"]):
        enc[f"layer_{i}"] = _cln_fft_block_params(sd, f"encoder.layer_stack.{i}")
    dec: Dict[str, Any] = {}
    for i in range(hp["decoder_layers"]):
        dec[f"layer_{i}"] = _cln_fft_block_params(sd, f"decoder.layer_stack.{i}")
    params["encoder"], params["decoder"] = enc, dec

    if any(k.startswith("speaker_emb.cvae.") for k in sd):
        params["speaker_emb"], stats["speaker_emb"] = _accent_encoder_params(
            sd, "speaker_emb"
        )
    elif "speaker_emb.weight" in sd and sd["speaker_emb.weight"].dim() == 2 and hp.get("spk_dims", -1) != -1:
        params["speaker_emb"] = linear_params(sd, "speaker_emb")
    elif "speaker_emb.weight" in sd:
        params["speaker_emb"] = embed_params(sd, "speaker_emb")

    va = "variance_adaptor"
    vp = hp["variance"]["variance_predictor"]
    if any(k.startswith(f"{va}.aligner.") for k in sd):
        params["aligner"] = _aligner_params(sd, f"{va}.aligner")
    params["duration_predictor"] = _duration_predictor_params(
        sd, f"{va}.duration_predictor", vp["dur_predictor_layers"]
    )
    params["pitch_predictor"] = _variance_predictor_params(
        sd, f"{va}.pitch_predictor", vp["pit_predictor_layers"]
    )
    params["energy_predictor"] = _variance_predictor_params(
        sd, f"{va}.energy_predictor", vp["ener_predictor_layers"]
    )
    params["pitch_embedding"] = embed_params(sd, f"{va}.pitch_embedding")
    params["energy_embedding"] = embed_params(sd, f"{va}.energy_embedding")

    params["utterance_encoder"] = {
        "conv": _conv_ln_stack_params(sd, f"{va}.utterance_encoder.conv")
    }
    params["phoneme_level_encoder"] = {
        "conv": _conv_ln_stack_params(sd, f"{va}.phoneme_level_encoder.conv"),
        "linear": linear_params(sd, f"{va}.phoneme_level_encoder.linear"),
    }
    params["phoneme_level_predictor"] = {
        "conv": _conv_ln_stack_params(sd, f"{va}.phoneme_level_predictor.conv"),
        "linear": linear_params(sd, f"{va}.phoneme_level_predictor.linear"),
    }
    params["phone_level_embed"] = linear_params(sd, f"{va}.phone_level_embed")

    params["cln"] = _cond_ln_params(sd, "cln")
    params["feats_linear"] = linear_params(sd, "feats_linear")
    if any(k.startswith("postnet.") for k in sd):
        p, s = _postnet_params(sd, "postnet", hp["postnet"]["conv_layers"])
        params["postnet"] = p
        stats["postnet"] = s

    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


# ---------------------------------------------------------------------------
# Conversion CLI: reference torch checkpoint -> this framework's msgpack
# ---------------------------------------------------------------------------


def import_text2wav(
    state_dict: Dict[str, Any],
    conf: Dict[str, Any],
    version: str = "fastspeech2",
) -> Dict[str, Any]:
    """Reference joint `Text2Wav` state_dict (`models/gan_tts/text2wav/
    model.py:43-54`: acoustic under ``text2mel.``, HiFiGAN generator under
    ``mel2wav.``) -> flax variables for our Text2Wav composer."""
    t2m = {
        k[len("text2mel."):]: v
        for k, v in state_dict.items()
        if k.startswith("text2mel.")
    }
    m2w = {
        k[len("mel2wav."):]: v
        for k, v in state_dict.items()
        if k.startswith("mel2wav.")
    }
    if not t2m or not m2w:
        raise ValueError(
            "not a joint Text2Wav checkpoint: expected text2mel./mel2wav. "
            "key prefixes; convert acoustic-only or vocoder-only "
            "checkpoints with their own --task instead"
        )
    models = conf["models"]
    importer = {
        "fastspeech2": import_fastspeech2,
        "adaspeech": import_adaspeech,
        "matcha": import_matcha,
    }[version]
    acoustic = importer(t2m, models[version])
    hifi = models["hifigan"]
    voc = import_hifigan_generator(
        m2w,
        upsample_scales=tuple(hifi.get("upsample_rates", (8, 8, 2, 2))),
        resblock_kernel_sizes=tuple(
            hifi.get("resblock_kernel_sizes", (3, 7, 11))
        ),
        resblock_dilations=tuple(
            map(tuple, hifi.get("resblock_dilation_sizes", ((1, 3, 5),) * 3))
        ),
    )
    out: Dict[str, Any] = {
        "params": {"text2mel": acoustic["params"], "mel2wav": voc}
    }
    if acoustic.get("batch_stats"):
        out["batch_stats"] = {"text2mel": acoustic["batch_stats"]}
    return out


def convert_checkpoint(
    task: str,
    state_dict: Dict[str, Any],
    conf: Dict[str, Any],
    n_channels: int = 80,
    version: str = "fastspeech2",
) -> Dict[str, Any]:
    """Dispatch a reference `state_dict` to the right importer using this
    framework's merged config (`viet_tts_tpu.config.build_config`)."""
    models = conf["models"]
    if task == "text2wav":
        return import_text2wav(state_dict, conf, version)
    if task == "fastspeech2":
        return import_fastspeech2(state_dict, models["fastspeech2"])
    if task == "adaspeech":
        return import_adaspeech(state_dict, models["adaspeech"])
    if task == "matcha":
        return import_matcha(state_dict, models["matcha"])
    if task == "jets":
        return import_jets(
            state_dict, models["jets"]["generator_params"], n_channels
        )
    if task == "vits2":
        return import_vits2(state_dict, models["vits2"])
    if task == "hifigan":
        hifi = models["hifigan"]
        return {
            "params": import_hifigan_generator(
                state_dict,
                upsample_scales=tuple(
                    hifi.get("upsample_rates", (8, 8, 2, 2))
                ),
                resblock_kernel_sizes=tuple(
                    hifi.get("resblock_kernel_sizes", (3, 7, 11))
                ),
                resblock_dilations=tuple(
                    map(
                        tuple,
                        hifi.get(
                            "resblock_dilation_sizes", ((1, 3, 5),) * 3
                        ),
                    )
                ),
            )
        }
    raise ValueError(f"unknown task {task!r}")


def main(argv=None):
    """Convert a reference torch checkpoint
    (`src/trainer/base.py:110-127`'s ``{"state_dict", "optimizer"}``
    payload, or a bare state_dict) into this framework's msgpack format,
    preserving the epoch/iteration encoded in the filename so
    resume-by-scan picks it up."""
    import argparse
    import os

    import torch

    from viet_tts_tpu.config import build_config, derive_task_config
    from viet_tts_tpu.train.checkpoint import (
        parse_checkpoint_name,
        save_checkpoint,
    )

    ap = argparse.ArgumentParser(
        description="Convert a reference PyTorch checkpoint to msgpack"
    )
    ap.add_argument("checkpoint", help="reference *_statedict.pt file")
    ap.add_argument("--task", required=True,
                    choices=["fastspeech2", "adaspeech", "matcha", "jets",
                             "vits2", "hifigan", "text2wav"])
    ap.add_argument("--config", default="config", help="config directory")
    ap.add_argument("--out", required=True, help="output checkpoint dir")
    ap.add_argument("--prefix", default=None,
                    help="output name prefix (default: reference convention "
                         "'generator' for GAN tasks, 'model' otherwise)")
    ap.add_argument("--version", default="fastspeech2",
                    choices=["fastspeech2", "adaspeech", "matcha"],
                    help="acoustic submodel of a text2wav joint checkpoint")
    args = ap.parse_args(argv)

    payload = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
    sd = payload.get("state_dict", payload) if isinstance(payload, dict) else payload

    conf = derive_task_config(build_config(args.config), args.task)
    variables = convert_checkpoint(args.task, sd, conf, version=args.version)
    try:
        epoch, iteration = parse_checkpoint_name(args.checkpoint)
    except ValueError:
        epoch, iteration = 0, 0
    prefix = args.prefix or (
        "generator"
        if args.task in ("jets", "vits2", "hifigan", "text2wav")
        else "model"
    )
    path = save_checkpoint(args.out, prefix, epoch, iteration, variables)
    n = len(
        [None for _ in __import__("flax").traverse_util.flatten_dict(
            variables.get("params", variables)
        )]
    )
    print(f"wrote {path} ({n} param leaves)")
    return path


if __name__ == "__main__":
    main()
