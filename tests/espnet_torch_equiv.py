"""Torch reimplementations of the espnet modules the reference's JETS uses.

espnet itself is not installed in this environment, but the reference's
`models/gan_tts/jets/model.py` composes espnet building blocks
(TransformerEncoder/ConformerEncoder, DurationPredictor, VariancePredictor,
StyleEncoder, HiFiGANGenerator, ...).  This module provides faithful,
TEST-ONLY torch equivalents written from espnet's public semantics, plus an
``install()`` hook that registers them under the espnet module paths so the
reference's own JETS orchestration code executes unmodified for
weight-import parity tests.

Component -> espnet source (for auditing):
  LayerNorm            espnet/nets/pytorch_backend/transformer/layer_norm.py
  MultiHeadedAttention espnet/nets/pytorch_backend/transformer/attention.py
  PositionalEncoding   espnet/nets/pytorch_backend/transformer/embedding.py
  MultiLayeredConv1d   espnet/nets/pytorch_backend/transformer/multi_layer_conv.py
  Encoder (transformer) espnet/nets/pytorch_backend/transformer/encoder.py
  Encoder (conformer)  espnet/nets/pytorch_backend/conformer/encoder.py
  DurationPredictor    espnet/nets/pytorch_backend/fastspeech/duration_predictor.py
  LengthRegulator      espnet/nets/pytorch_backend/fastspeech/length_regulator.py
  VariancePredictor    espnet2/tts/fastspeech2/variance_predictor.py
  StyleEncoder         espnet2/tts/gst/style_encoder.py
  get_random_segments  espnet2/gan_tts/utils/get_random_segments.py
  initialize           espnet2/torch_utils/initialize.py
"""

from __future__ import annotations

import math
import sys
import types

import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# nets_utils
# ---------------------------------------------------------------------------


def pad_list(xs, pad_value):
    n_batch = len(xs)
    max_len = max(x.size(0) for x in xs)
    pad = xs[0].new_full((n_batch, max_len, *xs[0].size()[1:]), pad_value)
    for i in range(n_batch):
        pad[i, : xs[i].size(0)] = xs[i]
    return pad


def make_pad_mask(lengths, maxlen=None):
    if not isinstance(lengths, torch.Tensor):
        lengths = torch.tensor(lengths)
    if maxlen is None:
        maxlen = int(lengths.max())
    seq = torch.arange(maxlen, device=lengths.device)
    return seq.unsqueeze(0) >= lengths.unsqueeze(1)


def make_non_pad_mask(lengths, maxlen=None):
    return ~make_pad_mask(lengths, maxlen)


# ---------------------------------------------------------------------------
# transformer pieces
# ---------------------------------------------------------------------------


class LayerNorm(nn.LayerNorm):
    """espnet LayerNorm: eps=1e-12, optional normalized dim."""

    def __init__(self, nout, dim=-1):
        super().__init__(nout, eps=1e-12)
        self.dim = dim

    def forward(self, x):
        if self.dim == -1:
            return super().forward(x)
        return super().forward(x.transpose(self.dim, -1)).transpose(self.dim, -1)


class MultiHeadedAttention(nn.Module):
    def __init__(self, n_head, n_feat, dropout_rate):
        super().__init__()
        assert n_feat % n_head == 0
        self.d_k = n_feat // n_head
        self.h = n_head
        self.linear_q = nn.Linear(n_feat, n_feat)
        self.linear_k = nn.Linear(n_feat, n_feat)
        self.linear_v = nn.Linear(n_feat, n_feat)
        self.linear_out = nn.Linear(n_feat, n_feat)
        self.dropout = nn.Dropout(p=dropout_rate)

    def forward_qkv(self, query, key, value):
        n_batch = query.size(0)
        q = self.linear_q(query).view(n_batch, -1, self.h, self.d_k).transpose(1, 2)
        k = self.linear_k(key).view(n_batch, -1, self.h, self.d_k).transpose(1, 2)
        v = self.linear_v(value).view(n_batch, -1, self.h, self.d_k).transpose(1, 2)
        return q, k, v

    def forward_attention(self, value, scores, mask):
        n_batch = value.size(0)
        if mask is not None:
            mask = mask.unsqueeze(1).eq(0)
            min_value = torch.finfo(scores.dtype).min
            scores = scores.masked_fill(mask, min_value)
            attn = torch.softmax(scores, dim=-1).masked_fill(mask, 0.0)
        else:
            attn = torch.softmax(scores, dim=-1)
        p_attn = self.dropout(attn)
        x = torch.matmul(p_attn, value)
        x = x.transpose(1, 2).contiguous().view(n_batch, -1, self.h * self.d_k)
        return self.linear_out(x)

    def forward(self, query, key, value, mask):
        q, k, v = self.forward_qkv(query, key, value)
        scores = torch.matmul(q, k.transpose(-2, -1)) / math.sqrt(self.d_k)
        return self.forward_attention(v, scores, mask)


class PositionalEncoding(nn.Module):
    def __init__(self, d_model, dropout_rate, max_len=5000):
        super().__init__()
        self.d_model = d_model
        self.xscale = math.sqrt(d_model)
        self.dropout = nn.Dropout(p=dropout_rate)
        self.pe = None
        self.extend_pe(torch.zeros(1, max_len))

    def extend_pe(self, x):
        if self.pe is not None and self.pe.size(1) >= x.size(1):
            return
        pe = torch.zeros(x.size(1), self.d_model)
        position = torch.arange(0, x.size(1), dtype=torch.float32).unsqueeze(1)
        div_term = torch.exp(
            torch.arange(0, self.d_model, 2, dtype=torch.float32)
            * -(math.log(10000.0) / self.d_model)
        )
        pe[:, 0::2] = torch.sin(position * div_term)
        pe[:, 1::2] = torch.cos(position * div_term)
        self.pe = pe.unsqueeze(0)

    def forward(self, x):
        self.extend_pe(x)
        x = x * self.xscale + self.pe[:, : x.size(1)].to(x.device, x.dtype)
        return self.dropout(x)


class ScaledPositionalEncoding(PositionalEncoding):
    def __init__(self, d_model, dropout_rate, max_len=5000):
        super().__init__(d_model, dropout_rate, max_len)
        self.alpha = nn.Parameter(torch.tensor(1.0))

    def forward(self, x):
        self.extend_pe(x)
        x = x + self.alpha * self.pe[:, : x.size(1)].to(x.device, x.dtype)
        return self.dropout(x)


class RelPositionalEncoding(nn.Module):
    """'latest' relative PE: returns (x*xscale, pos_emb of length 2T-1)."""

    def __init__(self, d_model, dropout_rate, max_len=5000):
        super().__init__()
        self.d_model = d_model
        self.xscale = math.sqrt(d_model)
        self.dropout = nn.Dropout(p=dropout_rate)
        self.pe = None
        self.extend_pe(torch.zeros(1, max_len))

    def extend_pe(self, x):
        if self.pe is not None and self.pe.size(1) >= x.size(1) * 2 - 1:
            return
        pe_positive = torch.zeros(x.size(1), self.d_model)
        pe_negative = torch.zeros(x.size(1), self.d_model)
        position = torch.arange(0, x.size(1), dtype=torch.float32).unsqueeze(1)
        div_term = torch.exp(
            torch.arange(0, self.d_model, 2, dtype=torch.float32)
            * -(math.log(10000.0) / self.d_model)
        )
        pe_positive[:, 0::2] = torch.sin(position * div_term)
        pe_positive[:, 1::2] = torch.cos(position * div_term)
        pe_negative[:, 0::2] = torch.sin(-1 * position * div_term)
        pe_negative[:, 1::2] = torch.cos(-1 * position * div_term)
        pe_positive = torch.flip(pe_positive, [0]).unsqueeze(0)
        pe_negative = pe_negative[1:].unsqueeze(0)
        self.pe = torch.cat([pe_positive, pe_negative], dim=1)

    def forward(self, x):
        self.extend_pe(x)
        x = x * self.xscale
        center = self.pe.size(1) // 2
        pos_emb = self.pe[:, center - x.size(1) + 1 : center + x.size(1)]
        return self.dropout(x), self.dropout(pos_emb.to(x.device, x.dtype))


class LegacyRelPositionalEncoding(PositionalEncoding):
    """'legacy' relative PE: positive-position table of length T."""

    def forward(self, x):
        self.extend_pe(x)
        x = x * self.xscale
        pos_emb = self.pe[:, : x.size(1)].to(x.device, x.dtype)
        return self.dropout(x), self.dropout(pos_emb)


class RelPositionMultiHeadedAttention(MultiHeadedAttention):
    """Transformer-XL style attention, espnet 'latest' variant."""

    def __init__(self, n_head, n_feat, dropout_rate, zero_triu=False):
        super().__init__(n_head, n_feat, dropout_rate)
        self.zero_triu = zero_triu
        self.linear_pos = nn.Linear(n_feat, n_feat, bias=False)
        self.pos_bias_u = nn.Parameter(torch.zeros(self.h, self.d_k))
        self.pos_bias_v = nn.Parameter(torch.zeros(self.h, self.d_k))
        nn.init.xavier_uniform_(self.pos_bias_u)
        nn.init.xavier_uniform_(self.pos_bias_v)

    def rel_shift(self, x):
        zero_pad = torch.zeros((*x.size()[:3], 1), device=x.device, dtype=x.dtype)
        x_padded = torch.cat([zero_pad, x], dim=-1)
        x_padded = x_padded.view(*x.size()[:2], x.size(3) + 1, x.size(2))
        x = x_padded[:, :, 1:].view_as(x)[:, :, :, : x.size(-1) // 2 + 1]
        return x

    def forward(self, query, key, value, pos_emb, mask):
        q, k, v = self.forward_qkv(query, key, value)
        q = q.transpose(1, 2)  # (b, t, h, d_k)
        n_batch_pos = pos_emb.size(0)
        p = self.linear_pos(pos_emb).view(n_batch_pos, -1, self.h, self.d_k)
        p = p.transpose(1, 2)
        q_with_bias_u = (q + self.pos_bias_u).transpose(1, 2)
        q_with_bias_v = (q + self.pos_bias_v).transpose(1, 2)
        matrix_ac = torch.matmul(q_with_bias_u, k.transpose(-2, -1))
        matrix_bd = torch.matmul(q_with_bias_v, p.transpose(-2, -1))
        matrix_bd = self.rel_shift(matrix_bd)
        scores = (matrix_ac + matrix_bd) / math.sqrt(self.d_k)
        return self.forward_attention(v, scores, mask)


class LegacyRelPositionMultiHeadedAttention(RelPositionMultiHeadedAttention):
    """espnet 'legacy' variant: pos_emb has length T, older rel-shift."""

    def rel_shift(self, x):
        zero_pad = torch.zeros((*x.size()[:3], 1), device=x.device, dtype=x.dtype)
        x_padded = torch.cat([zero_pad, x], dim=-1)
        x_padded = x_padded.view(*x.size()[:2], x.size(3) + 1, x.size(2))
        x = x_padded[:, :, 1:].view_as(x)
        if self.zero_triu:
            ones = torch.ones((x.size(2), x.size(3)), device=x.device)
            x = x * torch.tril(ones, x.size(3) - x.size(2))[None, None, :, :]
        return x


class MultiLayeredConv1d(nn.Module):
    def __init__(self, in_chans, hidden_chans, kernel_size, dropout_rate):
        super().__init__()
        self.w_1 = nn.Conv1d(
            in_chans, hidden_chans, kernel_size, stride=1,
            padding=(kernel_size - 1) // 2,
        )
        self.w_2 = nn.Conv1d(
            hidden_chans, in_chans, kernel_size, stride=1,
            padding=(kernel_size - 1) // 2,
        )
        self.dropout = nn.Dropout(dropout_rate)

    def forward(self, x):
        x = torch.relu(self.w_1(x.transpose(-1, 1))).transpose(-1, 1)
        return self.w_2(self.dropout(x).transpose(-1, 1)).transpose(-1, 1)


class PositionwiseFeedForward(nn.Module):
    def __init__(self, idim, hidden_units, dropout_rate, activation=None):
        super().__init__()
        self.w_1 = nn.Linear(idim, hidden_units)
        self.w_2 = nn.Linear(hidden_units, idim)
        self.dropout = nn.Dropout(dropout_rate)
        self.activation = activation if activation is not None else nn.ReLU()

    def forward(self, x):
        return self.w_2(self.dropout(self.activation(self.w_1(x))))


class TransformerEncoderLayer(nn.Module):
    def __init__(self, size, self_attn, feed_forward, dropout_rate,
                 normalize_before=True, concat_after=False):
        super().__init__()
        assert not concat_after, "concat_after not needed by the reference"
        self.self_attn = self_attn
        self.feed_forward = feed_forward
        self.norm1 = LayerNorm(size)
        self.norm2 = LayerNorm(size)
        self.dropout = nn.Dropout(dropout_rate)
        self.normalize_before = normalize_before

    def forward(self, x, mask):
        residual = x
        if self.normalize_before:
            x = self.norm1(x)
        x = residual + self.dropout(self.self_attn(x, x, x, mask))
        if not self.normalize_before:
            x = self.norm1(x)
        residual = x
        if self.normalize_before:
            x = self.norm2(x)
        x = residual + self.dropout(self.feed_forward(x))
        if not self.normalize_before:
            x = self.norm2(x)
        return x, mask


class TransformerEncoder(nn.Module):
    """espnet transformer Encoder as the reference JETS instantiates it."""

    def __init__(self, idim, attention_dim=256, attention_heads=4,
                 linear_units=2048, num_blocks=6, input_layer=None,
                 dropout_rate=0.1, positional_dropout_rate=0.1,
                 attention_dropout_rate=0.0, pos_enc_class=PositionalEncoding,
                 normalize_before=True, concat_after=False,
                 positionwise_layer_type="conv1d",
                 positionwise_conv_kernel_size=1):
        super().__init__()
        if input_layer is None:
            self.embed = nn.Sequential(
                pos_enc_class(attention_dim, positional_dropout_rate)
            )
        else:
            self.embed = nn.Sequential(
                input_layer, pos_enc_class(attention_dim, positional_dropout_rate)
            )

        def make_positionwise():
            if positionwise_layer_type == "linear":
                return PositionwiseFeedForward(
                    attention_dim, linear_units, dropout_rate
                )
            if positionwise_layer_type == "conv1d":
                return MultiLayeredConv1d(
                    attention_dim, linear_units,
                    positionwise_conv_kernel_size, dropout_rate,
                )
            raise NotImplementedError(positionwise_layer_type)

        self.encoders = nn.ModuleList(
            [
                TransformerEncoderLayer(
                    attention_dim,
                    MultiHeadedAttention(
                        attention_heads, attention_dim, attention_dropout_rate
                    ),
                    make_positionwise(),
                    dropout_rate,
                    normalize_before,
                    concat_after,
                )
                for _ in range(num_blocks)
            ]
        )
        self.normalize_before = normalize_before
        if normalize_before:
            self.after_norm = LayerNorm(attention_dim)

    def forward(self, xs, masks):
        xs = self.embed(xs)
        for layer in self.encoders:
            xs, masks = layer(xs, masks)
        if self.normalize_before:
            xs = self.after_norm(xs)
        return xs, masks


# ---------------------------------------------------------------------------
# conformer pieces
# ---------------------------------------------------------------------------


class Swish(nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(x)


class ConvolutionModule(nn.Module):
    def __init__(self, channels, kernel_size, activation=None, bias=True):
        super().__init__()
        assert (kernel_size - 1) % 2 == 0
        self.pointwise_conv1 = nn.Conv1d(channels, 2 * channels, 1, 1, 0, bias=bias)
        self.depthwise_conv = nn.Conv1d(
            channels, channels, kernel_size, 1,
            (kernel_size - 1) // 2, groups=channels, bias=bias,
        )
        self.norm = nn.BatchNorm1d(channels)
        self.pointwise_conv2 = nn.Conv1d(channels, channels, 1, 1, 0, bias=bias)
        self.activation = activation if activation is not None else Swish()

    def forward(self, x):
        x = x.transpose(1, 2)
        x = self.pointwise_conv1(x)
        x = F.glu(x, dim=1)
        x = self.depthwise_conv(x)
        x = self.activation(self.norm(x))
        x = self.pointwise_conv2(x)
        return x.transpose(1, 2)


class ConformerEncoderLayer(nn.Module):
    def __init__(self, size, self_attn, feed_forward, feed_forward_macaron,
                 conv_module, dropout_rate, normalize_before=True):
        super().__init__()
        self.self_attn = self_attn
        self.feed_forward = feed_forward
        self.feed_forward_macaron = feed_forward_macaron
        self.conv_module = conv_module
        self.norm_ff = LayerNorm(size)
        self.norm_mha = LayerNorm(size)
        if feed_forward_macaron is not None:
            self.norm_ff_macaron = LayerNorm(size)
            self.ff_scale = 0.5
        else:
            self.ff_scale = 1.0
        if conv_module is not None:
            self.norm_conv = LayerNorm(size)
            self.norm_final = LayerNorm(size)
        self.dropout = nn.Dropout(dropout_rate)
        self.normalize_before = normalize_before
        assert normalize_before

    def forward(self, x_input, mask):
        if isinstance(x_input, tuple):
            x, pos_emb = x_input
        else:
            x, pos_emb = x_input, None

        if self.feed_forward_macaron is not None:
            residual = x
            x = self.norm_ff_macaron(x)
            x = residual + self.ff_scale * self.dropout(self.feed_forward_macaron(x))

        residual = x
        x = self.norm_mha(x)
        if pos_emb is not None:
            x_att = self.self_attn(x, x, x, pos_emb, mask)
        else:
            x_att = self.self_attn(x, x, x, mask)
        x = residual + self.dropout(x_att)

        if self.conv_module is not None:
            residual = x
            x = self.norm_conv(x)
            x = residual + self.dropout(self.conv_module(x))

        residual = x
        x = self.norm_ff(x)
        x = residual + self.ff_scale * self.dropout(self.feed_forward(x))

        if self.conv_module is not None:
            x = self.norm_final(x)

        if pos_emb is not None:
            return (x, pos_emb), mask
        return x, mask


class ConformerEncoder(nn.Module):
    """espnet conformer Encoder as the reference JETS instantiates it."""

    def __init__(self, idim, attention_dim=256, attention_heads=4,
                 linear_units=2048, num_blocks=6, input_layer=None,
                 dropout_rate=0.1, positional_dropout_rate=0.1,
                 attention_dropout_rate=0.0, normalize_before=True,
                 concat_after=False, positionwise_layer_type="conv1d",
                 positionwise_conv_kernel_size=1, macaron_style=True,
                 pos_enc_layer_type="rel_pos",
                 selfattention_layer_type="rel_selfattn",
                 activation_type="swish", use_cnn_module=True,
                 cnn_module_kernel=31, zero_triu=False):
        super().__init__()
        assert not concat_after
        activation = Swish() if activation_type == "swish" else nn.ReLU()
        if pos_enc_layer_type == "rel_pos":
            pos_enc_class = RelPositionalEncoding
            assert selfattention_layer_type == "rel_selfattn"
            attn_class = RelPositionMultiHeadedAttention
        elif pos_enc_layer_type == "legacy_rel_pos":
            pos_enc_class = LegacyRelPositionalEncoding
            assert selfattention_layer_type == "legacy_rel_selfattn"
            attn_class = LegacyRelPositionMultiHeadedAttention
        else:
            raise NotImplementedError(pos_enc_layer_type)

        if input_layer is None:
            self.embed = nn.Sequential(
                pos_enc_class(attention_dim, positional_dropout_rate)
            )
        else:
            self.embed = nn.Sequential(
                input_layer, pos_enc_class(attention_dim, positional_dropout_rate)
            )

        def make_positionwise():
            if positionwise_layer_type == "linear":
                return PositionwiseFeedForward(
                    attention_dim, linear_units, dropout_rate, Swish()
                    if activation_type == "swish" else None
                )
            if positionwise_layer_type == "conv1d":
                return MultiLayeredConv1d(
                    attention_dim, linear_units,
                    positionwise_conv_kernel_size, dropout_rate,
                )
            raise NotImplementedError(positionwise_layer_type)

        self.encoders = nn.ModuleList(
            [
                ConformerEncoderLayer(
                    attention_dim,
                    attn_class(
                        attention_heads, attention_dim,
                        attention_dropout_rate, zero_triu,
                    ),
                    make_positionwise(),
                    make_positionwise() if macaron_style else None,
                    ConvolutionModule(attention_dim, cnn_module_kernel, activation)
                    if use_cnn_module else None,
                    dropout_rate,
                    normalize_before,
                )
                for _ in range(num_blocks)
            ]
        )
        self.normalize_before = normalize_before
        if normalize_before:
            self.after_norm = LayerNorm(attention_dim)

    def forward(self, xs, masks):
        xs = self.embed(xs)
        for layer in self.encoders:
            xs, masks = layer(xs, masks)
        if isinstance(xs, tuple):
            xs = xs[0]
        if self.normalize_before:
            xs = self.after_norm(xs)
        return xs, masks


# ---------------------------------------------------------------------------
# fastspeech predictors
# ---------------------------------------------------------------------------


class DurationPredictor(nn.Module):
    def __init__(self, idim, n_layers=2, n_chans=384, kernel_size=3,
                 dropout_rate=0.1, offset=1.0):
        super().__init__()
        self.offset = offset
        self.conv = nn.ModuleList()
        for idx in range(n_layers):
            in_chans = idim if idx == 0 else n_chans
            self.conv += [
                nn.Sequential(
                    nn.Conv1d(in_chans, n_chans, kernel_size,
                              stride=1, padding=(kernel_size - 1) // 2),
                    nn.ReLU(),
                    LayerNorm(n_chans, dim=1),
                    nn.Dropout(dropout_rate),
                )
            ]
        self.linear = nn.Linear(n_chans, 1)

    def _forward(self, xs, x_masks=None, is_inference=False):
        xs = xs.transpose(1, -1)
        for f in self.conv:
            xs = f(xs)
        xs = self.linear(xs.transpose(1, -1)).squeeze(-1)
        if is_inference:
            xs = torch.clamp(torch.round(xs.exp() - self.offset), min=0).long()
        if x_masks is not None:
            xs = xs.masked_fill(x_masks, 0.0)
        return xs

    def forward(self, xs, x_masks=None):
        return self._forward(xs, x_masks, False)

    def inference(self, xs, x_masks=None):
        return self._forward(xs, x_masks, True)


class DurationPredictorLoss(nn.Module):
    """espnet duration loss: MSE against log(target + offset)."""

    def __init__(self, offset=1.0, reduction="mean"):
        super().__init__()
        self.criterion = nn.MSELoss(reduction=reduction)
        self.offset = offset

    def forward(self, outputs, targets):
        targets = torch.log(targets.float() + self.offset)
        return self.criterion(outputs, targets)


class VariancePredictor(nn.Module):
    def __init__(self, idim, n_layers=2, n_chans=384, kernel_size=3,
                 bias=True, dropout_rate=0.5):
        super().__init__()
        self.conv = nn.ModuleList()
        for idx in range(n_layers):
            in_chans = idim if idx == 0 else n_chans
            self.conv += [
                nn.Sequential(
                    nn.Conv1d(in_chans, n_chans, kernel_size, stride=1,
                              padding=(kernel_size - 1) // 2, bias=bias),
                    nn.ReLU(),
                    LayerNorm(n_chans, dim=1),
                    nn.Dropout(dropout_rate),
                )
            ]
        self.linear = nn.Linear(n_chans, 1)

    def forward(self, xs, x_masks=None):
        xs = xs.transpose(1, -1)
        for f in self.conv:
            xs = f(xs)
        xs = self.linear(xs.transpose(1, 2))
        if x_masks is not None:
            xs = xs.masked_fill(x_masks, 0.0)
        return xs


class LengthRegulator(nn.Module):
    def __init__(self, pad_value=0.0):
        super().__init__()
        self.pad_value = pad_value

    def forward(self, xs, ds, alpha=1.0):
        if alpha != 1.0:
            ds = torch.round(ds.float() * alpha).long()
        if ds.sum() == 0:
            ds[ds.sum(dim=1).eq(0)] = 1
        repeat = [
            torch.repeat_interleave(x, d, dim=0) for x, d in zip(xs, ds.long())
        ]
        return pad_list(repeat, self.pad_value)


# ---------------------------------------------------------------------------
# GST style encoder
# ---------------------------------------------------------------------------


class ReferenceEncoder(nn.Module):
    def __init__(self, idim=80, conv_layers=6,
                 conv_chans_list=(32, 32, 64, 64, 128, 128),
                 conv_kernel_size=3, conv_stride=2, gru_layers=1,
                 gru_units=128):
        super().__init__()
        assert conv_kernel_size % 2 == 1
        assert len(conv_chans_list) == conv_layers
        convs = []
        padding = (conv_kernel_size - 1) // 2
        for i in range(conv_layers):
            conv_in_chans = 1 if i == 0 else conv_chans_list[i - 1]
            conv_out_chans = conv_chans_list[i]
            convs += [
                nn.Conv2d(conv_in_chans, conv_out_chans, conv_kernel_size,
                          stride=conv_stride, padding=padding, bias=False),
                nn.BatchNorm2d(conv_out_chans),
                nn.ReLU(inplace=True),
            ]
        self.convs = nn.Sequential(*convs)
        self.conv_layers = conv_layers
        self.kernel_size = conv_kernel_size
        self.stride = conv_stride
        self.padding = padding
        gru_in_units = idim
        for i in range(conv_layers):
            gru_in_units = (
                gru_in_units - conv_kernel_size + 2 * padding
            ) // conv_stride + 1
        gru_in_units *= conv_out_chans
        self.gru = nn.GRU(gru_in_units, gru_units, gru_layers, batch_first=True)

    def forward(self, speech):
        batch_size = speech.size(0)
        xs = speech.unsqueeze(1)  # (B, 1, T, idim)
        hs = self.convs(xs).transpose(1, 2)  # (B, T', C, idim')
        time_length = hs.size(1)
        hs = hs.contiguous().view(batch_size, time_length, -1)
        self.gru.flatten_parameters()
        _, ref_embs = self.gru(hs)
        return ref_embs[-1]  # (B, gru_units)


class StyleTokenLayer(nn.Module):
    def __init__(self, ref_embed_dim=128, gst_tokens=10, gst_token_dim=256,
                 gst_heads=4, dropout_rate=0.0):
        super().__init__()
        gst_embs = torch.randn(gst_tokens, gst_token_dim // gst_heads)
        self.register_parameter("gst_embs", nn.Parameter(gst_embs))
        self.mha = _GSTMultiHeadedAttention(
            q_dim=ref_embed_dim,
            k_dim=gst_token_dim // gst_heads,
            v_dim=gst_token_dim // gst_heads,
            n_head=gst_heads,
            n_feat=gst_token_dim,
            dropout_rate=dropout_rate,
        )

    def forward(self, ref_embs):
        batch_size = ref_embs.size(0)
        gst_embs = torch.tanh(self.gst_embs).unsqueeze(0).expand(batch_size, -1, -1)
        ref_embs = ref_embs.unsqueeze(1)
        style_embs = self.mha(ref_embs, gst_embs, gst_embs, None)
        return style_embs.squeeze(1)


class _GSTMultiHeadedAttention(MultiHeadedAttention):
    """espnet GST MHA with distinct q/k/v input dims."""

    def __init__(self, q_dim, k_dim, v_dim, n_head, n_feat, dropout_rate=0.0):
        super().__init__(n_head, n_feat, dropout_rate)
        self.linear_q = nn.Linear(q_dim, n_feat)
        self.linear_k = nn.Linear(k_dim, n_feat)
        self.linear_v = nn.Linear(v_dim, n_feat)


class StyleEncoder(nn.Module):
    def __init__(self, idim=80, gst_tokens=10, gst_token_dim=256, gst_heads=4,
                 conv_layers=6, conv_chans_list=(32, 32, 64, 64, 128, 128),
                 conv_kernel_size=3, conv_stride=2, gru_layers=1,
                 gru_units=128):
        super().__init__()
        self.ref_enc = ReferenceEncoder(
            idim=idim, conv_layers=conv_layers,
            conv_chans_list=conv_chans_list,
            conv_kernel_size=conv_kernel_size, conv_stride=conv_stride,
            gru_layers=gru_layers, gru_units=gru_units,
        )
        self.stl = StyleTokenLayer(
            ref_embed_dim=gru_units, gst_tokens=gst_tokens,
            gst_token_dim=gst_token_dim, gst_heads=gst_heads,
        )

    def forward(self, speech):
        ref_embs = self.ref_enc(speech)
        return self.stl(ref_embs)


# ---------------------------------------------------------------------------
# espnet2 gan utils + initialize
# ---------------------------------------------------------------------------


def get_segments(x, start_idxs, segment_size):
    b, c, t = x.size()
    segments = x.new_zeros(b, c, segment_size)
    for i, start_idx in enumerate(start_idxs):
        segments[i] = x[i, :, start_idx : start_idx + segment_size]
    return segments


def get_random_segments(x, x_lengths, segment_size):
    b, c, t = x.size()
    max_start_idx = x_lengths - segment_size
    max_start_idx = torch.clamp(max_start_idx, min=0)
    start_idxs = (torch.rand([b]).to(x.device) * max_start_idx).to(torch.long)
    segments = get_segments(x, start_idxs, segment_size)
    return segments, start_idxs


def _maximum_path_each(value, t_x, t_y, max_neg=-1e9):
    """VITS monotonic_align core (numpy, per-utterance)."""
    path = np.zeros((value.shape[0], value.shape[1]), dtype=np.float32)
    for y in range(t_y):
        for x in range(max(0, t_x + y - t_y), min(t_x, y + 1)):
            v_cur = max_neg if x == y else value[x, y - 1]
            if x == 0:
                v_prev = 0.0 if y == 0 else max_neg
            else:
                v_prev = value[x - 1, y - 1]
            value[x, y] = max(v_cur, v_prev) + value[x, y]
    index = t_x - 1
    for y in range(t_y - 1, -1, -1):
        path[index, y] = 1.0
        if index != 0 and (
            index == y or value[index, y - 1] < value[index - 1, y - 1]
        ):
            index -= 1
    return path


def vits_maximum_path(neg_cent, mask):
    """espnet2.gan_tts.vits.monotonic_align.maximum_path equivalent.

    neg_cent/mask: (B, t_x, t_y) torch tensors; returns the hard monotonic
    path maximising the masked score.
    """
    import numpy as _np

    device, dtype = neg_cent.device, neg_cent.dtype
    v = (neg_cent * mask).detach().cpu().numpy().astype(_np.float64)
    t_xs = mask[:, :, 0].sum(1).cpu().numpy().astype(int)
    t_ys = mask[:, 0, :].sum(1).cpu().numpy().astype(int)
    paths = _np.zeros_like(v, dtype=_np.float32)
    for b in range(v.shape[0]):
        paths[b, : t_xs[b], : t_ys[b]] = _maximum_path_each(
            v[b, : t_xs[b], : t_ys[b]].copy(), int(t_xs[b]), int(t_ys[b])
        )
    return torch.from_numpy(paths).to(device=device, dtype=dtype)


def initialize(model, init):
    """espnet2 initialize: weight init on dim>1, zero biases, then reset
    Embedding/LayerNorm/GroupNorm to their default init."""
    for p in model.parameters():
        if p.dim() > 1:
            if init == "xavier_uniform":
                nn.init.xavier_uniform_(p.data)
            elif init == "xavier_normal":
                nn.init.xavier_normal_(p.data)
            elif init == "kaiming_uniform":
                nn.init.kaiming_uniform_(p.data, nonlinearity="relu")
            elif init == "kaiming_normal":
                nn.init.kaiming_normal_(p.data, nonlinearity="relu")
            else:
                raise ValueError("Unknown initialization: " + init)
    for p in model.parameters():
        if p.dim() == 1:
            p.data.zero_()
    for m in model.modules():
        if isinstance(m, (nn.Embedding, nn.LayerNorm, nn.GroupNorm)):
            m.reset_parameters()


# ---------------------------------------------------------------------------
# module installation
# ---------------------------------------------------------------------------


def _module(name, **attrs):
    m = sys.modules.get(name)
    if m is None:
        m = types.ModuleType(name)
        sys.modules[name] = m
    for k, v in attrs.items():
        setattr(m, k, v)
    return m


def install(reference_root="/root/reference"):
    """Register the equivalents under espnet module paths and return the
    reference's vendored HiFiGAN (used as espnet2's HiFiGANGenerator —
    the reference vendored it verbatim from espnet2)."""
    for name in [
        "espnet", "espnet.nets", "espnet.nets.pytorch_backend",
        "espnet.nets.pytorch_backend.transformer",
        "espnet.nets.pytorch_backend.conformer",
        "espnet.nets.pytorch_backend.fastspeech",
        "espnet2", "espnet2.tts", "espnet2.tts.fastspeech2",
        "espnet2.tts.gst", "espnet2.gan_tts", "espnet2.torch_utils",
    ]:
        _module(name)

    _module(
        "espnet.nets.pytorch_backend.nets_utils",
        make_pad_mask=make_pad_mask,
        make_non_pad_mask=make_non_pad_mask,
        pad_list=pad_list,
    )
    _module(
        "espnet.nets.pytorch_backend.transformer.embedding",
        PositionalEncoding=PositionalEncoding,
        ScaledPositionalEncoding=ScaledPositionalEncoding,
        RelPositionalEncoding=RelPositionalEncoding,
        LegacyRelPositionalEncoding=LegacyRelPositionalEncoding,
    )
    _module(
        "espnet.nets.pytorch_backend.transformer.encoder",
        Encoder=TransformerEncoder,
    )
    _module(
        "espnet.nets.pytorch_backend.conformer.encoder",
        Encoder=ConformerEncoder,
    )
    _module(
        "espnet.nets.pytorch_backend.fastspeech.duration_predictor",
        DurationPredictor=DurationPredictor,
        DurationPredictorLoss=DurationPredictorLoss,
    )
    _module(
        "espnet.nets.pytorch_backend.fastspeech.length_regulator",
        LengthRegulator=LengthRegulator,
    )
    _module(
        "espnet2.tts.fastspeech2.variance_predictor",
        VariancePredictor=VariancePredictor,
    )
    _module(
        "espnet2.tts.gst.style_encoder",
        StyleEncoder=StyleEncoder,
        ReferenceEncoder=ReferenceEncoder,
    )
    _module(
        "espnet2.gan_tts.utils",
        get_random_segments=get_random_segments,
        get_segments=get_segments,
    )
    _module("espnet2.torch_utils.initialize", initialize=initialize)
    vits_pkg = _module("espnet2.gan_tts.vits")
    vits_pkg.monotonic_align = _module(
        "espnet2.gan_tts.vits.monotonic_align", maximum_path=vits_maximum_path
    )

    numba = sys.modules.get("numba")
    if numba is None:
        numba = types.ModuleType("numba")
        sys.modules["numba"] = numba
    numba.jit = lambda *a, **k: (a[0] if a and callable(a[0]) else (lambda f: f))
    numba.prange = range

    # deps of the reference's vendored hifigan package (loss.py etc.)
    _module("humanfriendly", parse_size=lambda s: 16000)
    _module("typeguard", check_argument_types=lambda: True)
    _module("espnet2.layers")
    _module("espnet2.layers.log_mel", LogMel=nn.Module)
    _module("espnet2.layers.stft", Stft=nn.Module)
    _module("espnet2.tts.feats_extract")
    _module(
        "espnet2.tts.feats_extract.abs_feats_extract", AbsFeatsExtract=nn.Module
    )

    # the reference's vendored HiFiGAN == espnet2's HiFiGANGenerator
    if reference_root not in sys.path:
        sys.path.insert(0, reference_root)
    try:
        from models.gan_tts.hifigan.generator import HiFiGAN
        from models.gan_tts.hifigan import loss as hifigan_loss
    finally:
        sys.path.remove(reference_root)
    _module("espnet2.gan_tts.hifigan", HiFiGANGenerator=HiFiGAN)
    sys.modules["espnet2.gan_tts.hifigan.loss"] = hifigan_loss
    return HiFiGAN


# ---------------------------------------------------------------------------
# diffusers equivalents (for the reference Matcha UNet; diffusers is not
# installed). Faithful to diffusers.models.attention_processor.Attention's
# default processor semantics: a FLOAT attention_mask is ADDED to the
# attention logits (baddbmm beta=1 / sdpa float attn_mask), not -inf-masked.
# ---------------------------------------------------------------------------


def maybe_allow_in_graph(cls):
    return cls


class LoRACompatibleLinear(nn.Linear):
    pass


class DiffusersAttention(nn.Module):
    def __init__(self, query_dim, heads=8, dim_head=64, dropout=0.0,
                 bias=False, cross_attention_dim=None, upcast_attention=False,
                 **kwargs):
        super().__init__()
        inner_dim = dim_head * heads
        self.heads = heads
        self.scale = dim_head**-0.5
        self.to_q = nn.Linear(query_dim, inner_dim, bias=bias)
        self.to_k = nn.Linear(cross_attention_dim or query_dim, inner_dim, bias=bias)
        self.to_v = nn.Linear(cross_attention_dim or query_dim, inner_dim, bias=bias)
        self.to_out = nn.ModuleList([nn.Linear(inner_dim, query_dim), nn.Dropout(dropout)])

    def _heads(self, x):
        b, t, _ = x.shape
        return (
            x.view(b, t, self.heads, -1).permute(0, 2, 1, 3)
            .reshape(b * self.heads, t, -1)
        )

    def forward(self, hidden_states, encoder_hidden_states=None,
                attention_mask=None, **kwargs):
        b, t, _ = hidden_states.shape
        ctx = hidden_states if encoder_hidden_states is None else encoder_hidden_states
        q = self._heads(self.to_q(hidden_states))
        k = self._heads(self.to_k(ctx))
        v = self._heads(self.to_v(ctx))
        scores = torch.bmm(q, k.transpose(-1, -2)) * self.scale
        if attention_mask is not None:
            if attention_mask.shape[-1] != ctx.shape[1]:
                attention_mask = F.pad(
                    attention_mask, (0, ctx.shape[1] - attention_mask.shape[-1])
                )
            mask = attention_mask.repeat_interleave(self.heads, dim=0)
            scores = scores + mask[:, None, :].to(scores.dtype)  # ADDITIVE
        probs = scores.softmax(dim=-1)
        out = torch.bmm(probs, v)
        out = (
            out.reshape(b, self.heads, t, -1).permute(0, 2, 1, 3)
            .reshape(b, t, -1)
        )
        out = self.to_out[0](out)
        return self.to_out[1](out)


class DiffusersGELU(nn.Module):
    def __init__(self, dim_in, dim_out, approximate="none"):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out)
        self.approximate = approximate

    def forward(self, x):
        return F.gelu(self.proj(x), approximate=self.approximate)


class DiffusersGEGLU(nn.Module):
    def __init__(self, dim_in, dim_out):
        super().__init__()
        self.proj = LoRACompatibleLinear(dim_in, dim_out * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class DiffusersApproximateGELU(nn.Module):
    def __init__(self, dim_in, dim_out):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out)

    def forward(self, x):
        x = self.proj(x)
        return x * torch.sigmoid(1.702 * x)


class _AdaNormUnused(nn.Module):
    def __init__(self, *a, **k):
        super().__init__()
        raise NotImplementedError("ada norm not used by the reference config")


def install_diffusers():
    """Register the diffusers equivalents (for the reference Matcha UNet)."""
    _module("diffusers")
    _module("diffusers.models")
    _module(
        "diffusers.models.attention",
        GEGLU=DiffusersGEGLU,
        GELU=DiffusersGELU,
        ApproximateGELU=DiffusersApproximateGELU,
        AdaLayerNorm=_AdaNormUnused,
        AdaLayerNormZero=_AdaNormUnused,
    )
    _module(
        "diffusers.models.attention_processor", Attention=DiffusersAttention
    )
    _module("diffusers.models.lora", LoRACompatibleLinear=LoRACompatibleLinear)
    _module("diffusers.utils")
    _module(
        "diffusers.utils.torch_utils", maybe_allow_in_graph=maybe_allow_in_graph
    )
