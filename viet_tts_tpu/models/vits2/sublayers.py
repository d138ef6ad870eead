"""VITS2 sublayers: WaveNet WN, DDS convs, flows, generator resblocks.

Parity with `models/gan_tts/vits2/sublayers.py`. Feature-last; weight norm
via flax WeightNorm / the shared WNConv1d.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from viet_tts_tpu.models.hifigan.generator import WNConv1d

LRELU_SLOPE = 0.1


class DDSConv(nn.Module):
    """Dilated depth-separable conv stack (`sublayers.py:78-125`)."""

    channels: int
    kernel_size: int
    n_layers: int
    p_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, x_mask, g=None, train: bool = False):
        """x: (B, T, C); x_mask: (B, T, 1)."""
        if g is not None:
            x = x + g
        for i in range(self.n_layers):
            dilation = self.kernel_size**i
            y = nn.Conv(
                self.channels,
                (self.kernel_size,),
                kernel_dilation=(dilation,),
                feature_group_count=self.channels,
                padding="SAME",
                name=f"conv_sep_{i}",
            )(x * x_mask)
            y = nn.LayerNorm(epsilon=1e-5, name=f"norm1_{i}")(y)
            y = nn.gelu(y, approximate=False)
            y = nn.Conv(self.channels, (1,), name=f"conv_1x1_{i}")(y)
            y = nn.LayerNorm(epsilon=1e-5, name=f"norm2_{i}")(y)
            y = nn.gelu(y, approximate=False)
            y = nn.Dropout(self.p_dropout)(y, deterministic=not train)
            x = x + y
        return x * x_mask


class WN(nn.Module):
    """WaveNet-style gated residual stack (`sublayers.py:127-213`)."""

    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    p_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, x_mask, g=None, train: bool = False):
        """x: (B, T, H); g: (B, gin) or None."""
        H = self.hidden_channels
        output = jnp.zeros_like(x)
        if g is not None and self.gin_channels > 0:
            g_all = WNConv1d(2 * H * self.n_layers, 1, name="cond_layer")(
                g[:, None, :]
            )  # (B, 1, 2H*L)
        for i in range(self.n_layers):
            dilation = self.dilation_rate**i
            x_in = WNConv1d(
                2 * H, self.kernel_size, dilation=dilation, name=f"in_{i}"
            )(x)
            if g is not None and self.gin_channels > 0:
                g_l = g_all[..., i * 2 * H : (i + 1) * 2 * H]
                x_in = x_in + g_l
            a, b = jnp.split(x_in, 2, axis=-1)
            acts = jnp.tanh(a) * nn.sigmoid(b)
            acts = nn.Dropout(self.p_dropout)(acts, deterministic=not train)
            out_ch = 2 * H if i < self.n_layers - 1 else H
            res_skip = WNConv1d(out_ch, 1, name=f"res_skip_{i}")(acts)
            if i < self.n_layers - 1:
                x = (x + res_skip[..., :H]) * x_mask
                output = output + res_skip[..., H:]
            else:
                output = output + res_skip
        return output * x_mask


class ResBlock1(nn.Module):
    """3x (dilated conv + 1-dilation conv) residual pairs
    (`sublayers.py:215-310`)."""

    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3, 5)

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            xt = nn.leaky_relu(x, LRELU_SLOPE)
            xt = WNConv1d(
                self.channels, self.kernel_size, dilation=d, name=f"conv1_{i}"
            )(xt)
            xt = nn.leaky_relu(xt, LRELU_SLOPE)
            xt = WNConv1d(self.channels, self.kernel_size, name=f"conv2_{i}")(xt)
            x = x + xt
        return x


class ResBlock2(nn.Module):
    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3)

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            xt = nn.leaky_relu(x, LRELU_SLOPE)
            xt = WNConv1d(
                self.channels, self.kernel_size, dilation=d, name=f"conv_{i}"
            )(xt)
            x = x + xt
        return x


# ---------------------------------------------------------------------------
# flows — every flow takes (x (B,T,C), x_mask (B,T,1)), returns (y, logdet)
# forward or y reverse (`sublayers.py:357-545`).
# ---------------------------------------------------------------------------


class LogFlow(nn.Module):
    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False, train: bool = False):
        if not reverse:
            y = jnp.log(jnp.maximum(x, 1e-5)) * x_mask
            logdet = jnp.sum(-y, axis=(1, 2))
            return y, logdet
        return jnp.exp(x) * x_mask


class Flip(nn.Module):
    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False, train: bool = False):
        x = jnp.flip(x, axis=-1)
        if not reverse:
            return x, jnp.zeros(x.shape[0], x.dtype)
        return x


class ElementwiseAffine(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False, train: bool = False):
        m = self.param("m", nn.initializers.zeros, (self.channels,))
        logs = self.param("logs", nn.initializers.zeros, (self.channels,))
        if not reverse:
            y = (m + jnp.exp(logs) * x) * x_mask
            logdet = jnp.sum(logs * x_mask, axis=(1, 2))
            return y, logdet
        return (x - m) * jnp.exp(-logs) * x_mask


class ResidualCouplingLayer(nn.Module):
    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    mean_only: bool = True

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False, train: bool = False):
        half = self.channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = nn.Conv(self.hidden_channels, (1,), name="pre")(x0) * x_mask
        h = WN(
            self.hidden_channels,
            self.kernel_size,
            self.dilation_rate,
            self.n_layers,
            self.gin_channels,
            name="enc",
        )(h, x_mask, g, train=train)
        stats = nn.Conv(
            half * (2 - int(self.mean_only)),
            (1,),
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="post",
        )(h) * x_mask
        if self.mean_only:
            m, logs = stats, jnp.zeros_like(stats)
        else:
            m, logs = jnp.split(stats, 2, axis=-1)
        if not reverse:
            x1 = (m + x1 * jnp.exp(logs)) * x_mask
            logdet = jnp.sum(logs, axis=(1, 2))
            return jnp.concatenate([x0, x1], axis=-1), logdet
        x1 = (x1 - m) * jnp.exp(-logs) * x_mask
        return jnp.concatenate([x0, x1], axis=-1)


class ConvFlow(nn.Module):
    """Rational-quadratic spline coupling flow (`sublayers.py:453-545`)."""

    in_channels: int
    filter_channels: int
    kernel_size: int
    n_layers: int
    num_bins: int = 10
    tail_bound: float = 5.0

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False, train: bool = False):
        from viet_tts_tpu.models.vits2.transforms import (
            unconstrained_rational_quadratic_spline,
        )

        half = self.in_channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = nn.Conv(self.filter_channels, (1,), name="pre")(x0)
        h = DDSConv(
            self.filter_channels, self.kernel_size, self.n_layers, name="convs"
        )(h, x_mask, g=g, train=train)
        h = nn.Conv(
            half * (self.num_bins * 3 - 1),
            (1,),
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="proj",
        )(h) * x_mask

        B, T, _ = x0.shape
        h = h.reshape(B, T, half, 3 * self.num_bins - 1)
        scale = jnp.sqrt(jnp.asarray(self.filter_channels, h.dtype))
        uw = h[..., : self.num_bins] / scale
        uh = h[..., self.num_bins : 2 * self.num_bins] / scale
        ud = h[..., 2 * self.num_bins :]

        y1, logabsdet = unconstrained_rational_quadratic_spline(
            x1, uw, uh, ud, inverse=reverse, tail_bound=self.tail_bound
        )
        y = jnp.concatenate([x0, y1], axis=-1) * x_mask
        logdet = jnp.sum(logabsdet * x_mask, axis=(1, 2))
        if not reverse:
            return y, logdet
        return y
