"""HiFi-GAN discriminators (flax): MPD (periods 2/3/5/7/11) + MSD.

Parity with `models/gan_tts/hifigan/discriminator.py`. Each discriminator
returns the list of per-layer feature maps (final logits last); the
combined MSMPD returns msd_outs + mpd_outs as a flat list of lists, exactly
the structure the GAN losses consume.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import flax.linen as nn
import jax.numpy as jnp

from viet_tts_tpu.models.hifigan.generator import WNConv1d

_INIT = nn.initializers.normal(0.01)


class PeriodDiscriminator(nn.Module):
    """Reshape waveform to (T/P, P) and run strided 2-D convs
    (`discriminator.py:25-145`)."""

    period: int = 3
    out_channels: int = 1
    kernel_sizes: Sequence[int] = (5, 3)
    channels: int = 32
    downsample_scales: Sequence[int] = (3, 3, 3, 3, 1)
    max_downsample_channels: int = 1024
    lrelu_slope: float = 0.1
    use_weight_norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        # x: (B, T, 1) -> pad to multiple of period -> (B, T/P, P, C)
        B, T, C = x.shape
        if T % self.period != 0:
            n_pad = self.period - (T % self.period)
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)), mode="reflect")
            T += n_pad
        x = x.reshape(B, T // self.period, self.period, C)

        outs = []
        in_ch = self.channels
        k = self.kernel_sizes[0]
        for i, scale in enumerate(self.downsample_scales):
            conv = nn.Conv(
                in_ch,
                (k, 1),
                strides=(scale, 1),
                padding=(((k - 1) // 2, (k - 1) // 2), (0, 0)),
                kernel_init=_INIT,
                name=f"conv_{i}",
            )
            if self.use_weight_norm:
                conv = nn.WeightNorm(conv, name=f"wn_{i}")
            x = nn.leaky_relu(conv(x), self.lrelu_slope)
            outs.append(x)
            in_ch = min(in_ch * 4, self.max_downsample_channels)

        k2 = self.kernel_sizes[1]
        out_conv = nn.Conv(
            self.out_channels,
            (k2 - 1, 1),
            padding=(((k2 - 1) // 2, (k2 - 1) // 2), (0, 0)),
            kernel_init=_INIT,
            name="output_conv",
        )
        if self.use_weight_norm:
            out_conv = nn.WeightNorm(out_conv, name="wn_out")
        x = out_conv(x)
        outs.append(x.reshape(B, -1))
        return outs


def _espnet_disc_kw(kw) -> Dict[str, Any]:
    """Translate espnet-style discriminator param dicts (the reference's
    `*_discriminator_params` config blocks, `discriminator.py:25-60,219-253`)
    onto our dataclass fields; unsupported non-default options fail loudly
    instead of being silently dropped."""
    kw = dict(kw or {})
    kw.pop("in_channels", None)  # implied by the input tensor
    act = kw.pop("nonlinear_activation", "LeakyReLU")
    if act != "LeakyReLU":
        raise ValueError(f"unsupported discriminator activation: {act!r}")
    act_params = kw.pop("nonlinear_activation_params", None) or {}
    if "negative_slope" in act_params:
        kw.setdefault("lrelu_slope", act_params["negative_slope"])
    if kw.pop("use_spectral_norm", False):
        raise ValueError(
            "use_spectral_norm=True is not supported (the shipped configs "
            "use weight norm)"
        )
    if not kw.pop("bias", True):
        raise ValueError("bias=False is not supported")
    return kw


class MultiPeriodDiscriminator(nn.Module):
    periods: Sequence[int] = (2, 3, 5, 7, 11)
    params_: Dict[str, Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[List[jnp.ndarray]]:
        kw = _espnet_disc_kw(self.params_)
        return [
            PeriodDiscriminator(period=p, name=f"period_{p}", **kw)(x)
            for p in self.periods
        ]


class ScaleDiscriminator(nn.Module):
    """1-D grouped-conv stack (`discriminator.py:215-380`)."""

    out_channels: int = 1
    kernel_sizes: Sequence[int] = (15, 41, 5, 3)
    channels: int = 128
    max_downsample_channels: int = 1024
    max_groups: int = 16
    downsample_scales: Sequence[int] = (2, 2, 4, 4, 1)
    lrelu_slope: float = 0.1
    use_weight_norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        outs = []
        h = WNConv1d(
            self.channels,
            self.kernel_sizes[0],
            use_weight_norm=self.use_weight_norm,
            name="layer_0",
        )(x)
        h = nn.leaky_relu(h, self.lrelu_slope)
        outs.append(h)

        import math

        in_ch = out_ch = self.channels
        groups = 4
        for i, scale in enumerate(self.downsample_scales):
            h = WNConv1d(
                out_ch,
                self.kernel_sizes[1],
                stride=scale,
                # gcd clamp is a no-op at reference sizes; keeps tiny test
                # configs valid
                feature_group_count=math.gcd(groups, math.gcd(in_ch, out_ch)),
                use_weight_norm=self.use_weight_norm,
                name=f"layer_{i + 1}",
            )(h)
            h = nn.leaky_relu(h, self.lrelu_slope)
            outs.append(h)
            in_ch = out_ch
            out_ch = min(in_ch * 2, self.max_downsample_channels)
            groups = min(groups * 4, self.max_groups)

        out_ch = min(in_ch * 2, self.max_downsample_channels)
        h = WNConv1d(
            out_ch,
            self.kernel_sizes[2],
            use_weight_norm=self.use_weight_norm,
            name="layer_pre_out",
        )(h)
        h = nn.leaky_relu(h, self.lrelu_slope)
        outs.append(h)
        h = WNConv1d(
            self.out_channels,
            self.kernel_sizes[3],
            use_weight_norm=self.use_weight_norm,
            name="layer_out",
        )(h)
        outs.append(h)
        return outs


def _avg_pool1d(x: jnp.ndarray, kernel: int = 4, stride: int = 2, padding: int = 2):
    """torch AvgPool1d semantics (count_include_pad=True), feature-last."""
    return nn.avg_pool(
        x, (kernel,), strides=(stride,), padding=((padding, padding),)
    )


class MultiScaleDiscriminator(nn.Module):
    scales: int = 1
    params_: Dict[str, Any] = None
    pool_kernel: int = 4
    pool_stride: int = 2
    pool_padding: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[List[jnp.ndarray]]:
        kw = _espnet_disc_kw(self.params_)
        outs = []
        for i in range(self.scales):
            outs.append(ScaleDiscriminator(name=f"scale_{i}", **kw)(x))
            if self.scales > 1:
                x = _avg_pool1d(x, self.pool_kernel, self.pool_stride, self.pool_padding)
        return outs


class MultiScaleMultiPeriodDiscriminator(nn.Module):
    """MSD + MPD combined (`discriminator.py:463-550`).

    Input waveform (B, T, 1); returns list over discriminators of lists of
    per-layer feature maps.
    """

    scales: int = 1
    scale_params: Dict[str, Any] = None
    periods: Sequence[int] = (2, 3, 5, 7, 11)
    period_params: Dict[str, Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[List[jnp.ndarray]]:
        msd = MultiScaleDiscriminator(
            scales=self.scales, params_=self.scale_params, name="msd"
        )(x)
        mpd = MultiPeriodDiscriminator(
            periods=self.periods, params_=self.period_params, name="mpd"
        )(x)
        return msd + mpd
