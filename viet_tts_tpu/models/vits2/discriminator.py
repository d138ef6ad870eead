"""VITS2 discriminators: MPD (S + periods 2/3/5/7/11) + duration discs.

Parity with `models/gan_tts/vits2/discriminator.py`. The multi-period
discriminator returns (real_outs, fake_outs, real_fmaps, fake_fmaps) like
the reference; duration discriminators return sigmoid probabilities for
(real, fake) log-durations.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from viet_tts_tpu.models.hifigan.generator import WNConv1d

LRELU_SLOPE = 0.1


class DiscriminatorP(nn.Module):
    period: int
    kernel_size: int = 5
    stride: int = 3

    @nn.compact
    def __call__(self, x):
        """x: (B, T, 1) -> (fmaps, logits)."""
        B, T, C = x.shape
        if T % self.period != 0:
            n_pad = self.period - (T % self.period)
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)), mode="reflect")
            T += n_pad
        x = x.reshape(B, T // self.period, self.period, C)

        fmap = []
        chans = [32, 128, 512, 1024, 1024]
        k, s = self.kernel_size, self.stride
        for i, ch in enumerate(chans):
            stride = (s, 1) if i < 4 else (1, 1)
            conv = nn.Conv(
                ch,
                (k, 1),
                strides=stride,
                padding=(((k - 1) // 2, (k - 1) // 2), (0, 0)),
                name=f"conv_{i}",
            )
            conv = nn.WeightNorm(conv, name=f"wn_{i}")
            x = nn.leaky_relu(conv(x), LRELU_SLOPE)
            fmap.append(x)
        post = nn.Conv(1, (3, 1), padding=((1, 1), (0, 0)), name="conv_post")
        post = nn.WeightNorm(post, name="wn_post")
        x = post(x)
        fmap.append(x)
        return fmap, x.reshape(B, -1)


class DiscriminatorS(nn.Module):
    @nn.compact
    def __call__(self, x):
        """x: (B, T, 1)."""
        import math as _math

        fmap = []
        specs = [
            (16, 15, 1, 1),
            (64, 41, 4, 4),
            (256, 41, 4, 16),
            (1024, 41, 4, 64),
            (1024, 41, 4, 256),
            (1024, 5, 1, 1),
        ]
        h = x
        for i, (ch, k, s, g) in enumerate(specs):
            in_ch = h.shape[-1]
            groups = _math.gcd(g, _math.gcd(in_ch, ch))
            h = WNConv1d(
                ch, k, stride=s, feature_group_count=groups, name=f"conv_{i}"
            )(h)
            h = nn.leaky_relu(h, LRELU_SLOPE)
            fmap.append(h)
        h = WNConv1d(1, 3, name="conv_post")(h)
        fmap.append(h)
        return fmap, h.reshape(h.shape[0], -1)


class MultiPeriodDiscriminator(nn.Module):
    """S + P[2,3,5,7,11]; returns (y_d_r, y_d_g, fmap_r, fmap_g)
    (`discriminator.py:119-146`)."""

    periods: Sequence[int] = (2, 3, 5, 7, 11)

    @nn.compact
    def __call__(self, y, y_hat):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        discs = [DiscriminatorS(name="disc_s")] + [
            DiscriminatorP(p, name=f"disc_p{p}") for p in self.periods
        ]
        for d in discs:
            fr, lr = d(y)
            fg, lg = d(y_hat)
            y_d_rs.append(lr)
            y_d_gs.append(lg)
            fmap_rs.append(fr)
            fmap_gs.append(fg)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


class DurationDiscriminator(nn.Module):
    """V1/V2 duration discriminator (`discriminator.py:147-293`).

    V1 skips activations/norms in the trunk (the reference comments them
    out); V2 applies them.
    """

    in_channels: int
    filter_channels: int
    kernel_size: int = 3
    p_dropout: float = 0.1
    variant: str = "dur_disc_1"

    @nn.compact
    def __call__(self, x, x_mask, dur_r, dur_hat):
        """x: (B, T, C) hidden text (stop-gradient applied by caller);
        dur_*: (B, T, 1) log-durations. Returns [prob_real, prob_fake]."""
        v2 = self.variant == "dur_disc_2"
        h = nn.Conv(
            self.filter_channels, (self.kernel_size,), padding="SAME", name="conv_1"
        )(jax.lax.stop_gradient(x) * x_mask)
        if v2:
            h = nn.LayerNorm(name="norm_1")(nn.relu(h))
        h = nn.Conv(
            self.filter_channels, (self.kernel_size,), padding="SAME", name="conv_2"
        )(h * x_mask)
        if v2:
            h = nn.LayerNorm(name="norm_2")(nn.relu(h))

        dur_proj = nn.Conv(self.filter_channels, (1,), name="dur_proj")
        pre1 = nn.Conv(
            self.filter_channels, (self.kernel_size,), padding="SAME", name="pre_out_conv_1"
        )
        pre2 = nn.Conv(
            self.filter_channels, (self.kernel_size,), padding="SAME", name="pre_out_conv_2"
        )
        norm1 = nn.LayerNorm(name="pre_out_norm_1")
        norm2 = nn.LayerNorm(name="pre_out_norm_2")
        out = nn.Dense(1, name="output_layer")

        probs = []
        for dur in (dur_r, dur_hat):
            d = dur_proj(dur)
            z = jnp.concatenate([h, d], axis=-1)
            z = pre1(z * x_mask)
            if v2:
                z = norm1(nn.relu(z))
            z = pre2(z * x_mask)
            if v2:
                z = norm2(nn.relu(z))
            z = z * x_mask
            probs.append(nn.sigmoid(out(z)))
        return probs
