"""VITS2 major components: encoders, decoder, duration predictors, flows.

Parity with `models/gan_tts/vits2/layers.py`. Feature-last.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from viet_tts_tpu.models.hifigan.generator import WNConvTranspose1d
from viet_tts_tpu.models.vits2.attentions import CausalFFT, VitsEncoder
from viet_tts_tpu.models.vits2.sublayers import (
    WN,
    ConvFlow,
    DDSConv,
    ElementwiseAffine,
    Flip,
    LogFlow,
    ResBlock1,
    ResBlock2,
    ResidualCouplingLayer,
    LRELU_SLOPE,
)
from viet_tts_tpu.nn.utils import valid_mask_from_lengths


class TextEncoder(nn.Module):
    """Phoneme embedding + rel-pos encoder -> (x, m, logs) prior stats
    (`layers.py:14-63`)."""

    n_vocab: int
    out_channels: int
    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int
    p_dropout: float
    gin_channels: int = 0
    remat: bool = False  # per-layer gradient remat in the encoder stack

    @nn.compact
    def __call__(self, text, text_lengths, g=None, train: bool = False):
        emb = nn.Embed(
            self.n_vocab,
            self.hidden_channels,
            embedding_init=nn.initializers.normal(self.hidden_channels**-0.5),
            name="emb",
        )(text)
        x = emb * math.sqrt(self.hidden_channels)
        x_mask = valid_mask_from_lengths(text_lengths, text.shape[1])[
            ..., None
        ].astype(x.dtype)
        x = VitsEncoder(
            self.hidden_channels,
            self.filter_channels,
            self.n_heads,
            self.n_layers,
            self.kernel_size,
            self.p_dropout,
            gin_channels=self.gin_channels,
            remat=self.remat,
            name="encoder",
        )(x * x_mask, x_mask, g=g if self.gin_channels > 0 else None, train=train)
        stats = nn.Conv(self.out_channels * 2, (1,), name="proj")(x) * x_mask
        m, logs = jnp.split(stats, 2, axis=-1)
        return x, m, logs, x_mask


class PosteriorEncoder(nn.Module):
    """Linear spectrogram -> WN(16) -> reparameterised z (`layers.py:65-105`)."""

    in_channels: int
    out_channels: int
    hidden_channels: int
    kernel_size: int = 5
    dilation_rate: int = 1
    n_layers: int = 16
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x, x_lengths, g=None, train: bool = False):
        x_mask = valid_mask_from_lengths(x_lengths, x.shape[1])[..., None].astype(
            x.dtype
        )
        h = nn.Conv(self.hidden_channels, (1,), name="pre")(x) * x_mask
        h = WN(
            self.hidden_channels,
            self.kernel_size,
            self.dilation_rate,
            self.n_layers,
            self.gin_channels,
            name="enc",
        )(h, x_mask, g, train=train)
        stats = nn.Conv(self.out_channels * 2, (1,), name="proj")(h) * x_mask
        m, logs = jnp.split(stats, 2, axis=-1)
        eps = jax.random.normal(self.make_rng("noise"), m.shape, m.dtype)
        z = (m + eps * jnp.exp(logs)) * x_mask
        return z, m, logs, x_mask


class VitsGenerator(nn.Module):
    """HiFiGAN-style latent-to-waveform decoder (`layers.py:107-186`)."""

    initial_channel: int
    resblock: str = "1"
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5),) * 3
    upsample_rates: Sequence[int] = (8, 8, 2, 2)
    upsample_initial_channel: int = 512
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4)
    gin_channels: int = 0
    # Inference-only fast path: run small-channel tail stages in
    # time->channel packed layout to fill the 128-wide MXU lanes
    # (`ops/packed_conv.py`; same transform as HiFiGANGenerator.packed_tail)
    packed_tail: bool = False

    @property
    def upsample_factor(self) -> int:
        f = 1
        for u in self.upsample_rates:
            f *= u
        return f

    def _packed_trio(self, h, i: int, ch: int, r: int):
        """Stage i's residual trio on the (B, T/r, r*ch) packed layout,
        reading the already-created res_{i}_{j} parameters."""
        from viet_tts_tpu.models.hifigan.generator import effective_wn_kernel
        from viet_tts_tpu.ops.packed_conv import (
            pack_time,
            packed_dilated_conv,
            unpack_time,
        )

        hp = pack_time(h, r)
        acc = 0.0
        for j, (rk, rd) in enumerate(
            zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)
        ):
            p = self.get_variable("params", f"res_{i}_{j}")
            xb = hp
            for di, d in enumerate(rd):
                xt = nn.leaky_relu(xb, LRELU_SLOPE)
                if self.resblock == "1":
                    xt = packed_dilated_conv(
                        xt, effective_wn_kernel(p[f"conv1_{di}"]), d, r,
                        bias=p[f"conv1_{di}"]["conv"]["bias"],
                    )
                    xt = nn.leaky_relu(xt, LRELU_SLOPE)
                    xt = packed_dilated_conv(
                        xt, effective_wn_kernel(p[f"conv2_{di}"]), 1, r,
                        bias=p[f"conv2_{di}"]["conv"]["bias"],
                    )
                else:
                    xt = packed_dilated_conv(
                        xt, effective_wn_kernel(p[f"conv_{di}"]), d, r,
                        bias=p[f"conv_{di}"]["conv"]["bias"],
                    )
                xb = xb + xt
            acc = acc + xb
        return unpack_time(acc / len(self.resblock_kernel_sizes), r)

    @nn.compact
    def __call__(self, x, g=None):
        """x: (B, T, C) latents -> (B, T*up, 1)."""
        Res = ResBlock1 if self.resblock == "1" else ResBlock2
        h = nn.Conv(self.upsample_initial_channel, (7,), padding="SAME", name="conv_pre")(x)
        if g is not None and self.gin_channels > 0:
            h = h + nn.Conv(self.upsample_initial_channel, (1,), name="cond")(
                g[:, None, :]
            )
        n_kernels = len(self.resblock_kernel_sizes)
        for i, (u, k) in enumerate(
            zip(self.upsample_rates, self.upsample_kernel_sizes)
        ):
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            h = nn.leaky_relu(h, LRELU_SLOPE)
            h = WNConvTranspose1d(
                ch, k, stride=u, padding=(k - u) // 2, name=f"up_{i}"
            )(h)
            pack_r = 128 // ch if ch < 128 else 1
            if (
                self.packed_tail
                and pack_r > 1
                and not self.is_initializing()
                and h.shape[1] % pack_r == 0
            ):
                h = self._packed_trio(h, i, ch, pack_r)
            else:
                acc = 0.0
                for j, (rk, rd) in enumerate(
                    zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)
                ):
                    acc = acc + Res(ch, rk, tuple(rd), name=f"res_{i}_{j}")(h)
                h = acc / n_kernels
        h = nn.leaky_relu(h, 0.01)
        h = nn.Conv(1, (7,), padding="SAME", use_bias=False, name="conv_post")(h)
        return jnp.tanh(h)


class VitsDurationPredictor(nn.Module):
    """Deterministic duration predictor (`layers.py:299-340`)."""

    filter_channels: int = 256
    kernel_size: int = 3
    p_dropout: float = 0.5
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x, x_mask, g=None, train: bool = False):
        x = jax.lax.stop_gradient(x)
        if g is not None and self.gin_channels > 0:
            x = x + nn.Conv(x.shape[-1], (1,), name="cond")(
                jax.lax.stop_gradient(g)[:, None, :]
            )
        h = nn.Conv(self.filter_channels, (self.kernel_size,), padding="SAME", name="conv_1")(x * x_mask)
        h = nn.relu(h)
        h = nn.LayerNorm(epsilon=1e-5, name="norm_1")(h)
        h = nn.Dropout(self.p_dropout)(h, deterministic=not train)
        h = nn.Conv(self.filter_channels, (self.kernel_size,), padding="SAME", name="conv_2")(h * x_mask)
        h = nn.relu(h)
        h = nn.LayerNorm(epsilon=1e-5, name="norm_2")(h)
        h = nn.Dropout(self.p_dropout)(h, deterministic=not train)
        return nn.Conv(1, (1,), name="proj")(h * x_mask) * x_mask


class StochasticDurationPredictor(nn.Module):
    """Spline-flow SDP (`layers.py:188-297`).

    forward (training): returns per-sample NLL + logq; reverse: log-durations.
    All tensors feature-last; duration channel dim is the last axis.
    """

    in_channels: int
    filter_channels: int = 192
    kernel_size: int = 3
    p_dropout: float = 0.5
    n_flows: int = 4
    gin_channels: int = 0

    def setup(self):
        fc = self.in_channels  # reference overrides filter_channels
        self._fc = fc
        self.log_flow = LogFlow()
        flows = [ElementwiseAffine(2)]
        for _ in range(self.n_flows):
            flows.append(ConvFlow(2, fc, self.kernel_size, n_layers=3))
            flows.append(Flip())
        self.flows = flows

        self.post_pre = nn.Conv(fc, (1,))
        self.post_proj = nn.Conv(fc, (1,))
        self.post_convs = DDSConv(fc, self.kernel_size, 3, self.p_dropout)
        post_flows = [ElementwiseAffine(2)]
        for _ in range(self.n_flows):
            post_flows.append(ConvFlow(2, fc, self.kernel_size, n_layers=3))
            post_flows.append(Flip())
        self.post_flows = post_flows

        self.pre = nn.Conv(fc, (1,))
        self.proj = nn.Conv(fc, (1,))
        self.convs = DDSConv(fc, self.kernel_size, 3, self.p_dropout)
        if self.gin_channels > 0:
            self.cond = nn.Conv(fc, (1,))

    def _condition(self, x, g, train):
        x = jax.lax.stop_gradient(x)
        x = self.pre(x)
        if g is not None and self.gin_channels > 0:
            x = x + self.cond(jax.lax.stop_gradient(g)[:, None, :])
        x = self.convs(x, jnp.ones_like(x[..., :1]), train=train)
        return x

    def __call__(self, x, x_mask, w=None, g=None, train: bool = False):
        """Training NLL (B,) for durations w (B, T, 1)."""
        x = self._condition(x, g, train)
        x = self.proj(x) * x_mask

        # posterior flows over (u, nuisance)
        h_w = self.post_pre(w)
        h_w = self.post_convs(h_w, x_mask, train=train)
        h_w = self.post_proj(h_w) * x_mask
        e_q = (
            jax.random.normal(self.make_rng("noise"), (*w.shape[:2], 2), w.dtype)
            * x_mask
        )
        z_q = e_q
        logdet_tot_q = 0.0
        for flow in self.post_flows:
            z_q, logdet_q = flow(z_q, x_mask, g=(x + h_w), train=train)
            logdet_tot_q += logdet_q
        z_u, z1 = z_q[..., :1], z_q[..., 1:]
        u = nn.sigmoid(z_u) * x_mask
        z0 = (w - u) * x_mask
        logdet_tot_q += jnp.sum(
            (nn.log_sigmoid(z_u) + nn.log_sigmoid(-z_u)) * x_mask, axis=(1, 2)
        )
        logq = (
            jnp.sum(-0.5 * (math.log(2 * math.pi) + e_q**2) * x_mask, axis=(1, 2))
            - logdet_tot_q
        )

        z0, logdet = self.log_flow(z0, x_mask)
        logdet_tot = logdet
        z = jnp.concatenate([z0, z1], axis=-1)
        for flow in self.flows:
            z, logdet = flow(z, x_mask, g=x, train=train)
            logdet_tot = logdet_tot + logdet
        nll = (
            jnp.sum(0.5 * (math.log(2 * math.pi) + z**2) * x_mask, axis=(1, 2))
            - logdet_tot
        )
        return nll + logq

    def reverse(self, x, x_mask, g=None, noise_scale: float = 1.0):
        """Sample log-durations (B, T, 1)."""
        x = self._condition(x, g, False)
        x = self.proj(x) * x_mask
        flows = list(reversed(self.flows))
        flows = flows[:-2] + [flows[-1]]  # drop the unused extra flip
        z = (
            jax.random.normal(self.make_rng("noise"), (*x.shape[:2], 2), x.dtype)
            * noise_scale
        )
        for flow in flows:
            z = flow(z, x_mask, g=x, reverse=True)
        return z[..., :1]


class ResidualCouplingTransformersLayer(nn.Module):
    """pre_conv variant: transformer on x0 before the WN coupling
    (`layers.py:542-622`)."""

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
        x0_ = VitsEncoder(
            half,
            half,
            n_heads=2,
            n_layers=2,
            kernel_size=3,
            p_dropout=0.1,
            window_size=None,
            name="pre_transformer",
        )(x0 * x_mask, x_mask, train=train)
        x0_ = x0_ + x0
        h = nn.Conv(self.hidden_channels, (1,), name="pre")(x0_) * x_mask
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


class ResidualCouplingTransformersLayer2(nn.Module):
    """pre_conv2 variant: 1-layer transformer residual between the pre
    projection and the WN coupling (`layers.py:475-539`)."""

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
        h = h + VitsEncoder(
            self.hidden_channels,
            self.hidden_channels,
            n_heads=2,
            n_layers=1,
            kernel_size=self.kernel_size,
            p_dropout=0.0,
            name="pre_transformer",
        )(h * x_mask, x_mask, train=train)
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
            return jnp.concatenate([x0, x1], axis=-1), jnp.sum(logs, axis=(1, 2))
        x1 = (x1 - m) * jnp.exp(-logs) * x_mask
        return jnp.concatenate([x0, x1], axis=-1)


class FFTransformerCouplingLayer(nn.Module):
    """fft variant: causal FFT stack as the coupling network
    (`layers.py:626-684`)."""

    channels: int
    hidden_channels: int
    kernel_size: int
    n_layers: int
    n_heads: int
    filter_channels: int = 768
    gin_channels: int = 0
    mean_only: bool = True

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False, train: bool = False):
        half = self.channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = nn.Conv(self.hidden_channels, (1,), name="pre")(x0) * x_mask
        h_ = CausalFFT(
            self.hidden_channels,
            self.filter_channels,
            self.n_heads,
            self.n_layers,
            self.kernel_size,
            gin_channels=self.gin_channels,
            name="enc",
        )(h, x_mask, g=g, train=train)
        h = h_ + h
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
            return jnp.concatenate([x0, x1], axis=-1), jnp.sum(logs, axis=(1, 2))
        x1 = (x1 - m) * jnp.exp(-logs) * x_mask
        return jnp.concatenate([x0, x1], axis=-1)


class MonoTransformerFlowLayer(nn.Module):
    """mono_layer variant: transformer-only half-coupling, optionally with
    the VITS2 fig-1B residual connection (`layers.py:686-770`). The
    residual reverse uses sigmoid(logs) where the exact inverse would be
    sigmoid(-logs) -- preserved as the reference computes it
    (`layers.py:735-743`)."""

    channels: int
    hidden_channels: int
    mean_only: bool = True
    residual_connection: bool = False

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False, train: bool = False):
        half = self.channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        if self.residual_connection and reverse:
            x0 = x0 / 2.0
        pre_transformer = VitsEncoder(
            half,
            half,
            n_heads=2,
            n_layers=2,
            kernel_size=3,
            p_dropout=0.1,
            window_size=None,
            name="pre_transformer",
        )
        post = nn.Conv(
            half * (2 - int(self.mean_only)),
            (1,),
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="post",
        )
        if self.residual_connection:
            # reference feeds x0 unmasked into the transformer here
            h = pre_transformer(x0, x_mask, train=train)
        else:
            h = pre_transformer(x0 * x_mask, x_mask, train=train) + x0
        stats = post(h) * x_mask
        if self.mean_only:
            m, logs = stats, jnp.zeros_like(stats)
        else:
            m, logs = jnp.split(stats, 2, axis=-1)
        if self.residual_connection:
            if not reverse:
                x1_ = (m + x1 * jnp.exp(logs)) * x_mask
                out = x + jnp.concatenate([x0, x1_], axis=-1)
                logdet = jnp.sum(jnp.log(jnp.exp(logs) + 1.0), axis=(1, 2))
                logdet = logdet + math.log(2.0) * (x0.shape[1] * x0.shape[2])
                return out, logdet
            x1 = (x1 - m) / (1.0 + jnp.exp(-logs)) * x_mask
            return jnp.concatenate([x0, x1], axis=-1)
        if not reverse:
            x1 = (m + x1 * jnp.exp(logs)) * x_mask
            return jnp.concatenate([x0, x1], axis=-1), jnp.sum(logs, axis=(1, 2))
        x1 = (x1 - m) * jnp.exp(-logs) * x_mask
        return jnp.concatenate([x0, x1], axis=-1)


class ResidualCouplingTransformersBlock(nn.Module):
    """4x (coupling layer + flip) flow stack (`layers.py:342-472`)."""

    channels: int
    hidden_channels: int
    kernel_size: int = 5
    dilation_rate: int = 1
    n_layers: int = 4
    n_flows: int = 4
    gin_channels: int = 0
    use_transformer_flows: bool = True
    transformer_flow_type: str = "pre_conv"

    AVAILABLE_FLOW_TYPES = (
        "pre_conv",
        "pre_conv2",
        "fft",
        "mono_layer_inter_residual",
        "mono_layer_post_residual",
    )

    def setup(self):
        ftype = self.transformer_flow_type if self.use_transformer_flows else "none"
        if self.use_transformer_flows and ftype not in self.AVAILABLE_FLOW_TYPES:
            # the reference asserts the same set (`generator.py:9-15,88-91`)
            raise ValueError(
                f"transformer_flow_type must be one of {self.AVAILABLE_FLOW_TYPES},"
                f" got {ftype!r}"
            )
        flows = []
        for _ in range(self.n_flows):
            if ftype == "pre_conv":
                flows.append(
                    ResidualCouplingTransformersLayer(
                        self.channels,
                        self.hidden_channels,
                        self.kernel_size,
                        self.dilation_rate,
                        self.n_layers,
                        gin_channels=self.gin_channels,
                        mean_only=True,
                    )
                )
            elif ftype == "pre_conv2":
                flows.append(
                    ResidualCouplingTransformersLayer2(
                        self.channels,
                        self.hidden_channels,
                        self.kernel_size,
                        self.dilation_rate,
                        self.n_layers,
                        gin_channels=self.gin_channels,
                        mean_only=True,
                    )
                )
            elif ftype == "fft":
                # the reference call site passes dilation_rate/n_layers into
                # the (n_layers, n_heads) slots positionally
                # (`layers.py:395-408` vs `layers.py:626-637`) -- preserved
                flows.append(
                    FFTransformerCouplingLayer(
                        self.channels,
                        self.hidden_channels,
                        self.kernel_size,
                        n_layers=self.dilation_rate,
                        n_heads=self.n_layers,
                        gin_channels=self.gin_channels,
                        mean_only=True,
                    )
                )
            elif ftype in (
                "mono_layer_inter_residual",
                "mono_layer_post_residual",
            ):
                flows.append(
                    ResidualCouplingLayer(
                        self.channels,
                        self.hidden_channels,
                        self.kernel_size,
                        self.dilation_rate,
                        self.n_layers,
                        gin_channels=self.gin_channels,
                        mean_only=True,
                    )
                )
            else:
                flows.append(
                    ResidualCouplingLayer(
                        self.channels,
                        self.hidden_channels,
                        self.kernel_size,
                        self.dilation_rate,
                        self.n_layers,
                        gin_channels=self.gin_channels,
                        mean_only=True,
                    )
                )
            flows.append(Flip())
            if ftype in ("mono_layer_inter_residual", "mono_layer_post_residual"):
                flows.append(
                    MonoTransformerFlowLayer(
                        self.channels,
                        self.hidden_channels,
                        mean_only=True,
                        residual_connection=(ftype == "mono_layer_post_residual"),
                    )
                )
        self.flows = flows

    def __call__(self, x, x_mask, g=None, reverse: bool = False, train: bool = False):
        if not reverse:
            for flow in self.flows:
                x, _ = flow(x, x_mask, g=g, reverse=False, train=train)
            return x
        for flow in reversed(self.flows):
            x = flow(x, x_mask, g=g, reverse=True, train=train)
        return x
