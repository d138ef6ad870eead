"""HiFi-GAN V1 generator (flax, feature-last, weight-normalised convs).

Architecture parity with `models/gan_tts/hifigan/generator.py` +
`layers.py`: input conv -> 4x [LeakyReLU(0.1) -> ConvTranspose up x
(8,8,2,2) -> mean of 3 multi-kernel/multi-dilation residual blocks] ->
LeakyReLU -> conv -> tanh; optional global conditioning; total upsample
x256. Transposed convs use torch-exact geometry (input dilation +
asymmetric padding) so lengths match the reference everywhere.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

_INIT = nn.initializers.normal(0.01)  # official HiFi-GAN init


def effective_wn_kernel(p, use_weight_norm: bool = True) -> jnp.ndarray:
    """Effective conv kernel from a WNConv1d param subtree (mirrors flax
    nn.WeightNorm: scale * v / sqrt(||v||^2 + eps))."""
    kernel = p["conv"]["kernel"]
    if use_weight_norm:
        scale = p["wn"]["conv/kernel/scale"]
        norm = jax.lax.rsqrt(
            (kernel * kernel).sum(axis=(0, 1), keepdims=True) + 1e-12
        )
        kernel = kernel * norm * scale[None, None, :]
    return kernel


class WNConv1d(nn.Module):
    """Weight-normalised 1-D conv: w = g * v/||v|| per output channel."""

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    padding: Any = "SAME"
    use_bias: bool = True
    feature_group_count: int = 1
    use_weight_norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv = nn.Conv(
            self.features,
            (self.kernel_size,),
            strides=(self.stride,),
            kernel_dilation=(self.dilation,),
            padding=self.padding,
            use_bias=self.use_bias,
            feature_group_count=self.feature_group_count,
            kernel_init=_INIT,
            name="conv",
        )
        if self.use_weight_norm:
            conv = nn.WeightNorm(conv, name="wn")
        return conv(x)


class WNConvTranspose1d(nn.Module):
    """Weight-normalised transposed conv with torch ConvTranspose1d geometry.

    out_len = (in-1)*stride - 2*padding + kernel + output_padding, realised
    as an input-dilated conv with asymmetric edge padding — one fused XLA op.
    """

    features: int
    kernel_size: int
    stride: int
    padding: int
    output_padding: int = 0
    use_weight_norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, s, p, op = self.kernel_size, self.stride, self.padding, self.output_padding
        in_ch = x.shape[-1]
        v = self.param("kernel_v", _INIT, (k, in_ch, self.features))
        if self.use_weight_norm:
            g = self.param(
                "kernel_g",
                lambda rng, shape: jnp.linalg.norm(
                    v.reshape(-1, self.features), axis=0
                ),
                (self.features,),
            )
            norm = jnp.sqrt((v**2).sum(axis=(0, 1), keepdims=True) + 1e-12)
            kernel = v / norm * g[None, None, :]
        else:
            kernel = v
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        x = x.astype(kernel.dtype)  # params dictate compute dtype (bf16 serving)
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1,),
            padding=[(k - 1 - p, k - 1 - p + op)],
            lhs_dilation=(s,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return y + b


class ResidualBlock(nn.Module):
    """Multi-dilation residual pairs (`hifigan/layers.py:16-98`)."""

    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3, 5)
    use_additional_convs: bool = True
    lrelu_slope: float = 0.1
    use_weight_norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, d in enumerate(self.dilations):
            xt = nn.leaky_relu(x, self.lrelu_slope)
            xt = WNConv1d(
                self.channels,
                self.kernel_size,
                dilation=d,
                use_weight_norm=self.use_weight_norm,
                name=f"conv1_{i}",
            )(xt)
            if self.use_additional_convs:
                xt = nn.leaky_relu(xt, self.lrelu_slope)
                xt = WNConv1d(
                    self.channels,
                    self.kernel_size,
                    use_weight_norm=self.use_weight_norm,
                    name=f"conv2_{i}",
                )(xt)
            x = x + xt
        return x


class HiFiGANGenerator(nn.Module):
    """mel (B, T, in_channels) -> waveform (B, T*256, out_channels)."""

    in_channels: int = 80
    out_channels: int = 1
    channels: int = 512
    global_channels: int = -1
    kernel_size: int = 7
    upsample_scales: Sequence[int] = (8, 8, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4)
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilations: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    use_additional_convs: bool = True
    lrelu_slope: float = 0.1
    use_weight_norm: bool = True
    # Inference-only fast path: evaluate each upsample stage's resblock trio
    # with the fused Pallas MRF kernel (`ops/pallas_vocoder.py`) instead of
    # 18 separate XLA convs. Numerically matches the layer path; no VJP, so
    # keep False for training. `fused_interpret=None` auto-selects Pallas
    # interpret mode off-TPU (for CPU tests).
    fused_mrf: bool = False
    fused_interpret: Optional[bool] = None
    # Inference-only fast path: run small-channel tail stages (C < 128) in
    # time->channel packed layout so the convs fill the 128-wide MXU lanes
    # (`ops/packed_conv.py`; measured 1.63x per conv at C=32). Numerically
    # exact vs the layer path; no VJP concern (convs stay differentiable)
    # but packing is only wired for the no-grad serving path. Takes
    # precedence over fused_mrf on stages where both apply.
    packed_tail: bool = False
    # Inference fast-path probe for the FUSED mel->wav graphs (where the
    # packed tail's pack/unpack reshapes break XLA's fusion and regress 3x
    # — PERF_NOTES §1): fold each tail stage's 3 parallel resblock branches
    # into ONE dense conv chain over 3*ch channels with block-diagonal,
    # width-padded kernels (k=3/7/11 all centred in k=11) and the branch
    # mean at the end. No layout reshapes — the time axis is untouched —
    # so lane filling (3*ch vs ch) can survive fusion. Trades ~4.7x MACs
    # at ch=32 for 3x lane occupancy; numerically exact vs the layer path
    # (zero taps + block-diag zeros). Takes precedence after packed_tail.
    grouped_mrf: bool = False

    def _effective_kernel(self, p):
        return effective_wn_kernel(p, self.use_weight_norm)

    def _fused_stage_fits(self, ch: int) -> bool:
        """The kernel keeps the whole stage's weights VMEM-resident
        (~18 convs x k x ch^2 floats) next to ~10 (L, ch) f32 live tile
        buffers inside a ~16MB scoped VMEM budget; beyond ch=64 (the 4MB
        weight mark at the default MRF) that overflows, and large-channel
        stages are MXU-efficient under plain XLA anyway — keep them on the
        layer path."""
        n_convs = sum(
            (2 if self.use_additional_convs else 1) * len(d)
            for d in self.resblock_dilations
        )
        k_avg = sum(self.resblock_kernel_sizes) / len(self.resblock_kernel_sizes)
        weight_bytes = n_convs * k_avg * ch * ch * 4
        return weight_bytes < 4e6

    def _fused_stage(self, x: jnp.ndarray, i: int, ch: int) -> jnp.ndarray:
        """Run stage i's residual trio through the fused Pallas kernel,
        reading the already-created block parameters."""
        from viet_tts_tpu.ops.pallas_vocoder import fused_mrf_stage

        w1s, b1s, w2s, b2s = [], [], [], []
        for j, rd in enumerate(self.resblock_dilations):
            p = self.get_variable("params", f"block_{i}_{j}")
            w1s.append(
                jnp.stack(
                    [self._effective_kernel(p[f"conv1_{d}"]) for d in range(len(rd))]
                )
            )
            b1s.append(
                jnp.stack([p[f"conv1_{d}"]["conv"]["bias"] for d in range(len(rd))])
            )
            w2s.append(
                jnp.stack(
                    [self._effective_kernel(p[f"conv2_{d}"]) for d in range(len(rd))]
                )
            )
            b2s.append(
                jnp.stack([p[f"conv2_{d}"]["conv"]["bias"] for d in range(len(rd))])
            )
        interpret = self.fused_interpret
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        return fused_mrf_stage(
            x,
            jnp.int32(x.shape[1]),
            tuple(w1s),
            tuple(b1s),
            tuple(w2s),
            tuple(b2s),
            kernel_sizes=tuple(self.resblock_kernel_sizes),
            dilations=tuple(map(tuple, self.resblock_dilations)),
            lrelu=self.lrelu_slope,
            # VMEM scoped-stack budget is ~16MB and Mosaic's unrolled
            # 18-conv chain allocates ~10KB/frame of stack temporaries at
            # tile=2048 (measured 19.6-21.3MB on v5e, OOM); tile=1024
            # (L=1144 with the halo) keeps every fused stage inside it.
            tile=1024,
            interpret=interpret,
        )

    def _packed_stage(self, x: jnp.ndarray, i: int, ch: int, r: int) -> jnp.ndarray:
        """Evaluate stage i's residual trio in (B, T/r, r*ch) packed layout,
        reading the already-created block parameters. leaky_relu, biases and
        residual adds are position-independent, so only the conv kernels
        need the block transformation."""
        from viet_tts_tpu.ops.packed_conv import (
            pack_time,
            packed_dilated_conv,
            unpack_time,
        )

        B, T, _ = x.shape
        xp = pack_time(x, r)
        acc = 0.0
        for j, (rk, rd) in enumerate(
            zip(self.resblock_kernel_sizes, self.resblock_dilations)
        ):
            p = self.get_variable("params", f"block_{i}_{j}")
            xb = xp
            for di, d in enumerate(rd):
                xt = nn.leaky_relu(xb, self.lrelu_slope)
                xt = packed_dilated_conv(
                    xt,
                    self._effective_kernel(p[f"conv1_{di}"]),
                    d,
                    r,
                    bias=p[f"conv1_{di}"]["conv"]["bias"],
                )
                if self.use_additional_convs:
                    xt = nn.leaky_relu(xt, self.lrelu_slope)
                    xt = packed_dilated_conv(
                        xt,
                        self._effective_kernel(p[f"conv2_{di}"]),
                        1,
                        r,
                        bias=p[f"conv2_{di}"]["conv"]["bias"],
                    )
                xb = xb + xt
            acc = acc + xb
        return unpack_time(acc / len(self.resblock_kernel_sizes), r)

    def _grouped_stage(self, x: jnp.ndarray, i: int, ch: int) -> jnp.ndarray:
        """Evaluate stage i's residual trio as ONE conv chain over the
        branch-concatenated (B, T, n*ch) tensor with block-diagonal
        kernels (each branch's k_j kernel centred inside k_max taps —
        zero taps make the wide conv exactly the narrow one under SAME
        padding). Residual adds / leaky_relu / biases are elementwise, so
        only the kernels need the fold; HiFi-GAN V1's branches share one
        dilation schedule, asserted below."""
        n = len(self.resblock_kernel_sizes)
        k_max = max(self.resblock_kernel_sizes)
        dils = tuple(self.resblock_dilations[0])
        assert all(tuple(d) == dils for d in self.resblock_dilations), (
            "grouped_mrf requires a shared dilation schedule across branches"
        )

        def blockdiag(kernels):
            w = jnp.zeros((k_max, n * ch, n * ch), kernels[0].dtype)
            for j, kj in enumerate(kernels):
                pad = (k_max - kj.shape[0]) // 2
                w = w.at[
                    pad:pad + kj.shape[0],
                    j * ch:(j + 1) * ch,
                    j * ch:(j + 1) * ch,
                ].set(kj)
            return w

        params = [
            self.get_variable("params", f"block_{i}_{j}") for j in range(n)
        ]
        xb = jnp.concatenate([x] * n, axis=-1)
        for di, d in enumerate(dils):
            w1 = blockdiag(
                [self._effective_kernel(p[f"conv1_{di}"]) for p in params]
            )
            b1 = jnp.concatenate(
                [p[f"conv1_{di}"]["conv"]["bias"] for p in params]
            )
            xt = nn.leaky_relu(xb, self.lrelu_slope)
            xt = jax.lax.conv_general_dilated(
                xt.astype(w1.dtype), w1, (1,), "SAME", rhs_dilation=(d,),
                dimension_numbers=("NWC", "WIO", "NWC"),
            ) + b1
            if self.use_additional_convs:
                w2 = blockdiag(
                    [self._effective_kernel(p[f"conv2_{di}"]) for p in params]
                )
                b2 = jnp.concatenate(
                    [p[f"conv2_{di}"]["conv"]["bias"] for p in params]
                )
                xt = nn.leaky_relu(xt, self.lrelu_slope)
                xt = jax.lax.conv_general_dilated(
                    xt.astype(w2.dtype), w2, (1,), "SAME",
                    dimension_numbers=("NWC", "WIO", "NWC"),
                ) + b2
            xb = xb + xt
        B, T, _ = xb.shape
        return jnp.mean(xb.reshape(B, T, n, ch), axis=2)

    @nn.compact
    def __call__(
        self, c: jnp.ndarray, g: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        wn = self.use_weight_norm
        x = WNConv1d(
            self.channels, self.kernel_size, use_weight_norm=wn, name="input_conv"
        )(c)
        if g is not None and self.global_channels > 0:
            # g: (B, global_channels)
            x = x + WNConv1d(
                self.channels, 1, use_weight_norm=wn, name="global_conv"
            )(g[:, None, :])

        n_blocks = len(self.resblock_kernel_sizes)
        for i, (scale, up_k) in enumerate(
            zip(self.upsample_scales, self.upsample_kernel_sizes)
        ):
            ch = self.channels // (2 ** (i + 1))
            x = nn.leaky_relu(x, self.lrelu_slope)
            x = WNConvTranspose1d(
                ch,
                up_k,
                stride=scale,
                padding=scale // 2 + scale % 2,
                output_padding=scale % 2,
                use_weight_norm=wn,
                name=f"upsample_{i}",
            )(x)
            pack_r = 128 // ch if ch < 128 else 1
            if (
                self.packed_tail
                and pack_r > 1
                and not self.is_initializing()
                and x.shape[1] % pack_r == 0
            ):
                x = self._packed_stage(x, i, ch, pack_r)
            elif (
                self.grouped_mrf
                and ch < 128
                and n_blocks > 1
                and not self.is_initializing()
            ):
                x = self._grouped_stage(x, i, ch)
            elif (
                self.fused_mrf
                # the kernel evaluates the fixed conv1->conv2 chain; without
                # additional convs the stage stays on the layer path
                and self.use_additional_convs
                and not self.is_initializing()
                and self._fused_stage_fits(ch)
            ):
                x = self._fused_stage(x, i, ch)
            else:
                acc = 0.0
                for j, (rk, rd) in enumerate(
                    zip(self.resblock_kernel_sizes, self.resblock_dilations)
                ):
                    acc = acc + ResidualBlock(
                        ch,
                        rk,
                        tuple(rd),
                        self.use_additional_convs,
                        self.lrelu_slope,
                        wn,
                        name=f"block_{i}_{j}",
                    )(x)
                x = acc / n_blocks

        x = nn.leaky_relu(x, 0.01)  # reference uses default slope here
        x = WNConv1d(
            self.out_channels, self.kernel_size, use_weight_norm=wn, name="output_conv"
        )(x)
        return jnp.tanh(x)

    @property
    def upsample_factor(self) -> int:
        f = self.out_channels
        for s in self.upsample_scales:
            f *= s
        return f
