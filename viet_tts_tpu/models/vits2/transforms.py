"""Piecewise rational-quadratic spline transforms (JAX).

Math parity with `models/gan_tts/vits2/transforms.py` (the neural-spline-flow
formulation with linear tails). The reference's boolean-mask indexing becomes
vectorised `where` selects so everything stays static-shape and jit-able.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_MIN_BIN_WIDTH = 1e-3
DEFAULT_MIN_BIN_HEIGHT = 1e-3
DEFAULT_MIN_DERIVATIVE = 1e-3


def _searchsorted(bin_locations: jnp.ndarray, inputs: jnp.ndarray, eps: float = 1e-6):
    bin_locations = bin_locations.at[..., -1].add(eps)
    return jnp.sum(inputs[..., None] >= bin_locations, axis=-1) - 1


def rational_quadratic_spline(
    inputs: jnp.ndarray,
    unnormalized_widths: jnp.ndarray,
    unnormalized_heights: jnp.ndarray,
    unnormalized_derivatives: jnp.ndarray,
    inverse: bool = False,
    left: float = 0.0,
    right: float = 1.0,
    bottom: float = 0.0,
    top: float = 1.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """inputs (...,) with per-element bin params (..., K) / derivs (..., K+1)."""
    num_bins = unnormalized_widths.shape[-1]

    widths = jax.nn.softmax(unnormalized_widths, axis=-1)
    widths = min_bin_width + (1.0 - min_bin_width * num_bins) * widths
    cumwidths = jnp.cumsum(widths, axis=-1)
    cumwidths = jnp.pad(cumwidths, [(0, 0)] * (cumwidths.ndim - 1) + [(1, 0)])
    cumwidths = (right - left) * cumwidths + left
    cumwidths = cumwidths.at[..., 0].set(left)
    cumwidths = cumwidths.at[..., -1].set(right)
    widths = cumwidths[..., 1:] - cumwidths[..., :-1]

    derivatives = min_derivative + jax.nn.softplus(unnormalized_derivatives)

    heights = jax.nn.softmax(unnormalized_heights, axis=-1)
    heights = min_bin_height + (1.0 - min_bin_height * num_bins) * heights
    cumheights = jnp.cumsum(heights, axis=-1)
    cumheights = jnp.pad(cumheights, [(0, 0)] * (cumheights.ndim - 1) + [(1, 0)])
    cumheights = (top - bottom) * cumheights + bottom
    cumheights = cumheights.at[..., 0].set(bottom)
    cumheights = cumheights.at[..., -1].set(top)
    heights = cumheights[..., 1:] - cumheights[..., :-1]

    if inverse:
        bin_idx = _searchsorted(cumheights, inputs)
    else:
        bin_idx = _searchsorted(cumwidths, inputs)
    bin_idx = jnp.clip(bin_idx, 0, num_bins - 1)[..., None]

    def gather(t):
        return jnp.take_along_axis(t, bin_idx, axis=-1)[..., 0]

    input_cumwidths = gather(cumwidths)
    input_bin_widths = gather(widths)
    input_cumheights = gather(cumheights)
    delta = heights / widths
    input_delta = gather(delta)
    input_derivatives = gather(derivatives)
    input_derivatives_plus_one = gather(derivatives[..., 1:])
    input_heights = gather(heights)

    if inverse:
        a = (inputs - input_cumheights) * (
            input_derivatives + input_derivatives_plus_one - 2.0 * input_delta
        ) + input_heights * (input_delta - input_derivatives)
        b = input_heights * input_derivatives - (inputs - input_cumheights) * (
            input_derivatives + input_derivatives_plus_one - 2.0 * input_delta
        )
        c = -input_delta * (inputs - input_cumheights)
        discriminant = jnp.maximum(b**2 - 4.0 * a * c, 0.0)
        root = (2.0 * c) / (-b - jnp.sqrt(discriminant) - 1e-12)
        outputs = root * input_bin_widths + input_cumwidths
        theta_om = root * (1.0 - root)
        denominator = input_delta + (
            (input_derivatives + input_derivatives_plus_one - 2.0 * input_delta)
            * theta_om
        )
        derivative_numerator = input_delta**2 * (
            input_derivatives_plus_one * root**2
            + 2.0 * input_delta * theta_om
            + input_derivatives * (1.0 - root) ** 2
        )
        logabsdet = jnp.log(jnp.maximum(derivative_numerator, 1e-12)) - 2.0 * jnp.log(
            jnp.maximum(denominator, 1e-12)
        )
        return outputs, -logabsdet

    theta = (inputs - input_cumwidths) / jnp.maximum(input_bin_widths, 1e-12)
    theta_om = theta * (1.0 - theta)
    numerator = input_heights * (
        input_delta * theta**2 + input_derivatives * theta_om
    )
    denominator = input_delta + (
        (input_derivatives + input_derivatives_plus_one - 2.0 * input_delta)
        * theta_om
    )
    outputs = input_cumheights + numerator / jnp.maximum(denominator, 1e-12)
    derivative_numerator = input_delta**2 * (
        input_derivatives_plus_one * theta**2
        + 2.0 * input_delta * theta_om
        + input_derivatives * (1.0 - theta) ** 2
    )
    logabsdet = jnp.log(jnp.maximum(derivative_numerator, 1e-12)) - 2.0 * jnp.log(
        jnp.maximum(denominator, 1e-12)
    )
    return outputs, logabsdet


def unconstrained_rational_quadratic_spline(
    inputs: jnp.ndarray,
    unnormalized_widths: jnp.ndarray,
    unnormalized_heights: jnp.ndarray,
    unnormalized_derivatives: jnp.ndarray,
    inverse: bool = False,
    tail_bound: float = 1.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Linear tails outside [-tail_bound, tail_bound]; identity + logdet 0."""
    inside = (inputs >= -tail_bound) & (inputs <= tail_bound)

    pad = [(0, 0)] * (unnormalized_derivatives.ndim - 1) + [(1, 1)]
    unnormalized_derivatives = jnp.pad(unnormalized_derivatives, pad)
    constant = float(np.log(np.expm1(1.0 - min_derivative)))
    unnormalized_derivatives = unnormalized_derivatives.at[..., 0].set(constant)
    unnormalized_derivatives = unnormalized_derivatives.at[..., -1].set(constant)

    clamped = jnp.clip(inputs, -tail_bound, tail_bound)
    spline_out, spline_logdet = rational_quadratic_spline(
        clamped,
        unnormalized_widths,
        unnormalized_heights,
        unnormalized_derivatives,
        inverse=inverse,
        left=-tail_bound,
        right=tail_bound,
        bottom=-tail_bound,
        top=tail_bound,
        min_bin_width=min_bin_width,
        min_bin_height=min_bin_height,
        min_derivative=min_derivative,
    )
    outputs = jnp.where(inside, spline_out, inputs)
    logabsdet = jnp.where(inside, spline_logdet, 0.0)
    return outputs, logabsdet
