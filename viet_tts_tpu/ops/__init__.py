"""On-device primitives: alignment search, forward-sum, duration ops."""

from viet_tts_tpu.ops.mas import (
    monotonic_alignment,
    binarize_attention,
    viterbi_decode,
    maximum_path,
)
from viet_tts_tpu.ops.forward_sum import (
    ctc_forward_sum,
    forward_sum_loss,
    jets_forward_sum_loss,
    beta_binomial_log_prior,
    bin_loss,
)
from viet_tts_tpu.ops.duration import (
    duration_to_index,
    length_regulator,
    gaussian_upsample,
    average_by_duration,
    expand_path_average,
    aggregate_by_ids,
)
from viet_tts_tpu.ops.segments import get_segments, get_random_segments
from viet_tts_tpu.ops.prior import beta_binomial_prior

__all__ = [
    "monotonic_alignment",
    "binarize_attention",
    "viterbi_decode",
    "maximum_path",
    "ctc_forward_sum",
    "forward_sum_loss",
    "jets_forward_sum_loss",
    "beta_binomial_log_prior",
    "bin_loss",
    "duration_to_index",
    "length_regulator",
    "gaussian_upsample",
    "average_by_duration",
    "expand_path_average",
    "aggregate_by_ids",
    "get_segments",
    "get_random_segments",
    "beta_binomial_prior",
]
