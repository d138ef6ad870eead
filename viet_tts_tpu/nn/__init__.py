"""Shared neural building blocks (flax)."""

from viet_tts_tpu.nn.transformer import (
    FFTBlock,
    MultiHeadAttention,
    TransformerEncoder,
    TransformerDecoder,
)
from viet_tts_tpu.nn.conformer import (
    ConformerBlock,
    ConformerEncoder,
    ConformerDecoder,
    RelativeMultiHeadAttention,
)
from viet_tts_tpu.nn.utils import (
    sinusoid_position_table,
    pad_mask_from_lengths,
    valid_mask_from_lengths,
)

__all__ = [
    "FFTBlock",
    "MultiHeadAttention",
    "TransformerEncoder",
    "TransformerDecoder",
    "ConformerBlock",
    "ConformerEncoder",
    "ConformerDecoder",
    "RelativeMultiHeadAttention",
    "sinusoid_position_table",
    "pad_mask_from_lengths",
    "valid_mask_from_lengths",
]
