from viet_tts_tpu.models.matcha.model import CFM, MatchaTTS, fix_len_compatibility
from viet_tts_tpu.models.matcha.layers import TextEncoder, RoPEEncoder
from viet_tts_tpu.models.matcha.decoder import UNetDecoder
from viet_tts_tpu.models.matcha.loss import MatchaTTSLoss

__all__ = [
    "CFM",
    "MatchaTTS",
    "fix_len_compatibility",
    "TextEncoder",
    "RoPEEncoder",
    "UNetDecoder",
    "MatchaTTSLoss",
]
