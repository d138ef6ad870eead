from viet_tts_tpu.models.adaspeech.model import AdaSpeech
from viet_tts_tpu.models.adaspeech.loss import AdaSpeechLoss
from viet_tts_tpu.models.adaspeech.layers import (
    ConditionalLayerNorm,
    CLNTransformerEncoder,
    CLNTransformerDecoder,
    UtteranceEncoder,
    PhonemeLevelEncoder,
    PhonemeLevelPredictor,
)

__all__ = [
    "AdaSpeech",
    "AdaSpeechLoss",
    "ConditionalLayerNorm",
    "CLNTransformerEncoder",
    "CLNTransformerDecoder",
    "UtteranceEncoder",
    "PhonemeLevelEncoder",
    "PhonemeLevelPredictor",
]
