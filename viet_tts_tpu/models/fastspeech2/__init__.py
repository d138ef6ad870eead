from viet_tts_tpu.models.fastspeech2.model import FastSpeech2, VarianceAdaptor
from viet_tts_tpu.models.fastspeech2.loss import FastSpeech2Loss, total_loss
from viet_tts_tpu.models.fastspeech2.layers import (
    AlignmentEncoder,
    AccentEncoderNetwork,
    DurationPredictor,
    VariancePredictor,
    Postnet,
    ReferenceEncoder,
)

__all__ = [
    "FastSpeech2",
    "VarianceAdaptor",
    "FastSpeech2Loss",
    "total_loss",
    "AlignmentEncoder",
    "AccentEncoderNetwork",
    "DurationPredictor",
    "VariancePredictor",
    "Postnet",
    "ReferenceEncoder",
]
