from viet_tts_tpu.models.jets.model import JETS
from viet_tts_tpu.models.jets.layers import (
    AlignmentModule,
    EspnetDurationPredictor,
    EspnetVariancePredictor,
    StyleEncoder,
    StyleTokenLayer,
    VarianceEmbed,
)
from viet_tts_tpu.models.jets.loss import variance_loss, forward_sum_with_prior

__all__ = [
    "JETS",
    "AlignmentModule",
    "EspnetDurationPredictor",
    "EspnetVariancePredictor",
    "StyleEncoder",
    "StyleTokenLayer",
    "VarianceEmbed",
    "variance_loss",
    "forward_sum_with_prior",
]
