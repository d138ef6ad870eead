from viet_tts_tpu.models.hifigan.generator import (
    HiFiGANGenerator,
    ResidualBlock,
    WNConv1d,
    WNConvTranspose1d,
)
from viet_tts_tpu.models.hifigan.discriminator import (
    PeriodDiscriminator,
    MultiPeriodDiscriminator,
    ScaleDiscriminator,
    MultiScaleDiscriminator,
    MultiScaleMultiPeriodDiscriminator,
)
from viet_tts_tpu.models.hifigan.loss import (
    generator_adversarial_loss,
    discriminator_adversarial_loss,
    feature_match_loss,
    MelSpectrogramLoss,
)

__all__ = [
    "HiFiGANGenerator",
    "ResidualBlock",
    "WNConv1d",
    "WNConvTranspose1d",
    "PeriodDiscriminator",
    "MultiPeriodDiscriminator",
    "ScaleDiscriminator",
    "MultiScaleDiscriminator",
    "MultiScaleMultiPeriodDiscriminator",
    "generator_adversarial_loss",
    "discriminator_adversarial_loss",
    "feature_match_loss",
    "MelSpectrogramLoss",
]
