from viet_tts_tpu.models.text2wav.model import Text2Wav

__all__ = ["Text2Wav"]
