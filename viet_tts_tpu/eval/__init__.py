from viet_tts_tpu.eval.mcd import mcd, mel_cepstra, mel_l1

__all__ = ["mcd", "mel_cepstra", "mel_l1"]
