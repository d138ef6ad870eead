"""Signal processing: STFT/mel features, audio IO, pitch extraction."""

from viet_tts_tpu.dsp.stft import (
    stft,
    spectrogram_amplitude,
    linear_spectrogram,
    log_spectrogram,
    log_mel_spectrogram,
    log_mel_from_config,
    frame_energy,
    mel_filterbank,
    hann_window,
    num_frames,
)
from viet_tts_tpu.dsp.audio import (
    read_wav,
    write_wav,
    to_mono,
    peak_normalize,
    resample,
    trim_silence,
    loudness_normalize,
    preprocess_wav,
)
from viet_tts_tpu.dsp.pitch import extract_f0, interpolate_unvoiced

__all__ = [
    "stft",
    "spectrogram_amplitude",
    "linear_spectrogram",
    "log_spectrogram",
    "log_mel_spectrogram",
    "log_mel_from_config",
    "frame_energy",
    "mel_filterbank",
    "hann_window",
    "num_frames",
    "read_wav",
    "write_wav",
    "to_mono",
    "peak_normalize",
    "resample",
    "trim_silence",
    "loudness_normalize",
    "preprocess_wav",
    "extract_f0",
    "interpolate_unvoiced",
]
