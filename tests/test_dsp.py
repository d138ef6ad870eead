"""DSP parity tests: JAX STFT vs torch.stft, mel/energy semantics, pitch."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from viet_tts_tpu.dsp import (
    stft,
    spectrogram_amplitude,
    log_mel_spectrogram,
    frame_energy,
    mel_filterbank,
    extract_f0,
    interpolate_unvoiced,
    num_frames,
)

SR, N_FFT, HOP, WIN = 22050, 1024, 256, 1024


@pytest.fixture(scope="module")
def audio():
    rng = np.random.RandomState(0)
    t = np.arange(SR) / SR
    x = 0.5 * np.sin(2 * np.pi * 220 * t) + 0.05 * rng.randn(SR)
    return x.astype(np.float32)


def _torch_stft(x):
    return torch.stft(
        torch.from_numpy(x),
        n_fft=N_FFT,
        hop_length=HOP,
        win_length=WIN,
        window=torch.hann_window(WIN),
        center=True,
        return_complex=True,
    ).numpy()  # (freq, frames)


def test_stft_matches_torch(audio):
    ref = _torch_stft(audio).T  # (frames, freq)
    got = np.asarray(stft(jnp.asarray(audio), N_FFT, HOP, WIN))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=2e-3)


def test_frame_count(audio):
    got = np.asarray(stft(jnp.asarray(audio), N_FFT, HOP, WIN))
    assert got.shape[0] == num_frames(len(audio), HOP) == 1 + len(audio) // HOP


def test_amplitude_clamp():
    zeros = jnp.zeros((1, 2048))
    amp = spectrogram_amplitude(stft(zeros, N_FFT, HOP, WIN))
    assert np.allclose(np.asarray(amp), np.sqrt(1e-10))


def test_mel_filterbank_properties():
    fb = mel_filterbank(SR, N_FFT, 80, 0.0, None)
    assert fb.shape == (N_FFT // 2 + 1, 80)
    assert (fb >= 0).all()
    # every filter has support, peaks are monotonically increasing in freq
    peaks = fb.argmax(axis=0)
    assert (np.diff(peaks) >= 0).all()
    assert fb.sum() > 0


def test_log_mel_matches_espnet_pipeline(audio):
    """Recompute the espnet semantics with torch ops and compare."""
    spec = _torch_stft(audio).T
    amp = np.sqrt(np.maximum(np.abs(spec) ** 2, 1e-10))
    fb = mel_filterbank(SR, N_FFT, 80, 0.0, None)
    ref = np.log(np.maximum(amp @ fb, 1e-10))
    got = np.asarray(log_mel_spectrogram(jnp.asarray(audio), SR, N_FFT, HOP, WIN))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=2e-3)


def test_energy_semantics(audio):
    cfg = {
        "stft": {
            "filter_length": N_FFT,
            "hop_length": HOP,
            "win_length": WIN,
            "window": "hann",
        }
    }
    spec = _torch_stft(audio).T
    ref = np.sqrt(np.maximum((np.abs(spec) ** 2).sum(-1), 1e-10))
    got = np.asarray(frame_energy(jnp.asarray(audio), cfg))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-2)


def test_batched_log_mel(audio):
    batch = jnp.stack([jnp.asarray(audio)] * 3)
    out = log_mel_spectrogram(batch, SR, N_FFT, HOP, WIN)
    assert out.shape == (3, num_frames(len(audio), HOP), 80)


def test_pitch_pure_tone():
    t = np.arange(2 * SR) / SR
    x = 0.7 * np.sin(2 * np.pi * 220.0 * t).astype(np.float32)
    f0 = extract_f0(x, SR, HOP, use_log_f0=False)
    voiced = f0[f0 > 0]
    assert len(voiced) > 0.8 * len(f0)
    assert abs(np.median(voiced) - 220.0) < 4.0


def test_pitch_log_and_length():
    t = np.arange(SR) / SR
    x = 0.7 * np.sin(2 * np.pi * 110.0 * t).astype(np.float32)
    n = num_frames(len(x), HOP)
    lf0 = extract_f0(x, SR, HOP, target_len=n)
    assert len(lf0) == n
    voiced = lf0[lf0 != 0]
    assert abs(np.exp(np.median(voiced)) - 110.0) < 4.0


def test_pitch_silence_unvoiced():
    x = np.zeros(SR, dtype=np.float32)
    f0 = extract_f0(x, SR, HOP)
    assert (f0 == 0).all()


def test_interpolate_unvoiced():
    f0 = np.array([0, 2.0, 0, 0, 4.0, 0], dtype=np.float32)
    out = interpolate_unvoiced(f0)
    assert out[0] == 2.0 and out[-1] == 4.0
    np.testing.assert_allclose(out[2:4], [8 / 3, 10 / 3], rtol=1e-5)
