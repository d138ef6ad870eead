"""Native C++ data-runtime tests: npy/wav readers and parallel collate."""

import numpy as np
import pytest

from viet_tts_tpu.dsp.audio import write_wav
from viet_tts_tpu.runtime import native


@pytest.fixture(scope="module")
def npy_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("npy")
    rng = np.random.RandomState(0)
    paths, arrays = [], []
    for i, rows in enumerate([50, 80, 20]):
        a = rng.randn(rows, 16).astype(np.float32)
        p = str(d / f"f{i}.npy")
        np.save(p, a)
        paths.append(p)
        arrays.append(a)
    v = rng.randn(64).astype(np.float32)  # 1-D artifact (pitch/energy style)
    pv = str(d / "vec.npy")
    np.save(pv, v)
    return paths, arrays, pv, v


def test_native_builds():
    assert native.available(), "g++ build of the native runtime failed"


def test_npy_shape(npy_files):
    paths, arrays, pv, v = npy_files
    assert native.npy_shape(paths[0]) == (50, 16)
    assert native.npy_shape(pv) == (64, 1)


def test_npy_read_padded(npy_files):
    paths, arrays, _, _ = npy_files
    out, rows = native.npy_read_f32(paths[1], 100, 16)
    assert rows == 80
    np.testing.assert_array_equal(out[:80], arrays[1])
    assert (out[80:] == 0).all()
    # truncation
    out, rows = native.npy_read_f32(paths[1], 40, 16)
    assert rows == 40
    np.testing.assert_array_equal(out, arrays[1][:40])


def test_npy_read_1d(npy_files):
    _, _, pv, v = npy_files
    out, rows = native.npy_read_f32(pv, 100, 1)
    assert rows == 64
    np.testing.assert_array_equal(out[:64, 0], v)


def test_collate_features_parallel(npy_files):
    paths, arrays, _, _ = npy_files
    batch, lengths = native.collate_features(paths, 100, 16)
    assert batch.shape == (3, 100, 16)
    np.testing.assert_array_equal(lengths, [50, 80, 20])
    for i, a in enumerate(arrays):
        np.testing.assert_array_equal(batch[i, : len(a)], a)
        assert (batch[i, len(a):] == 0).all()


def test_wav_roundtrip(tmp_path):
    sr = 22050
    t = np.arange(sr // 2) / sr
    audio = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, audio, sr)
    back, got_sr = native.wav_read_f32(p)
    assert got_sr == sr
    assert len(back) == len(audio)
    assert np.abs(back - audio).max() < 1e-4
