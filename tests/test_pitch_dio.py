"""Pitch-extractor validation on speech-like fixtures (VERDICT round-1 #5).

The reference's pitch targets come from pyworld DIO+StoneMask (espnet Dio,
`src/tools/tools_for_data.py:134-139`). pyworld is unavailable here, so
`dsp/dio.py` reimplements the algorithms; these tests bound both DIO and
the NCCF tracker against known ground-truth F0 on a synthetic utterance
with the statistics of real speech: a glottal-rich vibrato voiced span
shaped by formant resonators, an unvoiced fricative span, and silence.
"""

import numpy as np
import pytest

SR = 22050
HOP = 256


def _resonate(s, fc, bw, sr=SR):
    from scipy.signal import lfilter

    r = np.exp(-np.pi * bw / sr)
    theta = 2 * np.pi * fc / sr
    return lfilter([1 - 2 * r * np.cos(theta) + r * r],
                   [1, -2 * r * np.cos(theta), r * r], s)


def speech_fixture(seed=0, f0_base=155.0, f0_vib=20.0, h2_boost=1.0,
                   am_onset=0.0):
    """(audio, frame ground-truth F0 in Hz (0 = unvoiced)).

    Layout: 0.15s silence | 0.8s voiced vibrato | 0.25s unvoiced
    fricative | 0.1s silence.

    Stress knobs (VERDICT r2 item 6): ``f0_base``/``f0_vib`` move the
    contour to the 80-90 Hz male-creak floor or the 350-400 Hz ceiling;
    ``h2_boost`` over-weights the second harmonic (the classic octave-up
    bait); ``am_onset`` > 0 amplitude-modulates voicing on/offsets with a
    ramp of that many seconds.
    """
    rng = np.random.RandomState(seed)
    sil1 = np.zeros(int(0.15 * SR))
    nv = int(0.8 * SR)
    t = np.arange(nv) / SR
    f0 = f0_base + f0_vib * np.sin(2 * np.pi * 2.5 * t)
    phase = 2 * np.pi * np.cumsum(f0) / SR
    weights = {h: (h2_boost if h == 2 else 1.0) / h for h in range(1, 30)}
    voiced = sum(w * np.sin(h * phase) for h, w in weights.items())
    for fc, bw in [(600, 90), (1400, 120), (2600, 220)]:
        voiced = _resonate(voiced, fc, bw)
    voiced = voiced / np.max(np.abs(voiced))
    if am_onset > 0:
        n_ramp = min(int(am_onset * SR), nv // 2)
        env = np.ones(nv)
        env[:n_ramp] = np.linspace(0.0, 1.0, n_ramp)
        env[-n_ramp:] = np.linspace(1.0, 0.0, n_ramp)
        voiced = voiced * env
    voiced += rng.randn(nv) * 0.01  # light additive noise
    nf = int(0.25 * SR)
    fric = _resonate(rng.randn(nf), 4500, 1500) * 0.15
    sil2 = np.zeros(int(0.1 * SR))
    audio = np.concatenate([sil1, voiced, fric, sil2]).astype(np.float64)

    n_frames = int(len(audio) / SR / (HOP / SR)) + 1
    ft = np.arange(n_frames) * HOP / SR
    gt = np.zeros(n_frames)
    v0, v1 = 0.15, 0.15 + 0.8
    in_v = (ft >= v0) & (ft < v1)
    gt[in_v] = f0_base + f0_vib * np.sin(2 * np.pi * 2.5 * (ft[in_v] - v0))
    return audio, ft, gt


def _score(f0_hz, gt, margin=3):
    """(voicing recall, voicing false-alarm rate, voiced log-F0 RMSE).

    ``margin`` frames around voicing boundaries are excluded (frame-centred
    windows straddle the boundary there by construction).
    """
    v_gt = gt > 0
    edges = np.nonzero(np.diff(v_gt.astype(int)))[0]
    keep = np.ones(len(gt), bool)
    for e in edges:
        keep[max(0, e - margin) : e + margin + 1] = False
    v_est = f0_hz > 0
    recall = (v_est & v_gt & keep).sum() / max((v_gt & keep).sum(), 1)
    false_alarm = (v_est & ~v_gt & keep).sum() / max((~v_gt & keep).sum(), 1)
    both = v_est & v_gt & keep
    rmse = float(
        np.sqrt(np.mean((np.log(f0_hz[both]) - np.log(gt[both])) ** 2))
    ) if both.any() else np.inf
    return recall, false_alarm, rmse


def _octave_error_rate(f0_hz, gt, margin=3):
    """Fraction of agreed-voiced frames whose error exceeds half an octave
    (i.e. the tracker locked onto a harmonic/subharmonic)."""
    v_gt = gt > 0
    edges = np.nonzero(np.diff(v_gt.astype(int)))[0]
    keep = np.ones(len(gt), bool)
    for e in edges:
        keep[max(0, e - margin) : e + margin + 1] = False
    both = (f0_hz > 0) & v_gt & keep
    if not both.any():
        return 1.0
    return float(
        (np.abs(np.log2(f0_hz[both] / gt[both])) > 0.5).mean()
    )


@pytest.mark.parametrize("seed", range(5))
def test_dio_tracks_speech_fixture(seed):
    from viet_tts_tpu.dsp.dio import dio, stonemask

    audio, ft, gt = speech_fixture(seed)
    f0, t = dio(audio, SR, hop_length=HOP)
    f0 = stonemask(audio, f0, t, SR)
    recall, fa, rmse = _score(f0[: len(gt)], gt)
    assert recall > 0.90, recall
    assert fa < 0.10, fa
    assert rmse < 0.02, rmse  # < ~2% (35 cents); typical DIO-grade accuracy
    assert _octave_error_rate(f0[: len(gt)], gt) < 0.01


STRESS_CASES = {
    # 80-90 Hz male creak with a dominant 2nd harmonic: the octave-up bait
    "low_f0_strong_h2": dict(f0_base=85.0, f0_vib=4.0, h2_boost=2.5),
    # 345-395 Hz, hugging DIO's default 400 Hz ceiling
    "high_f0_near_ceiling": dict(f0_base=370.0, f0_vib=25.0),
    # amplitude-modulated voicing onset/offset (100 ms ramps)
    "am_voicing_edges": dict(am_onset=0.1),
}


@pytest.mark.parametrize("case", sorted(STRESS_CASES))
@pytest.mark.parametrize("seed", [1, 7])
def test_dio_stress_matrix(case, seed):
    """Octave-error rate ~= 0 and DIO-grade RMSE across the stress matrix
    (reference pitch-target semantics: `src/tools/tools_for_data.py:134-139`)."""
    from viet_tts_tpu.dsp.dio import dio, stonemask

    kw = STRESS_CASES[case]
    audio, ft, gt = speech_fixture(seed, **kw)
    f0, t = dio(audio, SR, hop_length=HOP)
    f0 = stonemask(audio, f0, t, SR)
    # AM edges: exclude the ramp region from scoring (sub-gate energy is
    # legitimately unvoiced to any tracker); elsewhere the default margin
    margin = int(0.1 * SR / HOP) + 3 if kw.get("am_onset") else 3
    recall, fa, rmse = _score(f0[: len(gt)], gt, margin=margin)
    assert recall > 0.85, (case, recall)
    assert fa < 0.10, (case, fa)
    assert rmse < 0.03, (case, rmse)
    assert _octave_error_rate(f0[: len(gt)], gt, margin=margin) < 0.01, case


@pytest.mark.parametrize("case", sorted(STRESS_CASES))
def test_nccf_stress_octave_errors(case):
    """The fast NCCF tracker also stays octave-stable on the stress cases."""
    from viet_tts_tpu.dsp.pitch import extract_f0

    audio, ft, gt = speech_fixture(1, **STRESS_CASES[case])
    f0 = extract_f0(audio, SR, HOP, use_log_f0=False, target_len=len(gt))
    margin = int(0.1 * SR / HOP) + 3 if case == "am_voicing_edges" else 3
    assert _octave_error_rate(f0, gt, margin=margin) < 0.02, case


def test_stonemask_corrects_coarse_contour():
    """StoneMask's job: pull a coarse/perturbed DIO contour back onto the
    true instantaneous frequency."""
    from viet_tts_tpu.dsp.dio import dio, stonemask

    audio, ft, gt = speech_fixture()
    f0, t = dio(audio, SR, hop_length=HOP)
    rng = np.random.RandomState(0)
    perturbed = f0 * np.where(
        f0 > 0, 1.0 + 0.04 * rng.uniform(-1, 1, f0.shape), 1.0
    )
    _, _, rmse_pert = _score(perturbed[: len(gt)], gt)
    refined = stonemask(audio, perturbed, t, SR)
    _, _, rmse_ref = _score(refined[: len(gt)], gt)
    assert rmse_pert > 0.015  # the perturbation is material
    assert rmse_ref < rmse_pert / 3, (rmse_pert, rmse_ref)
    assert rmse_ref < 0.006, rmse_ref


def test_nccf_bounded_against_ground_truth():
    """The fast NCCF tracker stays within DIO-grade bounds on the same
    fixture (voicing agreement + voiced log-F0 RMSE)."""
    from viet_tts_tpu.dsp.pitch import extract_f0

    audio, ft, gt = speech_fixture()
    logf0 = extract_f0(audio, SR, HOP, use_log_f0=False, target_len=len(gt))
    recall, fa, rmse = _score(logf0, gt)
    assert recall > 0.90, recall
    assert fa < 0.15, fa
    assert rmse < 0.02, rmse


def test_dio_and_nccf_agree_on_voiced_frames():
    from viet_tts_tpu.dsp.dio import extract_f0_dio
    from viet_tts_tpu.dsp.pitch import extract_f0

    audio, ft, gt = speech_fixture()
    a = extract_f0_dio(audio, SR, HOP, target_len=len(gt))
    b = extract_f0(audio, SR, HOP, target_len=len(gt))
    both = (a > 0) & (b > 0)
    # voiced span is ~62% of the fixture; require most of it agreed-voiced
    assert both.sum() > 0.85 * (gt > 0).sum()
    assert float(np.sqrt(np.mean((a[both] - b[both]) ** 2))) < 0.02


def test_extract_f0_dio_output_contract():
    """log-F0, zeros at unvoiced, exact target_len (espnet Dio contract)."""
    from viet_tts_tpu.dsp.dio import extract_f0_dio

    audio, ft, gt = speech_fixture()
    out = extract_f0_dio(audio, SR, HOP, target_len=97)
    assert out.shape == (97,) and out.dtype == np.float32
    voiced = out[out > 0]
    assert voiced.size and (voiced > np.log(70)).all() and (
        voiced < np.log(500)
    ).all()


# ---------------------------------------------------------------------------
# Glottal-pulse vowel corpus (VERDICT r3 weak #6): a Klatt-style
# source-filter corpus — impulse-train glottal source with -12 dB/oct
# spectral tilt, Peterson-Barney formant targets per vowel, lip-radiation
# differentiation — under natural F0 contours (declarative declination,
# late interrogative rise, low flat). Closer to recorded speech than the
# additive-harmonic fixture above: the waveform is pulse-shaped, the
# spectrum formant-dominated, and the contour aperiodic frame-to-frame.
# ---------------------------------------------------------------------------

VOWEL_FORMANTS = {
    "a": ((730, 90), (1090, 110), (2440, 170)),
    "i": ((270, 60), (2290, 150), (3010, 200)),
    "u": ((300, 60), (870, 100), (2240, 180)),
}


def _f0_contour(kind, n):
    t = np.arange(n) / n
    if kind == "declarative":
        return 190.0 * np.exp(-0.45 * t)  # 190 -> ~121 Hz declination
    if kind == "interrogative":
        return 115.0 + 105.0 * t ** 3  # late rise to 220 Hz
    return np.full(n, 95.0)  # low flat (creak-adjacent)


def vowel_fixture(vowel, contour, seed=0):
    from scipy.signal import lfilter

    rng = np.random.RandomState(seed)
    dur = 0.7
    n = int(dur * SR)
    f0 = _f0_contour(contour, n)
    phase = np.cumsum(f0) / SR
    src = np.zeros(n)
    idx = np.searchsorted(phase, np.arange(1, int(phase[-1]) + 1))
    src[idx[idx < n]] = 1.0
    # glottal spectral tilt: two one-pole lowpasses (~-12 dB/oct)
    src = lfilter([1.0], [1, -0.96], src)
    src = lfilter([1.0], [1, -0.96], src)
    out = src.copy()
    for fc, bw in VOWEL_FORMANTS[vowel]:
        out = _resonate(out, fc, bw)
    out = np.diff(out, prepend=0.0)  # lip radiation
    out = out / np.max(np.abs(out)) + rng.randn(n) * 0.005
    sil = np.zeros(int(0.1 * SR))
    audio = np.concatenate([sil, out, sil])
    n_frames = int(len(audio) / HOP) + 1
    ft = np.arange(n_frames) * HOP / SR
    gt = np.zeros(n_frames)
    in_v = (ft >= 0.1) & (ft < 0.1 + dur)
    rel = ((ft[in_v] - 0.1) * SR).astype(int).clip(0, n - 1)
    gt[in_v] = f0[rel]
    return audio, ft, gt


@pytest.mark.parametrize("vowel", sorted(VOWEL_FORMANTS))
@pytest.mark.parametrize("contour", ["declarative", "interrogative", "flat"])
def test_dio_tracks_vowel_corpus(vowel, contour):
    """DIO+StoneMask track the full vowel corpus with DIO-grade accuracy
    (calibrated: recall 1.0, log-F0 RMSE < 0.6%, zero octave errors
    across all 9 combos)."""
    from viet_tts_tpu.dsp.dio import dio, stonemask

    audio, ft, gt = vowel_fixture(vowel, contour, seed=3)
    f0, t = dio(audio, SR, hop_length=HOP)
    f0 = stonemask(audio, f0, t, SR)
    recall, fa, rmse = _score(f0[: len(gt)], gt)
    assert recall > 0.95, (vowel, contour, recall)
    assert fa < 0.05, (vowel, contour, fa)
    assert rmse < 0.015, (vowel, contour, rmse)
    assert _octave_error_rate(f0[: len(gt)], gt) < 0.005, (vowel, contour)
