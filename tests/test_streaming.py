"""stream_long / synthesize_long behaviour on the shared text front-end
(no model needed: a stub __call__ stands in for synthesis)."""

import numpy as np

from viet_tts_tpu.infer.api import _TTSBase, split_sentences


class _StubTTS(_TTSBase):
    """Deterministic per-sentence 'waveform': sentence word count encoded."""

    def __init__(self):
        super().__init__()
        self.calls = []

    def __call__(self, texts, **kwargs):
        self.calls.append(list(texts))
        return [np.full(100 * len(t.split()), len(t.split()), np.float32)
                for t in texts]


LONG_TEXT = (
    "xin chào các bạn. hôm nay trời đẹp quá! chúng ta cùng nhau học tập. "
    "tôi là một hệ thống tổng hợp tiếng nói; tiếng việt là ngôn ngữ chính. "
    "cảm ơn các bạn đã lắng nghe."
)


def test_stream_matches_concat():
    a, b = _StubTTS(), _StubTTS()
    full = a.synthesize_long(LONG_TEXT)
    chunks = list(b.stream_long(LONG_TEXT))
    assert len(chunks) == len(split_sentences(LONG_TEXT))
    np.testing.assert_array_equal(np.concatenate(chunks), full)


def test_stream_batches_sentences():
    tts = _StubTTS()
    list(tts.stream_long(LONG_TEXT, batch_sentences=2))
    n_sent = len(split_sentences(LONG_TEXT))
    assert len(tts.calls) == (n_sent + 1) // 2
    assert all(len(c) <= 2 for c in tts.calls)


def test_stream_first_chunk_before_last_batch():
    """The first chunk arrives after only the first batch was synthesised."""
    tts = _StubTTS()
    gen = tts.stream_long(LONG_TEXT, batch_sentences=1)
    first = next(gen)
    assert first.size > 0
    assert len(tts.calls) == 1  # only one sentence dispatched so far


def test_empty_text():
    tts = _StubTTS()
    assert tts.synthesize_long("").size == 0
    assert list(tts.stream_long("")) == []


def test_stream_vocoder_matches_full_decode():
    """Chunked decode with receptive-field context == full decode, sample
    for sample (same jitted vocoder, same padding semantics)."""
    import jax
    import jax.numpy as jnp

    from viet_tts_tpu.infer.streaming import stream_vocoder
    from viet_tts_tpu.models.hifigan import HiFiGANGenerator

    gen = HiFiGANGenerator(channels=32, resblock_kernel_sizes=(3, 7),
                           resblock_dilations=((1, 3), (1, 3)))
    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(2, 100, 80).astype(np.float32))
    variables = gen.init(jax.random.PRNGKey(0), mel)

    fn = jax.jit(lambda v, m: gen.apply(v, m)[..., 0])
    full = np.asarray(fn(variables, mel))
    hop = full.shape[1] // mel.shape[1]

    chunks = list(stream_vocoder(fn, variables, mel, hop, chunk_frames=32,
                                 context_frames=16))
    # 100 frames / 32 -> 4 windows, last one 4 frames' worth of samples
    assert len(chunks) == 4
    streamed = np.concatenate(chunks, axis=1)
    assert streamed.shape == full.shape
    np.testing.assert_allclose(streamed, full, rtol=1e-4, atol=1e-5)


def test_two_stage_stream_wav(tmp_path):
    """stream_wav through the TwoStageTTS surface: chunks arrive
    incrementally and concatenate to the batch call's waveform."""
    from tests.test_export import _tiny_two_stage_ckpts
    from viet_tts_tpu.infer.api import TwoStageTTS

    ac, voc = _tiny_two_stage_ckpts(tmp_path)
    tts = TwoStageTTS(ac, voc, model_type="FASTSPEECH2", max_mel_frames=64,
                      packed_vocoder=False)
    text = "xin chào các bạn"
    chunks = list(tts.stream_wav(text, speaker="spk", accent="acc",
                                 chunk_frames=4, context_frames=16))
    streamed = np.concatenate(chunks)
    (ref,) = tts([text], speaker="spk", accent="acc")
    # one chunk per 4 predicted mel frames (last one partial)
    assert len(chunks) == -(-ref.shape[0] // (4 * tts.hop))
    assert streamed.shape == ref.shape
    np.testing.assert_allclose(streamed, ref, rtol=1e-4, atol=1e-4)


def test_one_stage_stream_wav(tmp_path):
    """JETS stream_wav: the split inference_hidden/decode_hidden path,
    chunked, concatenates to the fused __call__ waveform."""
    from tests.test_export import _tiny_jets_ckpt
    from viet_tts_tpu.infer.api import OneStageTTS

    ckpt_dir = _tiny_jets_ckpt(tmp_path)
    tts = OneStageTTS(ckpt_dir, model_type="JETS", max_mel_frames=64,
                      packed_vocoder=False)
    text = "xin chào các bạn"
    chunks = list(tts.stream_wav(text, speaker="spk", chunk_frames=8,
                                 context_frames=16))
    streamed = np.concatenate(chunks)
    (ref,) = tts([text], speaker="spk")
    up = tts._upsample
    assert len(chunks) == -(-ref.shape[0] // (8 * up))
    assert streamed.shape == ref.shape
    np.testing.assert_allclose(streamed, ref, rtol=1e-4, atol=1e-4)


def test_one_stage_stream_wav_vits2(tmp_path):
    """VITS2 stream_wav: split at the flow/decoder boundary; chunks
    concatenate to the fused call's waveform (shared noise key keeps the
    prior sample identical across both paths)."""
    import os

    from tests.test_vits2 import TINY_HP
    from viet_tts_tpu.config import build_config
    from viet_tts_tpu.infer.api import OneStageTTS
    from viet_tts_tpu.train import checkpoint as ckpt

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    conf = build_config(os.path.join(REPO, "config"))
    conf["models"]["vits2"] = dict(TINY_HP)
    out = str(tmp_path / "ckpt")
    ckpt.save_checkpoint(out, "generator", 0, 0, {"params": {}})
    ckpt.save_information(out, conf, speakers={"spk": 0}, accents={})

    tts = OneStageTTS(out, model_type="VITS2", max_mel_frames=64,
                      packed_vocoder=False)
    text = "xin chào các bạn"
    chunks = list(tts.stream_wav(text, speaker="spk", chunk_frames=8,
                                 context_frames=16))
    streamed = np.concatenate(chunks)
    (ref,) = tts([text], speaker="spk")
    assert len(chunks) == -(-ref.shape[0] // (8 * tts._upsample))
    assert streamed.shape == ref.shape
    np.testing.assert_allclose(streamed, ref, rtol=1e-4, atol=1e-4)


def test_one_stage_stream_wav_rejects_joint():
    from viet_tts_tpu.infer.api import OneStageTTS

    tts = OneStageTTS.__new__(OneStageTTS)  # no checkpoint needed
    tts.model_type = "joint"
    import pytest

    with pytest.raises(NotImplementedError):
        next(tts.stream_wav("a"))


def test_stream_wav_long_two_stage(tmp_path):
    """stream_wav_long: per-sentence chunked decode concatenates to the
    per-sentence stream_wav outputs."""
    from tests.test_export import _tiny_two_stage_ckpts
    from viet_tts_tpu.infer.api import TwoStageTTS, split_sentences

    ac, voc = _tiny_two_stage_ckpts(tmp_path)
    tts = TwoStageTTS(ac, voc, model_type="FASTSPEECH2", max_mel_frames=64,
                      packed_vocoder=False)
    text = "xin chào các bạn. hôm nay trời đẹp quá!"
    assert len(split_sentences(text)) == 2
    got = np.concatenate(list(
        tts.stream_wav_long(text, speaker="spk", accent="acc",
                            chunk_frames=8, context_frames=16)
    ))
    want = np.concatenate([
        np.concatenate(list(tts.stream_wav(s, speaker="spk", accent="acc",
                                           chunk_frames=8,
                                           context_frames=16)))
        for s in split_sentences(text)
    ])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
