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
