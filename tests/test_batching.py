"""Batching + background prefetch tests (quick suite, no JAX compiles).

The reference's loaders are synchronous ``num_workers=0`` torch DataLoaders
(`/root/reference/src/trainer/fastspeech2_trainer.py:36-53`); our batchers
overlap host collate with device steps via a bounded-queue prefetch thread.
"""

import threading
import time

import numpy as np
import pytest

from viet_tts_tpu.data.batching import BucketBatcher, prefetched


def test_prefetched_preserves_order_and_items():
    src = list(range(57))
    out = list(prefetched(lambda: iter(src), depth=4))
    assert out == src


def test_prefetched_depth_zero_is_inline():
    gen = iter([1, 2, 3])
    assert prefetched(lambda: gen, depth=0) is gen


def test_prefetched_propagates_producer_error():
    def boom():
        yield 1
        raise ValueError("producer failed")

    it = prefetched(boom, depth=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="producer failed"):
        list(it)


def test_prefetched_abandoned_iterator_unblocks_producer():
    started = threading.Event()

    def slow_infinite():
        i = 0
        while True:
            started.set()
            yield i
            i += 1

    it = prefetched(slow_infinite, depth=2)
    assert next(it) == 0
    started.wait(timeout=5)
    it.close()
    # producer thread must exit once stop is set (queue drained + put aborted)
    it._thread.join(timeout=5)
    assert not it._thread.is_alive()


def test_prefetched_overlaps_producer_with_consumer():
    """With depth>=1 the producer works ahead: total wall time approaches
    max(produce, consume) rather than their sum."""
    n, delay = 8, 0.03

    def produce():
        for i in range(n):
            time.sleep(delay)
            yield i

    t0 = time.monotonic()
    for _ in prefetched(produce, depth=4):
        time.sleep(delay)  # simulate device step
    overlapped = time.monotonic() - t0
    # serial cost would be ~2*n*delay; allow generous slack for CI jitter
    assert overlapped < 1.7 * n * delay


class _FakeAcousticDataset:
    """Minimal stand-in exposing what BucketBatcher touches."""

    def __init__(self, n=10, seed=0):
        rng = np.random.RandomState(seed)
        self.items = []
        self.inputs = []
        for i in range(n):
            n_text = int(rng.randint(4, 12))
            n_mel = int(rng.randint(40, 200))
            self.items.append(
                dict(
                    text=np.arange(n_text, dtype=np.int32),
                    feat=rng.randn(n_mel, 80).astype(np.float32),
                    pitch=rng.randn(n_mel).astype(np.float32),
                    energy=rng.randn(n_mel).astype(np.float32),
                    duration=np.ones(n_text, np.int64),
                    sid=0,
                    aid=0,
                    word_ids=np.zeros(n_text, np.int32),
                )
            )
            self.inputs.append(("p", 0, " ".join(["w"] * n_text)))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def test_bucket_batcher_prefetch_matches_inline():
    ds = _FakeAcousticDataset()
    inline = list(BucketBatcher(ds, 4, seed=3, prefetch=0))
    bg = list(BucketBatcher(ds, 4, seed=3, prefetch=2))
    assert len(inline) == len(bg)
    for a, b in zip(inline, bg):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
