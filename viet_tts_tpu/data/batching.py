"""Bucketed static-shape batching — the TPU replacement for dynamic padding.

The reference sorts each batch by length and pads to the batch max
(`fastspeech2_loader.py:192-243`), which would retrace XLA on every new
shape. Here every batch is padded to one of a small, fixed set of
(text_len, mel_len) bucket shapes, so jit compiles a handful of graphs once
and reuses them for the whole run. Batches are full-size (short buckets are
padded with repeated samples and masked by lengths).
"""

from __future__ import annotations

import math
import queue
import threading
from typing import Callable, Dict, Iterator, List, Sequence

import numpy as np

DEFAULT_TEXT_BUCKETS = (32, 64, 96, 128, 160, 192, 256)
DEFAULT_MEL_BUCKETS = (128, 256, 384, 512, 640, 768, 896, 1008)


def bucket_for(value: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if value <= b:
            return b
    return buckets[-1]


def pad_to(x: np.ndarray, length: int, axis: int = 0) -> np.ndarray:
    if x.shape[axis] >= length:
        slicer = [slice(None)] * x.ndim
        slicer[axis] = slice(0, length)
        return x[tuple(slicer)]
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, length - x.shape[axis])
    return np.pad(x, widths)


def collate_acoustic(items: List[dict], t_text: int, t_mel: int) -> Dict[str, np.ndarray]:
    """Stack per-utterance dicts into one static-shape batch."""
    B = len(items)
    n_mels = items[0]["feat"].shape[1]

    batch = dict(
        text=np.zeros((B, t_text), np.int32),
        text_lengths=np.zeros(B, np.int32),
        feats=np.zeros((B, t_mel, n_mels), np.float32),
        feats_lengths=np.zeros(B, np.int32),
        pitch=np.zeros((B, t_mel), np.float32),
        energy=np.zeros((B, t_mel), np.float32),
        sids=np.zeros(B, np.int32),
        aids=np.zeros(B, np.int32),
        word_ids=np.full((B, t_text), -1, np.int32),
    )
    dur0 = items[0]["duration"]
    if dur0.ndim == 2:  # beta-binomial prior (T_mel, T_text)
        batch["duration"] = np.zeros((B, t_mel, t_text), np.float32)
    else:
        batch["duration"] = np.zeros((B, t_text), np.int32)

    for i, it in enumerate(items):
        nt = min(len(it["text"]), t_text)
        nm = min(it["feat"].shape[0], t_mel)
        batch["text"][i] = pad_to(it["text"], t_text)
        batch["text_lengths"][i] = nt
        batch["feats"][i] = pad_to(it["feat"], t_mel)
        batch["feats_lengths"][i] = nm
        batch["pitch"][i] = pad_to(it["pitch"], t_mel)
        batch["energy"][i] = pad_to(it["energy"], t_mel)
        batch["sids"][i] = it["sid"]
        batch["aids"][i] = it["aid"]
        batch["word_ids"][i, :nt] = it["word_ids"][:nt]  # pad stays -1
        if dur0.ndim == 2:
            batch["duration"][i, :nm, :nt] = it["duration"][:t_mel, :t_text]
        else:
            batch["duration"][i] = pad_to(it["duration"], t_text)
    return batch


def make_jets_collate(hop_length: int = 256):
    """Acoustic collate + aligned padded waveform; no duration slot (JETS
    learns alignment in-graph)."""

    def collate(items: List[dict], t_text: int, t_mel: int) -> Dict[str, np.ndarray]:
        batch = collate_acoustic(items, t_text, t_mel)
        del batch["duration"]
        B = len(items)
        t_wav = t_mel * hop_length
        speech = np.zeros((B, t_wav), np.float32)
        for i, it in enumerate(items):
            a = it["speech"][:t_wav]
            speech[i, : len(a)] = a
        batch["speech"] = speech
        return batch

    return collate


class _PrefetchIterator:
    """Background-thread prefetch over a batch generator.

    The reference feeds its train loops from a ``num_workers=0`` torch
    ``DataLoader`` (`src/trainer/fastspeech2_trainer.py:36-53`), so every
    host-side collate blocks the device step. Here the producer generator
    (disk reads + numpy collate) runs in a daemon thread filling a bounded
    queue, so batch ``i+1`` is assembled while the jitted step for batch
    ``i`` executes on the TPU. numpy collate releases the GIL for the big
    copies, so a single thread is enough to hide the pipeline at the
    batch sizes in play (see ``bench.py`` ``input_pipeline_frac``).
    """

    _DONE = object()

    def __init__(self, make_gen: Callable[[], Iterator], depth: int):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._produce, args=(make_gen,), daemon=True)
        self._thread.start()

    def _produce(self, make_gen: Callable[[], Iterator]) -> None:
        try:
            for item in make_gen():
                while not self._stop.is_set():
                    try:
                        self._q.put(("item", item), timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if self._stop.is_set():
                    return
            self._q.put(("done", None))
        except BaseException as exc:  # surface producer errors to the consumer
            if not self._stop.is_set():
                self._q.put(("error", exc))

    def __iter__(self) -> "_PrefetchIterator":
        return self

    def __next__(self):
        kind, payload = self._q.get()
        if kind == "item":
            return payload
        if kind == "error":
            self.close()
            raise payload
        self.close()
        raise StopIteration

    def close(self) -> None:
        self._stop.set()
        # unblock a producer stuck on put()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass

    def __del__(self):  # dropped mid-epoch (e.g. max_iter reached)
        self.close()


def prefetched(make_gen: Callable[[], Iterator], depth: int) -> Iterator:
    """Wrap a generator factory with background prefetch (depth<=0: inline)."""
    if depth <= 0:
        return make_gen()
    return _PrefetchIterator(make_gen, depth)


class BucketBatcher:
    """Groups dataset indices into fixed-shape batches.

    Epoch order is shuffled; each batch is exactly ``batch_size`` (the last
    partial group of a bucket is filled by repeating its own samples, which
    are masked by lengths downstream).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        text_buckets: Sequence[int] = DEFAULT_TEXT_BUCKETS,
        mel_buckets: Sequence[int] = DEFAULT_MEL_BUCKETS,
        seed: int = 0,
        drop_incomplete: bool = False,
        collate_fn=collate_acoustic,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.text_buckets = text_buckets
        self.mel_buckets = mel_buckets
        self.rng = np.random.RandomState(seed)
        self.drop_incomplete = drop_incomplete
        self.collate_fn = collate_fn
        self.prefetch = prefetch
        # measure lengths once (items stay on disk)
        self._shapes = []
        for i in range(len(dataset)):
            row = dataset.inputs[i]
            n_text = len(row[2].split())
            self._shapes.append(n_text)

    def _mel_len(self, item) -> int:
        return item["feat"].shape[0]

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        return prefetched(self._generate, self.prefetch)

    def _generate(self) -> Iterator[Dict[str, np.ndarray]]:
        order = self.rng.permutation(len(self.dataset))
        groups: Dict[tuple, List[dict]] = {}
        for idx in order:
            item = self.dataset[int(idx)]
            key = (
                bucket_for(len(item["text"]), self.text_buckets),
                bucket_for(self._mel_len(item), self.mel_buckets),
            )
            groups.setdefault(key, []).append(item)
            if len(groups[key]) == self.batch_size:
                yield self.collate_fn(groups.pop(key), *key)
        for key, items in groups.items():
            if self.drop_incomplete and len(items) < self.batch_size:
                continue
            while len(items) < self.batch_size:  # repeat-fill to static B
                items.append(items[len(items) % max(len(items), 1)])
            yield self.collate_fn(items, *key)

    def __len__(self) -> int:
        # upper bound (exact requires a pass; fine for progress display)
        return math.ceil(len(self.dataset) / self.batch_size)
