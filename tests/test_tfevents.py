"""Native TFEvent writer: framing, CRC, proto round-trip, TensorLogger.

The reference's observability is tensorboardX scalars + parameter
histograms (`/root/reference/log/logger.py:16-36`); our writer emits the
same on-disk format from the stdlib. These tests re-parse the file byte
level (CRC-verified) rather than trusting the writer's own bookkeeping.
"""

import numpy as np

from viet_tts_tpu.utils.tfevents import (
    EventWriter,
    _crc32c,
    _masked_crc,
    read_events,
)


def test_crc32c_known_vectors():
    # RFC 3720 / kernel test vectors for CRC-32C (Castagnoli)
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"") == 0x0
    assert _crc32c(b"\x00" * 32) == 0x8A9136AA
    # TFRecord masking is a rotation + constant; spot-check determinism
    assert _masked_crc(b"123456789") == (((0xE3069283 >> 15)
                                          | (0xE3069283 << 17))
                                         + 0xA282EAD8) & 0xFFFFFFFF


def test_scalar_and_histogram_round_trip(tmp_path):
    w = EventWriter(str(tmp_path))
    w.add_scalar("train/mel_loss", 0.125, step=10)
    w.add_scalar("train/duration_loss", 3.5, step=10)
    values = np.linspace(-2.0, 2.0, 1001)
    w.add_histogram("params/encoder/kernel", values, step=10)
    w.close()

    events = read_events(w.path)
    # record 0 is the file_version header event
    assert events[0]["file_version"] == "brain.Event:2"
    scalars = {}
    for ev in events[1:]:
        scalars.update(ev["values"])
    assert abs(scalars["train/mel_loss"] - 0.125) < 1e-7
    assert abs(scalars["train/duration_loss"] - 3.5) < 1e-6
    h = scalars["params/encoder/kernel"]
    assert h["num"] == 1001.0
    assert abs(h["min"] - (-2.0)) < 1e-12 and abs(h["max"] - 2.0) < 1e-12
    assert abs(h["sum"]) < 1e-9  # symmetric grid sums to ~0
    assert all(ev["step"] == 10 for ev in events[1:])


def test_corrupt_record_detected(tmp_path):
    w = EventWriter(str(tmp_path))
    w.add_scalar("a", 1.0, step=1)
    w.close()
    with open(w.path, "r+b") as f:
        f.seek(-6, 2)  # flip a byte inside the last record's payload/CRC
        b = f.read(1)
        f.seek(-6, 2)
        f.write(bytes([b[0] ^ 0xFF]))
    try:
        read_events(w.path)
    except ValueError as e:
        assert "CRC" in str(e)
    else:
        raise AssertionError("corruption went undetected")


def test_tensor_logger_writes_real_event_file(tmp_path):
    """The trainer-facing API (scalars per split + parameter histograms)
    must produce a non-empty, parseable event file — the r4 finding was
    that it silently produced nothing in this environment."""
    import jax.numpy as jnp

    from viet_tts_tpu.utils.logging import TensorLogger

    lg = TensorLogger(str(tmp_path), split="valid")
    lg.log({"mel_loss": 1.5, "kl_loss": 0.25}, step=7, lr=1e-4)
    params = {"enc": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros(4)}}
    lg.log_histograms(params, step=7)
    lg.close()

    events = read_events(lg.writer.path)
    tags = {}
    for ev in events[1:]:
        tags.update(ev["values"])
    assert abs(tags["valid/mel_loss"] - 1.5) < 1e-6
    assert abs(tags["valid/kl_loss"] - 0.25) < 1e-7
    assert abs(tags["learning_rate"] - 1e-4) < 1e-10
    hist_tags = [t for t, v in tags.items() if isinstance(v, dict)]
    assert any("kernel" in t for t in hist_tags)
    assert tags[hist_tags[0]]["num"] > 0
