"""Native (C++) host runtime: feature IO and batch assembly via ctypes."""

from viet_tts_tpu.runtime import native

__all__ = ["native"]
