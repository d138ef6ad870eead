"""Serving: programmatic API, streaming, AOT export, HTTP endpoint.

Submodules import lazily (api pulls jax/models; export pulls jax.export)
so ``viet_tts_tpu.infer`` stays cheap to import.
"""

_LAZY = {
    "OneStageTTS": "viet_tts_tpu.infer.api",
    "TwoStageTTS": "viet_tts_tpu.infer.api",
    "save_to_local": "viet_tts_tpu.infer.api",
    "split_sentences": "viet_tts_tpu.infer.api",
    "stream_vocoder": "viet_tts_tpu.infer.streaming",
    "ExportedTTS": "viet_tts_tpu.infer.export",
    "export_one_stage": "viet_tts_tpu.infer.export",
    "export_two_stage": "viet_tts_tpu.infer.export",
    "serve": "viet_tts_tpu.infer.server",
}

__all__ = sorted(_LAZY)


def __getattr__(name):
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(name)
