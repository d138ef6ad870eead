"""viet_tts_tpu — a TPU-native Vietnamese text-to-speech framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the PyTorch
reference `ducnt18121997/Viet-Transformer-TTS`:

- Vietnamese G2P front-end (C1-w-V+tone-C2 decomposition, 131-symbol table)
- FastSpeech2 / AdaSpeech / Matcha-TTS acoustic models
- HiFi-GAN vocoder, JETS and VITS2 end-to-end adversarial models
- joint acoustic+vocoder (text2wav) training and speaker finetuning
- training tasks, data pipeline, checkpointing, and inference API

Everything on the compute path is jit-compiled with static shapes; alignment
search, duration averaging, and forward-sum losses run on-device (no host
round-trips); parallelism is expressed through `jax.sharding` over a Mesh.
"""

__version__ = "0.1.0"
