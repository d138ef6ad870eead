"""Benchmark: batched FastSpeech2 mel inference on TPU vs torch-CPU anchor.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
The reference publishes no numbers (BASELINE.md), so vs_baseline anchors
against a same-architecture PyTorch-CPU forward measured here.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SR = 22050
HOP = 256
B = 16  # batched inference
T_TEXT = 64
T_MEL = 512


def bench_tpu():
    import jax
    import jax.numpy as jnp

    from viet_tts_tpu.config import build_config, derive_task_config
    from viet_tts_tpu.models.fastspeech2 import FastSpeech2
    from viet_tts_tpu.text import NUM_SYMBOLS

    conf = derive_task_config(build_config(os.path.join(REPO, "config")), "fastspeech2")
    stats = {
        "pitch": {"min": -3.0, "max": 8.0, "mean": 0.0, "std": 1.0},
        "energy": {"min": -3.0, "max": 8.0, "mean": 0.0, "std": 1.0},
    }
    model = FastSpeech2(
        n_symbols=NUM_SYMBOLS,
        n_channels=80,
        hparams=conf["models"]["fastspeech2"],
        stats=stats,
        n_speakers=2,
    )

    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    text = jnp.asarray(rng.randint(1, NUM_SYMBOLS, (B, T_TEXT)).astype(np.int32))
    text_lens = jnp.asarray(np.full(B, T_TEXT, np.int32))
    feats = jnp.asarray(rng.randn(B, T_MEL, 80).astype(np.float32))
    sids = jnp.asarray(np.zeros(B, np.int32))
    aids = jnp.asarray(np.zeros(B, np.int32))

    from viet_tts_tpu.train.state import init_on_cpu

    variables = init_on_cpu(
        model.init,
        {"params": key, "dropout": key, "reparam": key},
        sids, text, text_lens, T_MEL, feats=feats, aids=aids,
        method=model.inference,
    )

    @jax.jit
    def synth(variables, sids, text, text_lens, feats, aids):
        return model.apply(
            variables, sids, text, text_lens, T_MEL, feats=feats, aids=aids,
            method=model.inference,
        )

    # warmup/compile (NOTE: block_until_ready does not reliably block on the
    # axon remote runtime; a host scalar fetch is the only true sync)
    mel, mel_lens, _ = synth(variables, sids, text, text_lens, feats, aids)
    float(mel.sum())
    mel, mel_lens, _ = synth(variables, sids, text, text_lens, feats, aids)
    float(mel.sum())  # second warmup: first post-compile call still settles

    n_iters = 10
    times = []
    for _ in range(n_iters):
        t0 = time.perf_counter()
        mel, mel_lens, _ = synth(variables, sids, text, text_lens, feats, aids)
        float(mel.sum())
        times.append(time.perf_counter() - t0)
    dt = min(times)

    # throughput/RTF against the static frame budget: the jitted graph
    # computes all B*T_MEL frames regardless of predicted durations (random
    # init predicts near-zero lengths, which would make RTF meaningless)
    frames = B * T_MEL
    audio_seconds = frames * HOP / SR
    return {
        "sec_per_batch": dt,
        "mel_frames_per_sec": frames / dt,
        "rtf": dt / max(audio_seconds, 1e-9),
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
    }


def bench_torch_cpu():
    """Same-architecture (6L conformer-384 enc/dec + postnet) torch-CPU
    forward over the same workload; the >50x anchor."""
    import torch
    import torch.nn as nn

    torch.set_num_threads(os.cpu_count() or 8)
    d, heads, layers = 384, 8, 6

    class ConformerBlock(nn.Module):
        def __init__(self):
            super().__init__()
            self.ff1 = nn.Sequential(
                nn.LayerNorm(d), nn.Linear(d, 4 * d), nn.SiLU(), nn.Linear(4 * d, d)
            )
            self.ln = nn.LayerNorm(d)
            self.attn = nn.MultiheadAttention(d, heads, batch_first=True)
            self.conv = nn.Sequential(
                nn.LayerNorm(d),
                nn.Linear(d, 2 * d), nn.GLU(dim=-1),
            )
            self.dw = nn.Conv1d(d, d, 31, padding=15, groups=d)
            self.pw = nn.Linear(d, d)
            self.ff2 = nn.Sequential(
                nn.LayerNorm(d), nn.Linear(d, 4 * d), nn.SiLU(), nn.Linear(4 * d, d)
            )
            self.final = nn.LayerNorm(d)

        def forward(self, x):
            x = x + 0.5 * self.ff1(x)
            h = self.ln(x)
            x = x + self.attn(h, h, h, need_weights=False)[0]
            h = self.conv(x)
            h = self.dw(h.transpose(1, 2)).transpose(1, 2)
            x = x + self.pw(torch.nn.functional.silu(h))
            x = x + 0.5 * self.ff2(x)
            return self.final(x)

    class TorchFS2(nn.Module):
        def __init__(self):
            super().__init__()
            self.emb = nn.Embedding(132, d)
            self.enc = nn.ModuleList(ConformerBlock() for _ in range(layers))
            self.dur = nn.Sequential(
                nn.Conv1d(d, 256, 3, padding=1), nn.ReLU(), nn.Conv1d(256, 1, 1)
            )
            self.dec = nn.ModuleList(ConformerBlock() for _ in range(layers))
            self.out = nn.Linear(d, 80)
            self.postnet = nn.Sequential(
                *[nn.Conv1d(80 if i == 0 else 512, 512 if i < 4 else 80, 5, padding=2)
                  for i in range(5)]
            )

        def forward(self, text, t_mel):
            x = self.emb(text)
            for blk in self.enc:
                x = blk(x)
            _ = self.dur(x.transpose(1, 2))
            # expand to frame rate (uniform) and decode
            reps = t_mel // x.shape[1]
            x = x.repeat_interleave(reps, dim=1)[:, :t_mel]
            for blk in self.dec:
                x = blk(x)
            mel = self.out(x)
            return mel + self.postnet(mel.transpose(1, 2)).transpose(1, 2)

    model = TorchFS2().eval()
    text = torch.randint(1, 131, (B, T_TEXT))
    with torch.no_grad():
        model(text, T_MEL)  # warmup
        n_iters = 3
        t0 = time.perf_counter()
        for _ in range(n_iters):
            model(text, T_MEL)
        dt = (time.perf_counter() - t0) / n_iters
    frames = B * T_MEL
    return {"sec_per_batch": dt, "mel_frames_per_sec": frames / dt}


def bench_jets_tpu():
    """Headline config: fused JETS text->waveform single-graph inference."""
    import jax
    import jax.numpy as jnp

    from viet_tts_tpu.config import build_config, derive_task_config
    from viet_tts_tpu.models.jets import JETS
    from viet_tts_tpu.text import NUM_SYMBOLS
    from viet_tts_tpu.train.state import init_on_cpu

    conf = derive_task_config(build_config(os.path.join(REPO, "config")), "jets")
    model = JETS(
        n_symbols=NUM_SYMBOLS,
        n_channels=80,
        hparams=conf["models"]["jets"]["generator_params"],
        n_speakers=2,
    )
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    text = jnp.asarray(rng.randint(1, NUM_SYMBOLS, (B, T_TEXT)).astype(np.int32))
    text_lens = jnp.asarray(np.full(B, T_TEXT, np.int32))
    sids = jnp.asarray(np.zeros(B, np.int32))

    variables = init_on_cpu(
        model.init,
        {"params": key, "dropout": key, "noise": key},
        sids, text, text_lens, T_MEL,
        method=model.inference,
    )

    @jax.jit
    def synth(variables, sids, text, text_lens):
        return model.apply(
            variables, sids, text, text_lens, T_MEL, method=model.inference
        )

    wav, wav_lens = synth(variables, sids, text, text_lens)
    float(wav.sum())
    wav, wav_lens = synth(variables, sids, text, text_lens)
    float(wav.sum())  # second warmup

    n_iters = 10
    times = []
    for _ in range(n_iters):
        t0 = time.perf_counter()
        wav, wav_lens = synth(variables, sids, text, text_lens)
        float(wav.sum())
        times.append(time.perf_counter() - t0)
    dt = min(times)

    # bf16 serving mode (half=True in the API)
    from viet_tts_tpu.infer.api import cast_floating

    v16 = cast_floating(variables, jnp.bfloat16)
    dt16 = _honest_time(synth, v16, sids, text, text_lens)

    samples = B * T_MEL * HOP  # static budget (see mel bench note)
    audio_seconds = samples / SR
    return {
        "sec_per_batch": dt,
        "rtf_bf16": dt16 / audio_seconds,
        "samples_per_sec": samples / dt,
        "mel_frames_per_sec": samples / HOP / dt,
        "rtf": dt / max(audio_seconds, 1e-9),
        "platform": jax.devices()[0].platform,
    }


def _honest_time(fn, *args, n_iters=8):
    """min sec/call with true host-sync (block_until_ready lies here)."""
    out = fn(*args)
    float(jax_sum(out))
    out = fn(*args)
    float(jax_sum(out))
    times = []
    for _ in range(n_iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jax_sum(out))
        times.append(time.perf_counter() - t0)
    return min(times)


def jax_sum(out):
    import jax.numpy as jnp

    leaf = out[0] if isinstance(out, tuple) else out
    return jnp.sum(leaf)


def bench_two_stage_tpu():
    """Config 2: FS2 conformer mel -> HiFi-GAN waveform, one fused graph."""
    import jax
    import jax.numpy as jnp

    from viet_tts_tpu.config import build_config, derive_task_config
    from viet_tts_tpu.models.fastspeech2 import FastSpeech2
    from viet_tts_tpu.models.hifigan import HiFiGANGenerator
    from viet_tts_tpu.text import NUM_SYMBOLS
    from viet_tts_tpu.train.state import init_on_cpu

    conf = derive_task_config(build_config(os.path.join(REPO, "config")), "fastspeech2")
    stats = {
        "pitch": {"min": -3.0, "max": 8.0, "mean": 0.0, "std": 1.0},
        "energy": {"min": -3.0, "max": 8.0, "mean": 0.0, "std": 1.0},
    }
    acoustic = FastSpeech2(
        n_symbols=NUM_SYMBOLS, n_channels=80,
        hparams=conf["models"]["fastspeech2"], stats=stats, n_speakers=2,
    )
    vocoder = HiFiGANGenerator()

    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    text = jnp.asarray(rng.randint(1, NUM_SYMBOLS, (B, T_TEXT)).astype(np.int32))
    lens = jnp.asarray(np.full(B, T_TEXT, np.int32))
    feats = jnp.asarray(rng.randn(B, T_MEL, 80).astype(np.float32))
    sids = jnp.zeros(B, jnp.int32)
    aids = jnp.zeros(B, jnp.int32)
    av = init_on_cpu(
        acoustic.init, {"params": key, "dropout": key, "reparam": key},
        sids, text, lens, T_MEL, feats=feats, aids=aids,
        method=acoustic.inference,
    )
    vv = init_on_cpu(vocoder.init, key, feats)

    @jax.jit
    def synth(av, vv, sids, text, lens, feats, aids):
        mel, mel_lens, _ = acoustic.apply(
            av, sids, text, lens, T_MEL, feats=feats, aids=aids,
            method=acoustic.inference,
        )
        return vocoder.apply(vv, mel)[..., 0], mel_lens

    dt = _honest_time(synth, av, vv, sids, text, lens, feats, aids)
    return {"sec_per_batch": dt, "rtf": dt / (B * T_MEL * HOP / SR)}


def bench_matcha_tpu(n_timesteps=10):
    """Config 4: Matcha CFM Euler ODE sampling."""
    import jax
    import jax.numpy as jnp

    from viet_tts_tpu.config import build_config, derive_task_config
    from viet_tts_tpu.models.matcha import MatchaTTS
    from viet_tts_tpu.text import NUM_SYMBOLS
    from viet_tts_tpu.train.state import init_on_cpu

    conf = derive_task_config(build_config(os.path.join(REPO, "config")), "matcha")
    model = MatchaTTS(
        n_symbols=NUM_SYMBOLS, n_channels=80,
        hparams=conf["models"]["matcha"],
        stats={"mel_mean": 0.0, "mel_std": 1.0}, n_speakers=2,
    )
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    text = jnp.asarray(rng.randint(1, NUM_SYMBOLS, (B, T_TEXT)).astype(np.int32))
    lens = jnp.asarray(np.full(B, T_TEXT, np.int32))
    feats = jnp.asarray(rng.randn(B, T_MEL, 80).astype(np.float32))
    sids = jnp.zeros(B, jnp.int32)
    aids = jnp.zeros(B, jnp.int32)
    rngs = {"params": key, "dropout": key, "reparam": key, "noise": key}
    v = init_on_cpu(
        model.init, rngs, sids, text, lens, T_MEL, feats=feats, aids=aids,
        n_timesteps=n_timesteps, method=model.inference,
    )

    @jax.jit
    def synth(v, sids, text, lens, feats, aids):
        return model.apply(
            v, sids, text, lens, T_MEL, feats=feats, aids=aids,
            n_timesteps=n_timesteps, method=model.inference,
            rngs={"noise": jax.random.PRNGKey(0)},
        )

    dt = _honest_time(synth, v, sids, text, lens, feats, aids)
    return {"sec_per_batch": dt, "rtf": dt / (B * T_MEL * HOP / SR)}


def bench_vits2_tpu():
    """Config 5: VITS2 end-to-end flows + SDP."""
    import jax
    import jax.numpy as jnp

    from viet_tts_tpu.config import build_config, derive_task_config
    from viet_tts_tpu.models.vits2 import VITS2
    from viet_tts_tpu.text import NUM_SYMBOLS
    from viet_tts_tpu.train.state import init_on_cpu

    conf = derive_task_config(build_config(os.path.join(REPO, "config")), "vits2")
    model = VITS2(
        n_symbols=NUM_SYMBOLS, hparams=conf["models"]["vits2"],
        n_speakers=2, spec_channels=80,
    )
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    text = jnp.asarray(rng.randint(1, NUM_SYMBOLS, (B, 2 * T_TEXT + 1)).astype(np.int32))
    lens = jnp.asarray(np.full(B, 2 * T_TEXT + 1, np.int32))
    sids = jnp.zeros(B, jnp.int32)
    v = init_on_cpu(
        model.init,
        {"params": key, "dropout": key, "noise": key, "segment": key},
        sids, text, lens, T_MEL, method=model.inference,
    )

    @jax.jit
    def synth(v, sids, text, lens):
        return model.apply(
            v, sids, text, lens, T_MEL, method=model.inference,
            rngs={"noise": jax.random.PRNGKey(0)},
        )

    dt = _honest_time(synth, v, sids, text, lens)
    return {"sec_per_batch": dt, "rtf": dt / (B * T_MEL * HOP / SR)}


def main():
    import sys

    def note(msg):
        print(msg, file=sys.stderr, flush=True)

    note("bench: jets")
    jets = bench_jets_tpu()
    note("bench: fs2")
    fs2 = bench_tpu()
    note("bench: two_stage")
    two_stage = bench_two_stage_tpu()
    note("bench: matcha")
    matcha = bench_matcha_tpu()
    note("bench: vits2")
    vits2 = bench_vits2_tpu()
    note("bench: torch cpu")
    cpu = bench_torch_cpu()
    speedup = cpu["sec_per_batch"] / fs2["sec_per_batch"]
    result = {
        "metric": "jets_fused_text2wav_inference",
        "value": round(jets["samples_per_sec"], 1),
        "unit": "samples/sec",
        "vs_baseline": round(speedup, 2),
        "rtf_jets": round(jets["rtf"], 6),
        "rtf_jets_bf16": round(jets["rtf_bf16"], 6),
        "jets_mel_frames_per_sec": round(jets["mel_frames_per_sec"], 1),
        "fs2_mel_frames_per_sec": round(fs2["mel_frames_per_sec"], 1),
        "rtf_fs2_mel": round(fs2["rtf"], 6),
        "rtf_fs2_hifigan_two_stage": round(two_stage["rtf"], 6),
        "rtf_matcha_ode10": round(matcha["rtf"], 6),
        "rtf_vits2_e2e": round(vits2["rtf"], 6),
        "sec_per_batch_torch_cpu_fs2": round(cpu["sec_per_batch"], 5),
        "platform": jets["platform"],
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
