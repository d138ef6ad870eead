"""Op-level attribution of the flash-vs-dense training gap (r5).

The r5 full-step capture (BENCH_builder_r5) showed flash attention
LOSING at training depth: train_fs2_flash_b64 85.5 samples/s vs the
fp32/shift baseline's 193.  This tool times the attention op alone —
fwd and fwd+bwd, flash vs the dense factorized oracle — at the exact
FS2-conformer shapes (H=8, D=48, E=384 sinusoid table), sweeping the
Pallas tile edge (VIET_TTS_FLASH_BLOCK), to separate the three
candidate causes:

1. grid-sequencing overhead (8192 steps/launch at 128-tiles, B=64):
   shrinks quadratically with the tile edge, so the 128-vs-512 delta
   measures it directly;
2. position-stream bytes: the factorization trades the (B,H,T,T) score
   tensor for two (B,H,T,E=384) rotated query streams (gA, gB) that the
   backward re-reads twice more — byte-count per ``tools/
   jets_hlo_analysis.py`` and invariant to the tile edge;
3. position-score FLOPs: the rotate-against-the-raw-table identity
   contracts over E=384 where the espnet/shift form contracts over
   D=48 — an 8x algorithmic FLOP multiplier on the BD term, also
   tile-invariant.

Prints one JSON line per (impl, mode, block) config.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from viet_tts_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache("/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import viet_tts_tpu.ops.pallas_attention as pa  # noqa: E402

# FS2 conformer training shape (config/model_config.yaml: hidden 384,
# 8 heads -> D=48; sinusoid table E = d_model = 384; T_mel 504 -> the
# wrappers pad to 512, benched directly at 512 here).
H, D, E = 8, 48, 384


def _mk(seed, *shape):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)


def _time(fn, *args, n=6):
    out = fn(*args)
    float(jnp.sum(out))
    out = fn(*args)
    float(jnp.sum(out))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def shift_attention(qc, k, v, q_v, pos_kernel, table, pad, key, scale,
                    dropout_p):
    """The default ("shift") path at op level: padded-reshape XL scores
    (`ops/xl_attention.py:xl_attention_reference`) + mask + softmax +
    dropout + PV — what `nn/conformer.py:RelativeMultiHeadAttention`
    lowers per layer, isolated from the rest of the step."""
    from viet_tts_tpu.ops.xl_attention import xl_attention_reference

    logits = xl_attention_reference(qc, k, q_v, pos_kernel, table, scale)
    logits = jnp.where(pad[:, None, None, :] > 0.5, -1e9, logits)
    attn = jax.nn.softmax(logits, axis=-1)
    if dropout_p > 0.0:
        u = jax.random.uniform(key, attn.shape)
        attn = jnp.where(u >= dropout_p, attn / (1.0 - dropout_p), 0.0)
    # v rides feature-last (B, T, H, D) like the layer's value stream
    return jnp.einsum("bhqk,bkhd->bqhd", attn, v)


def bench_shape(B, T, dropout_p):
    scale = 1.0 / np.sqrt(D)
    qc, k, v = _mk(1, B, H, T, D), _mk(2, B, H, T, D), _mk(3, B, H, T, D)
    gA, gB = _mk(4, B, H, T, E), _mk(5, B, H, T, E)
    tab = _mk(6, T, E) / np.sqrt(E)
    pad = jnp.zeros((B, T), jnp.float32)
    seed = jnp.asarray([7], jnp.int32)
    cot = _mk(8, B, H, T, D)

    def flash_fwd(qc, k, v, gA, gB, tab):
        return pa._xl_op(qc, k, v, gA, gB, tab, pad, seed, scale, dropout_p)

    def dense_fwd(qc, k, v, gA, gB, tab):
        return pa._xl_dense(qc, k, v, gA, gB, tab, pad, seed,
                            scale=scale, dropout_p=dropout_p)[0]

    def make_bwd(fwd):
        def run(qc, k, v, gA, gB, tab, cot):
            out, vjp = jax.vjp(fwd, qc, k, v, gA, gB, tab)
            return sum(jnp.sum(g) for g in vjp(cot)) + jnp.sum(out)
        return run

    results = []
    blocks = (128, 256, 512) if dropout_p > 0.0 else (512,)
    for block in blocks:
        os.environ["VIET_TTS_FLASH_BLOCK"] = str(block)
        # fresh lambdas -> fresh jit cache entries -> env re-read at trace
        f_fwd = jax.jit(lambda *a: flash_fwd(*a))
        f_bwd = jax.jit(make_bwd(lambda *a: flash_fwd(*a)))
        row = {
            "impl": "flash", "block": block, "B": B, "T": T,
            "dropout_p": dropout_p,
            "fwd_s": _time(f_fwd, qc, k, v, gA, gB, tab),
            "fwd_bwd_s": _time(f_bwd, qc, k, v, gA, gB, tab, cot),
        }
        print(json.dumps(row), flush=True)
        results.append(row)
    os.environ.pop("VIET_TTS_FLASH_BLOCK", None)
    if dropout_p > 0.0:
        d_fwd = jax.jit(dense_fwd)
        d_bwd = jax.jit(make_bwd(dense_fwd))
        row = {
            "impl": "dense", "block": None, "B": B, "T": T,
            "dropout_p": dropout_p,
            "fwd_s": _time(d_fwd, qc, k, v, gA, gB, tab),
            "fwd_bwd_s": _time(d_bwd, qc, k, v, gA, gB, tab, cot),
        }
        print(json.dumps(row), flush=True)
        results.append(row)

    # the true target: the default "shift" path at the same op boundary
    # (q_v and the per-head projected table replace the rotated streams)
    q_v = _mk(9, B, H, T, D)
    pos_kernel = _mk(10, E, H * D) / np.sqrt(E)
    key = jax.random.PRNGKey(0)
    bthd = lambda x: jnp.transpose(x, (0, 2, 1, 3))  # (B,H,T,D)->(B,T,H,D)
    qc4, k4, v4, qv4 = bthd(qc), bthd(k), bthd(v), bthd(q_v)
    s_fwd = jax.jit(lambda a, b, c, d, kk: shift_attention(
        a, b, c, d, pos_kernel, tab, pad, kk, scale, dropout_p))

    def s_bwd_fn(a, b, c, d, kk, cot4):
        out, vjp = jax.vjp(
            lambda *x: shift_attention(*x, pos_kernel, tab, pad, kk,
                                       scale, dropout_p), a, b, c, d)
        return sum(jnp.sum(g) for g in vjp(cot4)) + jnp.sum(out)

    s_bwd = jax.jit(s_bwd_fn)
    cot4 = bthd(cot)
    row = {
        "impl": "shift", "block": None, "B": B, "T": T,
        "dropout_p": dropout_p,
        "fwd_s": _time(s_fwd, qc4, k4, v4, qv4, key),
        "fwd_bwd_s": _time(s_bwd, qc4, k4, v4, qv4, key, cot4),
    }
    print(json.dumps(row), flush=True)
    results.append(row)
    return results


def main():
    t0 = time.time()
    for B, T, p in ((64, 512, 0.1), (64, 512, 0.0), (8, 1024, 0.1)):
        bench_shape(B, T, p)
    print(json.dumps({"done": True, "elapsed_s": round(time.time() - t0, 1),
                      "platform": jax.devices()[0].platform}), flush=True)


if __name__ == "__main__":
    main()
