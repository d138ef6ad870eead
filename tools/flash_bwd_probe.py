"""Real-chip smoke for the Pallas flash fwd+bwd kernels (all flavours).

Compiles each flavour's op and its gradient on the attached TPU at a
training-like shape, checks numerics against the dense oracle computed in
the same executable, and prints one JSON line per flavour. Used by the
builder to validate Mosaic lowering (interpret mode cannot catch tiling /
store-rank restrictions).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from viet_tts_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache("/root/repo")

import viet_tts_tpu.ops.pallas_attention as pa  # noqa: E402


def main():
    B, H, T, D, E = 4, 4, 256, 48, 384
    mk = lambda s, *shape: jax.random.normal(
        jax.random.PRNGKey(s), shape, jnp.float32
    )
    qc = mk(1, B, H, T, D)
    k = mk(2, B, H, T, D)
    v = mk(3, B, H, T, D)
    gA = mk(4, B, H, T, E)
    gB = mk(5, B, H, T, E)
    tab = mk(6, T, E) / np.sqrt(E)
    pad = (jnp.arange(T)[None, :] >= T - 32).astype(jnp.float32)
    pad = jnp.tile(pad, (B, 1)).at[0].set(0.0)
    w = mk(7, B, H, T, D)
    scale = 1.0 / np.sqrt(D)

    cases = {
        "xl": (
            lambda *a: jnp.sum(pa._xl_op(*a, pad, scale) * w),
            lambda *a: jnp.sum(pa._xl_dense(*a, pad, scale=scale)[0] * w),
            (qc, k, v, gA, gB, tab),
        ),
        "rel": (
            lambda *a: jnp.sum(pa._rel_op(*a, pad, scale) * w),
            lambda *a: jnp.sum(pa._rel_dense(*a, pad, scale=scale)[0] * w),
            (qc, k, v, gA, tab),
        ),
        "plain": (
            lambda *a: jnp.sum(pa._plain_op(*a, pad, scale) * w),
            lambda *a: jnp.sum(pa._plain_dense(*a, pad, scale=scale)[0] * w),
            (qc, k, v),
        ),
    }
    for name, (loss_f, loss_d, args) in cases.items():
        t0 = time.time()
        n = len(args)
        gf = jax.jit(jax.grad(loss_f, argnums=tuple(range(n))))
        gd = jax.jit(jax.grad(loss_d, argnums=tuple(range(n))))
        a = gf(*args)
        float(a[0].sum())  # true sync on axon
        b = gd(*args)
        float(b[0].sum())
        errs = [
            float(jnp.max(jnp.abs(x - y)) / (jnp.max(jnp.abs(y)) + 1e-12))
            for x, y in zip(a, b)
        ]
        print(json.dumps({
            "flavour": name,
            "max_rel_err": max(errs),
            "per_input": [round(e, 8) for e in errs],
            "elapsed_s": round(time.time() - t0, 1),
            "platform": jax.devices()[0].platform,
        }), flush=True)


if __name__ == "__main__":
    main()
