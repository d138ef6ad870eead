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


def dropout_probe():
    """In-kernel dropout validation on the real chip (the TPU interpreter
    stubs prng_random_bits, so this cannot run under CPU tests):
    determinism in the seed, seed sensitivity, mean preservation over
    seeds, and finite-difference consistency of the custom VJP with the
    SAME seed (out is linear in v given a fixed mask, so the v-direction
    FD is exact up to fp error)."""
    B, H, T, D, E = 2, 2, 128, 32, 128
    mk = lambda s, *shape: jax.random.normal(
        jax.random.PRNGKey(s), shape, jnp.float32
    )
    qc, k, v = mk(1, B, H, T, D), mk(2, B, H, T, D), mk(3, B, H, T, D)
    gA, gB = mk(4, B, H, T, E), mk(5, B, H, T, E)
    tab = mk(6, T, E) / np.sqrt(E)
    pad = jnp.zeros((B, T), jnp.float32)
    w = mk(7, B, H, T, D)
    scale = 1.0 / np.sqrt(D)
    P = 0.3

    op = jax.jit(
        lambda seed, v_, p: pa._xl_op(qc, k, v_, gA, gB, tab, pad, seed,
                                      scale, p),
        static_argnums=(2,),
    )
    s13 = jnp.asarray([13], jnp.int32)
    a = np.asarray(op(s13, v, P))
    b = np.asarray(op(s13, v, P))
    c = np.asarray(op(jnp.asarray([14], jnp.int32), v, P))
    base = np.asarray(op(s13, v, 0.0))
    mean = np.mean(
        [np.asarray(op(jnp.asarray([s], jnp.int32), v, P))
         for s in range(24)], axis=0,
    )
    mean_err = float(np.abs(mean - base).mean() / np.abs(base).mean())

    loss = jax.jit(
        lambda v_, seed, p: jnp.sum(
            pa._xl_op(qc, k, v_, gA, gB, tab, pad, seed, scale, p) * w
        ),
        static_argnums=(2,),
    )
    gv = jax.jit(jax.grad(loss, argnums=0), static_argnums=(2,))(v, s13, P)
    d = mk(8, B, H, T, D)
    eps = 2.0
    fd = (float(loss(v + eps * d, s13, P))
          - float(loss(v - eps * d, s13, P))) / (2 * eps)
    analytic = float(jnp.vdot(gv, d))
    # out is LINEAR in v given a fixed mask, so loss(v) == vdot(dv, v)
    # EXACTLY (both equal w^T A v); a fwd/bwd mask mismatch breaks this
    # identity by O(dropped mass), far above fp32 accumulation noise
    linear_identity_rel_err = abs(
        float(loss(v, s13, P)) - float(jnp.vdot(gv, v))
    ) / (abs(float(loss(v, s13, P))) + 1e-12)
    print(json.dumps({
        "probe": "dropout",
        "deterministic": bool((a == b).all()),
        "seed_sensitive": bool((a != c).any()),
        "drop_fraction_effect": float(np.abs(a - base).mean()
                                      / np.abs(base).mean()),
        "mean_over_24_seeds_rel_err": round(mean_err, 4),
        "fd_vs_analytic_rel_err": round(
            abs(fd - analytic) / (abs(analytic) + 1e-12), 6),
        "linear_identity_rel_err": round(linear_identity_rel_err, 8),
        "platform": jax.devices()[0].platform,
    }), flush=True)

    # xl2 (single-stream, in-kernel rotations): same determinism +
    # linear-identity checks on its own in-kernel dropout path
    g2 = mk(9, B, H, T, E)
    tab2 = pa._deinterleave_pairs(tab)
    op2 = jax.jit(
        lambda seed, v_, p: pa._xl2_op(qc, k, v_, g2, tab2, pad, seed,
                                       scale, p, float(T)),
        static_argnums=(2,),
    )
    a2 = np.asarray(op2(s13, v, P))
    b2 = np.asarray(op2(s13, v, P))
    c2 = np.asarray(op2(jnp.asarray([14], jnp.int32), v, P))
    loss2 = jax.jit(
        lambda v_, seed, p: jnp.sum(
            pa._xl2_op(qc, k, v_, g2, tab2, pad, seed, scale, p,
                       float(T)) * w),
        static_argnums=(2,),
    )
    gv2 = jax.jit(jax.grad(loss2, argnums=0), static_argnums=(2,))(
        v, s13, P)
    lin2 = abs(
        float(loss2(v, s13, P)) - float(jnp.vdot(gv2, v))
    ) / (abs(float(loss2(v, s13, P))) + 1e-12)
    print(json.dumps({
        "probe": "dropout_xl2",
        "deterministic": bool((a2 == b2).all()),
        "seed_sensitive": bool((a2 != c2).any()),
        "linear_identity_rel_err": round(lin2, 8),
        "platform": jax.devices()[0].platform,
    }), flush=True)

    # xl3 (projected-table): same checks on its in-kernel dropout path
    qv3 = mk(10, B, H, T, D)
    p3 = mk(11, H, T, D) / np.sqrt(D)
    op3 = jax.jit(
        lambda seed, v_, p_: pa._xl3_op(qc, k, v_, qv3, p3, pad, seed,
                                        scale, p_, 0),
        static_argnums=(2,),
    )
    a3 = np.asarray(op3(s13, v, P))
    b3 = np.asarray(op3(s13, v, P))
    c3 = np.asarray(op3(jnp.asarray([14], jnp.int32), v, P))
    loss3 = jax.jit(
        lambda v_, seed, p_: jnp.sum(
            pa._xl3_op(qc, k, v_, qv3, p3, pad, seed, scale, p_, 0) * w),
        static_argnums=(2,),
    )
    gv3 = jax.jit(jax.grad(loss3, argnums=0), static_argnums=(2,))(
        v, s13, P)
    lin3 = abs(
        float(loss3(v, s13, P)) - float(jnp.vdot(gv3, v))
    ) / (abs(float(loss3(v, s13, P))) + 1e-12)
    print(json.dumps({
        "probe": "dropout_xl3",
        "deterministic": bool((a3 == b3).all()),
        "seed_sensitive": bool((a3 != c3).any()),
        "linear_identity_rel_err": round(lin3, 8),
        "platform": jax.devices()[0].platform,
    }), flush=True)


def main(T=256):
    B, H, D, E = 4, 4, 48, 384
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

    g2 = mk(8, B, H, T, E)  # deinterleaved single stream (xl2)
    tab2 = pa._deinterleave_pairs(tab)
    qv3 = mk(9, B, H, T, D)  # q + v_bias stream (xl3)
    p3 = mk(10, H, T, D) / np.sqrt(D)  # projected per-head table (xl3)
    seed0 = jnp.zeros((1,), jnp.int32)
    cases = {
        "xl3": (
            lambda *a: jnp.sum(
                pa._xl3_op(*a, pad, seed0, scale, 0.0, 0) * w),
            lambda *a: jnp.sum(
                pa._xl3_dense(*a, pad, seed0, scale=scale,
                              d_pad=0)[0] * w),
            (qc, k, v, qv3, p3),
        ),
        "xl2": (
            lambda *a: jnp.sum(
                pa._xl2_op(*a, pad, seed0, scale, 0.0, float(T)) * w),
            lambda *a: jnp.sum(
                pa._xl2_dense(*a, pad, seed0, scale=scale,
                              t_sem=float(T))[0] * w),
            (qc, k, v, g2, tab2),
        ),
        "xl": (
            lambda *a: jnp.sum(pa._xl_op(*a, pad, seed0, scale, 0.0) * w),
            lambda *a: jnp.sum(
                pa._xl_dense(*a, pad, seed0, scale=scale)[0] * w),
            (qc, k, v, gA, gB, tab),
        ),
        "rel": (
            lambda *a: jnp.sum(pa._rel_op(*a, pad, seed0, scale, 0.0) * w),
            lambda *a: jnp.sum(
                pa._rel_dense(*a, pad, seed0, scale=scale)[0] * w),
            (qc, k, v, gA, tab),
        ),
        "plain": (
            lambda *a: jnp.sum(
                pa._plain_op(*a, pad, seed0, scale, 0.0) * w),
            lambda *a: jnp.sum(
                pa._plain_dense(*a, pad, seed0, scale=scale)[0] * w),
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
    t = 256
    for a in sys.argv[1:]:
        if a.isdigit():
            t = int(a)
    if "--dropout" in sys.argv:
        dropout_probe()
    else:
        main(t)
        if "--no-dropout" not in sys.argv:
            dropout_probe()
