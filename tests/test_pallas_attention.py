"""Flash XL attention (Pallas) == dense factorized path == shift oracle.

Runs the kernel in interpreter mode on the CPU test platform (the grid /
block machinery is identical; Mosaic lowering is exercised on the real
chip by the bench). Covers: unmasked, key-padded, non-divisible T (cdiv
tail), and gradients through the custom VJP.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from viet_tts_tpu.nn.utils import sinusoid_position_table
from viet_tts_tpu.ops.xl_attention import (
    xl_attention,
    xl_pos_queries,
)

B, H, D, E = 2, 4, 16, 64


def _rand(key, *shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


def _inputs(T, seed=0):
    table = jnp.asarray(sinusoid_position_table(T, E))
    q = _rand(seed + 1, B, T, H, D)
    k = _rand(seed + 2, B, T, H, D)
    v = _rand(seed + 3, B, T, H, D)
    u = 0.1 * _rand(seed + 4, H, D)
    v_b = 0.1 * _rand(seed + 5, H, D)
    pk = _rand(seed + 6, E, H * D) / np.sqrt(E)
    scale = 1.0 / np.sqrt(H * D)
    return q, k, v, u, v_b, pk, table, scale


@pytest.mark.parametrize("T,masked", [(64, False), (64, True), (48, True)])
def test_flash_matches_dense(T, masked):
    q, k, v, u, v_b, pk, table, scale = _inputs(T)
    pad = (
        jnp.arange(T)[None, :] >= jnp.asarray([T, T - 9])[:, None]
        if masked
        else None
    )
    want = xl_attention(q, k, v, u, v_b, pk, table, scale, pad_mask=pad)
    with pltpu.force_tpu_interpret_mode():
        got = xl_attention(
            q, k, v, u, v_b, pk, table, scale, pad_mask=pad,
            implementation="flash",
        )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_flash_two_stream_xl_direct(T=48):
    """The pre-rotated two-stream kernel stays the fallback for
    T > _XL2_MAX_T, but `xl_attention`'s flash routing now sends every
    in-range T to the single-stream xl2 op — so pin the two-stream path
    directly (values + grads vs its dense oracle)."""
    import viet_tts_tpu.ops.pallas_attention as pa

    q, k, v, u, v_b, pk, table, scale = _inputs(T, seed=6)
    qc = q + u
    gA, gB = xl_pos_queries(q + v_b, pk)
    pad = jnp.arange(T)[None, :] >= jnp.asarray([T, T - 5])[:, None]
    want = xl_attention(q, k, v, u, v_b, pk, table, scale, pad_mask=pad)
    hm = lambda x: jnp.transpose(x, (0, 2, 1, 3))
    with pltpu.force_tpu_interpret_mode():
        got = pa.flash_xl_attention(
            qc, k, v, gA, gB, table, scale, pad_mask=pad
        )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want).reshape(got.shape),
        rtol=2e-5, atol=2e-5,
    )
    del hm

    w = _rand(21, B, T, H * D)

    def loss(qc, k, v, gA, gB):
        out = pa.flash_xl_attention(qc, k, v, gA, gB, table, scale,
                                    pad_mask=pad)
        return jnp.sum(out * w)

    def loss_dense(qc, k, v, gA, gB):
        out = pa._xl_dense(
            jnp.transpose(qc, (0, 2, 1, 3)), jnp.transpose(k, (0, 2, 1, 3)),
            jnp.transpose(v, (0, 2, 1, 3)), jnp.transpose(gA, (0, 2, 1, 3)),
            jnp.transpose(gB, (0, 2, 1, 3)), table,
            pad.astype(jnp.float32), jnp.zeros((1,), jnp.int32),
            scale=scale,
        )[0]
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, T, H * D)
        return jnp.sum(out * w)

    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(qc, k, v, gA, gB)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2, 3, 4))(qc, k, v, gA, gB)
    for a, b, name in zip(gf, gd, "qc k v gA gB".split()):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5,
            err_msg=name,
        )


def test_flash_single_stream_xl2_direct(T=48):
    """xl3 (projected-table) now takes the in-range flash routing, so pin
    the single-stream xl2 op directly — it remains the fallback for
    512 < T_padded <= 1024 (values + grads vs the dense shift oracle)."""
    import viet_tts_tpu.ops.pallas_attention as pa
    from viet_tts_tpu.ops.xl_attention import xl_pos_query_stream

    q, k, v, u, v_b, pk, table, scale = _inputs(T, seed=8)
    pad = jnp.arange(T)[None, :] >= jnp.asarray([T, T - 5])[:, None]
    want = xl_attention(q, k, v, u, v_b, pk, table, scale, pad_mask=pad)
    with pltpu.force_tpu_interpret_mode():
        got = pa.flash_xl2_attention(
            q + u, k, v, xl_pos_query_stream(q + v_b, pk), table, scale,
            pad_mask=pad,
        )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want).reshape(got.shape),
        rtol=2e-5, atol=2e-5,
    )

    w = _rand(22, B, T, H * D)

    def loss(q, k, v):
        out = pa.flash_xl2_attention(
            q + u, k, v, xl_pos_query_stream(q + v_b, pk), table, scale,
            pad_mask=pad,
        )
        return jnp.sum(out * w)

    def loss_dense(q, k, v):
        return jnp.sum(
            xl_attention(q, k, v, u, v_b, pk, table, scale, pad_mask=pad)
            * w
        )

    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gd, "q k v".split()):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5,
            err_msg=name,
        )


def test_flash_xl3_direct_unpadded(T=128):
    """Direct pin of the projected-table xl3 op at an exact lane-multiple
    T (d_pad = 0 — the routed tests at T=48/64 only ever exercise the
    left-padded table path), values + grads incl. pos_kernel through the
    p-table chain."""
    import viet_tts_tpu.ops.pallas_attention as pa

    q, k, v, u, v_b, pk, table, scale = _inputs(T, seed=9)
    pad = jnp.arange(T)[None, :] >= jnp.asarray([T, T - 11])[:, None]
    want = xl_attention(q, k, v, u, v_b, pk, table, scale, pad_mask=pad)

    def via_xl3(q, k, v, pk):
        p = (table @ pk).reshape(T, H, D)
        return pa.flash_xl3_attention(
            q + u, k, v, q + v_b, p, scale, pad_mask=pad
        )

    with pltpu.force_tpu_interpret_mode():
        got = via_xl3(q, k, v, pk)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want).reshape(got.shape),
        rtol=2e-5, atol=2e-5,
    )

    w = _rand(23, B, T, H * D)
    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(
            lambda *a: jnp.sum(via_xl3(*a) * w), argnums=(0, 1, 2, 3)
        )(q, k, v, pk)
    gd = jax.grad(
        lambda q, k, v, pk: jnp.sum(
            xl_attention(q, k, v, u, v_b, pk, table, scale, pad_mask=pad)
            * w
        ),
        argnums=(0, 1, 2, 3),
    )(q, k, v, pk)
    for a, b, name in zip(gf, gd, "q k v pos_kernel".split()):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5,
            err_msg=name,
        )


def test_flash_bf16_streams(T=48):
    """bf16 inputs stay bf16 through the kernel's MXU contractions (r5:
    under the mixed-precision policy the wrappers used to force-upcast to
    fp32, making flash pay fp32 matmul passes the dense path didn't).
    Values must track the fp32 dense oracle within bf16 rounding, and the
    custom VJP must return cotangents in the primal (bf16) dtype."""
    q, k, v, u, v_b, pk, table, scale = _inputs(T, seed=4)
    want = xl_attention(q, k, v, u, v_b, pk, table, scale)
    bf = lambda x: x.astype(jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        got = xl_attention(
            bf(q), bf(k), bf(v), bf(u), bf(v_b), bf(pk), table, scale,
            implementation="flash",
        )
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), rtol=0.1, atol=0.06
    )

    def loss(q, k, v):
        out = xl_attention(q, k, v, bf(u), bf(v_b), bf(pk), table, scale,
                           implementation="flash")
        return jnp.sum(out.astype(jnp.float32) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(bf(q), bf(k), bf(v))
    gd = jax.grad(
        lambda q, k, v: jnp.sum(
            xl_attention(q, k, v, u, v_b, pk, table, scale) ** 2),
        argnums=(0, 1, 2),
    )(q, k, v)
    for g, d, name in zip((gq, gk, gv), gd, "q k v".split()):
        assert g.dtype == jnp.bfloat16, name
        denom = np.abs(np.asarray(d)).mean() + 1e-6
        rel = np.abs(np.asarray(g, np.float32) - np.asarray(d)).mean()
        assert rel / denom < 0.12, (name, rel / denom)


@pytest.mark.parametrize("T", [32, 48])
def test_flash_grads_match_dense(T):
    """T=32 is a single (bq, bk) tile; T=48 forces 3x3 16-wide blocks so
    the Pallas backward's cross-block accumulators (dq over the key sweep,
    dk/dv over the query sweep, dtable over the whole (B, H, nq) inner
    sweep of the key-outermost grid) are genuinely exercised."""
    q, k, v, u, v_b, pk, table, scale = _inputs(T, seed=10)
    pad = jnp.arange(T)[None, :] >= jnp.asarray([T, T - 5])[:, None]
    w = _rand(20, B, T, H * D)

    def loss(impl):
        def f(q, k, v, u, v_b, pk):
            out = xl_attention(
                q, k, v, u, v_b, pk, table, scale, pad_mask=pad,
                implementation=impl,
            )
            return jnp.sum(out * w)

        return f

    gd = jax.grad(loss("dense"), argnums=(0, 1, 2, 3, 4, 5))(
        q, k, v, u, v_b, pk
    )
    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss("flash"), argnums=(0, 1, 2, 3, 4, 5))(
            q, k, v, u, v_b, pk
        )
    for a, b, name in zip(gf, gd, "q k v u v_bias pos_kernel".split()):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5, err_msg=name
        )


def test_flash_fully_padded_row_matches_dense():
    """A batch row whose keys are entirely padding degrades to uniform
    attention in the dense path (softmax over all-MASK_NEG logits); the
    flash path must reproduce that, finitely — not NaN out."""
    T = 32
    q, k, v, u, v_b, pk, table, scale = _inputs(T, seed=30)
    pad = jnp.stack(
        [jnp.zeros(T, bool), jnp.ones(T, bool)], axis=0
    )
    want = xl_attention(
        q, k, v, u, v_b, pk, table, scale, pad_mask=pad,
    )
    with pltpu.force_tpu_interpret_mode():
        got = xl_attention(
            q, k, v, u, v_b, pk, table, scale, pad_mask=pad,
            implementation="flash",
        )
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("flavour", ["rel", "plain"])
@pytest.mark.parametrize("T", [32, 48])
def test_flash_bwd_kernels_rel_plain_match_dense(flavour, T):
    """Direct op-level gradcheck of the rel / plain Pallas backward
    kernels (the XL flavour is covered via xl_attention above), incl. the
    multi-block T=48 grid and a partially padded batch row."""
    import viet_tts_tpu.ops.pallas_attention as pa

    Bh, Hh, Dh, E = 2, 2, 16, 64
    mk = lambda s, *shape: jax.random.normal(
        jax.random.PRNGKey(s), shape, jnp.float32
    )
    qc = mk(1, Bh, Hh, T, Dh)
    k = mk(2, Bh, Hh, T, Dh)
    v = mk(3, Bh, Hh, T, Dh)
    gp = mk(4, Bh, Hh, T, E)
    tab = mk(5, T, E) / np.sqrt(E)
    pad = (
        jnp.arange(T)[None, :] >= jnp.asarray([T, T - 7])[:, None]
    ).astype(jnp.float32)
    w = mk(6, Bh, Hh, T, Dh)
    scale = 1.0 / np.sqrt(Dh)

    seed = jnp.zeros((1,), jnp.int32)
    if flavour == "rel":
        op_args = (qc, k, v, gp, tab, pad, seed, scale, 0.0)
        op = pa._rel_op
        dense = lambda qc, k, v, gp, tab: pa._rel_dense(
            qc, k, v, gp, tab, pad, seed, scale=scale
        )[0]
        diff_args = (qc, k, v, gp, tab)
    else:
        op_args = (qc, k, v, pad, seed, scale, 0.0)
        op = pa._plain_op
        dense = lambda q, k, v: pa._plain_dense(
            q, k, v, pad, seed, scale=scale
        )[0]
        diff_args = (qc, k, v)

    n = len(diff_args)
    loss_op = lambda *a: jnp.sum(op(*a, *op_args[n:]) * w)
    loss_dense = lambda *a: jnp.sum(dense(*a) * w)
    gd = jax.grad(loss_dense, argnums=tuple(range(n)))(*diff_args)
    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss_op, argnums=tuple(range(n)))(*diff_args)
    for a, b in zip(gf, gd):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
        )


def test_flash_dropout_semantics_cpu_fallback():
    """Attention-weight dropout through the flash entry points.  On CPU
    the op lowers the dense fallback (the TPU interpreter stubs the
    on-core PRNG — see _dispatch); this pins the fallback's semantics:
    deterministic in the seed, mean-preserving over seeds, and the custom
    VJP equal to autodiff of the same masked dense forward.  The Pallas
    in-kernel dropout is validated on the real chip by
    tools/flash_bwd_probe.py --dropout."""
    import viet_tts_tpu.ops.pallas_attention as pa

    T = 32
    q, k, v, u, v_b, pk, table, scale = _inputs(T, seed=50)
    pad = jnp.arange(T)[None, :] >= jnp.asarray([T, T - 5])[:, None]

    def run(seed_val, dropout_p):
        return xl_attention(
            q, k, v, u, v_b, pk, table, scale, pad_mask=pad,
            implementation="flash", dropout_p=dropout_p,
            dropout_rng=jax.random.PRNGKey(seed_val),
        )

    a = run(3, 0.5)
    b = run(3, 0.5)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = run(4, 0.5)
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-4
    # mean over seeds approaches the no-dropout output (keep-scaling)
    base = run(0, 0.0)
    mean = np.mean(
        [np.asarray(run(s, 0.5)) for s in range(40)], axis=0
    )
    err = np.abs(mean - np.asarray(base)).mean() / (
        np.abs(np.asarray(base)).mean() + 1e-9
    )
    assert err < 0.25, err

    # custom VJP == autodiff of the identically-masked dense forward
    seed = jnp.asarray([11], jnp.int32)
    w = _rand(21, B, T, H * D)
    hm = lambda x: jnp.transpose(x, (0, 2, 1, 3)).astype(jnp.float32)
    from viet_tts_tpu.ops.xl_attention import xl_pos_queries

    qc, gstreams = q + u, xl_pos_queries(q + v_b, pk)
    args = (hm(qc), hm(k), hm(v), hm(gstreams[0]), hm(gstreams[1]),
            table.astype(jnp.float32))
    padf = pad.astype(jnp.float32)
    wh = hm(w.reshape(B, T, H, D))

    def loss_op(*a):
        return jnp.sum(pa._xl_op(*a, padf, seed, scale, 0.5) * wh)

    def loss_dense(*a):
        return jnp.sum(
            pa._xl_dense(*a, padf, seed, scale=scale, dropout_p=0.5)[0] * wh
        )

    g_op = jax.grad(loss_op, argnums=tuple(range(6)))(*args)
    g_ref = jax.grad(loss_dense, argnums=tuple(range(6)))(*args)
    for x, y in zip(g_op, g_ref):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=5e-5, atol=5e-6
        )


def test_conformer_flash_dropout_trains():
    """Training-mode conformer with flash attention + dropout > 0 must
    run end-to-end (per-call seed drawn off the dropout RNG stream) and
    produce finite grads."""
    from viet_tts_tpu.nn.conformer import ConformerEncoder

    T = 32
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, T), 0, 40)
    pad = jnp.arange(T)[None, :] >= jnp.asarray([T, T - 7])[:, None]
    enc = ConformerEncoder(
        n_symbols=40, n_layers=1, d_model=64, max_seq_len=128,
        num_heads=4, dropout=0.2, mask_attn_keys=True,
        attn_implementation="flash",
    )
    params = enc.init(jax.random.PRNGKey(1), ids, pad)

    def loss(p):
        (out, _), _ = enc.apply(
            p, ids, pad, True,
            rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"],
        )
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(params)
    assert all(
        np.isfinite(np.asarray(leaf)).all()
        for leaf in jax.tree_util.tree_leaves(g)
    )


def test_flash_cpu_fallback_no_interpret():
    """Without interpret mode, the flash entry points must still execute on
    the CPU backend: `_platform_forward` lowers the dense oracle there
    (eager init via train/state.py:init_on_cpu and the virtual-CPU
    multi-chip dryrun both hit this path)."""
    T = 32
    q, k, v, u, v_b, pk, table, scale = _inputs(T, seed=40)
    pad = jnp.arange(T)[None, :] >= jnp.asarray([T, T - 5])[:, None]
    want = xl_attention(q, k, v, u, v_b, pk, table, scale, pad_mask=pad)
    got = xl_attention(  # no force_tpu_interpret_mode: plain CPU lowering
        q, k, v, u, v_b, pk, table, scale, pad_mask=pad,
        implementation="flash",
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )
    jitted = jax.jit(
        lambda *a: jnp.sum(
            xl_attention(
                *a, table, scale, pad_mask=pad, implementation="flash"
            )
        )
    )
    assert np.isfinite(float(jitted(q, k, v, u, v_b, pk)))


@pytest.mark.parametrize("impl", ["dense", "flash"])
def test_conformer_encoder_impl_equivalence(impl):
    """Full ConformerEncoder output is implementation-invariant: the
    factorized/fused paths share the exact same param tree as the shift
    path (pos_proj created via the identity feed), so one init drives all
    three."""
    from viet_tts_tpu.nn.conformer import ConformerEncoder

    T = 32
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, T), 0, 40)
    pad = jnp.arange(T)[None, :] >= jnp.asarray([T, T - 7])[:, None]

    def run(implementation):
        enc = ConformerEncoder(
            n_symbols=40, n_layers=2, d_model=64, max_seq_len=128,
            num_heads=4, mask_attn_keys=True,
            attn_implementation=implementation,
        )
        return enc

    ref_enc = run("shift")
    params = ref_enc.init(jax.random.PRNGKey(1), ids, pad)
    want, _ = ref_enc.apply(params, ids, pad)

    enc = run(impl)
    with pltpu.force_tpu_interpret_mode():
        got, _ = enc.apply(params, ids, pad)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_conformer_encoder_dense_grads_match_shift():
    """Training-mode gradients (dropout off so paths are deterministic)
    agree between the shift and dense implementations."""
    from viet_tts_tpu.nn.conformer import ConformerEncoder

    T = 32
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, T), 0, 40)
    pad = jnp.arange(T)[None, :] >= jnp.asarray([T, T - 7])[:, None]

    def make(implementation):
        return ConformerEncoder(
            n_symbols=40, n_layers=1, d_model=64, max_seq_len=128,
            num_heads=4, dropout=0.0, mask_attn_keys=True,
            attn_implementation=implementation,
        )

    params = make("shift").init(jax.random.PRNGKey(1), ids, pad)

    def loss(p, enc):
        (out, _), _ = enc.apply(
            p, ids, pad, True,
            rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"],
        )
        return jnp.sum(out ** 2)

    gs = jax.grad(loss)(params, make("shift"))
    gd = jax.grad(loss)(params, make("dense"))
    flat_s = jax.tree_util.tree_leaves(gs)
    flat_d = jax.tree_util.tree_leaves(gd)
    for a, b in zip(flat_s, flat_d):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-4
        )
