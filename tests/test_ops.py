"""Numerical tests for core alignment/duration ops vs independent references.

The numpy oracles here re-state the reference algorithms
(`models/tts/fastspeech2/function.py:127-168`,
`models/gan_tts/jets/alignments.py:62-165`) so the batched JAX kernels can
be checked exactly; the forward-sum loss is checked against torch's CTC.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp
from scipy.stats import betabinom

from viet_tts_tpu.ops import (
    monotonic_alignment,
    binarize_attention,
    viterbi_decode,
    maximum_path,
    forward_sum_loss,
    jets_forward_sum_loss,
    beta_binomial_log_prior,
    bin_loss,
    length_regulator,
    gaussian_upsample,
    average_by_duration,
    aggregate_by_ids,
    get_segments,
    get_random_segments,
    beta_binomial_prior,
)


def mas_numpy(attn_map):
    """Oracle: width-1 MAS on a (T_mel, T_text) probability matrix."""
    opt = np.zeros_like(attn_map)
    attn_map = np.log(attn_map)
    attn_map[0, 1:] = -np.inf
    log_p = np.zeros_like(attn_map)
    log_p[0, :] = attn_map[0, :]
    prev_ind = np.zeros_like(attn_map, dtype=np.int64)
    for i in range(1, attn_map.shape[0]):
        for j in range(attn_map.shape[1]):
            prev_log = log_p[i - 1, j]
            prev_j = j
            if j - 1 >= 0 and log_p[i - 1, j - 1] >= log_p[i - 1, j]:
                prev_log = log_p[i - 1, j - 1]
                prev_j = j - 1
            log_p[i, j] = attn_map[i, j] + prev_log
            prev_ind[i, j] = prev_j
    curr = attn_map.shape[1] - 1
    for i in range(attn_map.shape[0] - 1, -1, -1):
        opt[i, curr] = 1
        curr = prev_ind[i, curr]
    opt[0, curr] = 1
    return opt


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_mas_matches_oracle(seed):
    rng = np.random.RandomState(seed)
    B, T_mel, T_text = 4, 37, 11
    attn = rng.rand(B, T_mel, T_text).astype(np.float32) + 1e-3
    # normalise over text like a softmax output
    attn = attn / attn.sum(-1, keepdims=True)
    mel_lens = np.array([37, 30, 25, 14])
    text_lens = np.array([11, 9, 5, 3])

    path, durs = monotonic_alignment(
        jnp.log(jnp.asarray(attn)), jnp.asarray(text_lens), jnp.asarray(mel_lens)
    )
    path = np.asarray(path)
    for b in range(B):
        ref = mas_numpy(attn[b, : mel_lens[b], : text_lens[b]].copy())
        np.testing.assert_array_equal(
            path[b, : mel_lens[b], : text_lens[b]], ref, err_msg=f"b={b}"
        )
        # nothing outside the valid region
        assert path[b, mel_lens[b] :].sum() == 0
        assert path[b, :, text_lens[b] :].sum() == 0
    np.testing.assert_array_equal(np.asarray(durs), path.sum(1))


def test_mas_duration_properties():
    rng = np.random.RandomState(3)
    attn = rng.rand(2, 50, 8).astype(np.float32)
    text_lens = np.array([8, 6])
    mel_lens = np.array([50, 33])
    _, durs = monotonic_alignment(
        jnp.asarray(np.log(attn + 1e-6)), jnp.asarray(text_lens), jnp.asarray(mel_lens)
    )
    durs = np.asarray(durs)
    # durations sum to the mel length; every valid token gets >= 1 frame
    for b in range(2):
        assert durs[b].sum() == mel_lens[b]
        assert (durs[b, : text_lens[b]] >= 1).all()
        assert (durs[b, text_lens[b] :] == 0).all()


def test_binarize_attention_shape():
    rng = np.random.RandomState(0)
    attn = jnp.asarray(rng.rand(2, 1, 20, 7).astype(np.float32))
    out = binarize_attention(attn, jnp.array([7, 5]), jnp.array([20, 15]))
    assert out.shape == (2, 1, 20, 7)
    assert np.asarray(out).sum() == 20 + 15


def test_viterbi_decode_bin_loss():
    rng = np.random.RandomState(1)
    scores = rng.rand(2, 25, 6).astype(np.float32)
    logp = np.log(scores / scores.sum(-1, keepdims=True))
    text_lens, feat_lens = np.array([6, 4]), np.array([25, 18])
    ds, bl = viterbi_decode(
        jnp.asarray(logp), jnp.asarray(text_lens), jnp.asarray(feat_lens)
    )
    ds = np.asarray(ds)
    # oracle per sample
    expected_bl = 0.0
    for b in range(2):
        ref = mas_numpy(scores[b, : feat_lens[b], : text_lens[b]].copy())
        np.testing.assert_array_equal(
            ds[b, : text_lens[b]], ref.sum(0), err_msg=f"b={b}"
        )
        expected_bl -= (
            logp[b, : feat_lens[b], : text_lens[b]][ref == 1].mean()
        )
    np.testing.assert_allclose(float(bl), expected_bl / 2, rtol=1e-5)


def test_maximum_path_layout():
    rng = np.random.RandomState(2)
    neg_cent = jnp.asarray(rng.randn(2, 5, 30).astype(np.float32))
    path = maximum_path(neg_cent, jnp.array([5, 4]), jnp.array([30, 22]))
    assert path.shape == (2, 5, 30)
    assert np.asarray(path)[0].sum() == 30


def _torch_forward_sum(attn_logprob, in_lens, out_lens, blank=-1.0):
    attn_logprob = torch.from_numpy(attn_logprob)
    pad = F.pad(attn_logprob, (1, 0), value=blank)
    total = 0.0
    for b in range(attn_logprob.shape[0]):
        target = torch.arange(1, in_lens[b] + 1).unsqueeze(0)
        cur = pad[b].permute(1, 0, 2)[: out_lens[b], :, : in_lens[b] + 1]
        cur = torch.log_softmax(cur[None], dim=3)[0]
        total += F.ctc_loss(
            cur,
            target,
            input_lengths=torch.tensor([out_lens[b]]),
            target_lengths=torch.tensor([in_lens[b]]),
            zero_infinity=True,
        )
    return float(total / attn_logprob.shape[0])


def test_forward_sum_matches_torch_ctc():
    rng = np.random.RandomState(0)
    B, T_mel, T_text = 3, 40, 9
    x = rng.randn(B, 1, T_mel, T_text).astype(np.float32)
    in_lens = np.array([9, 7, 4])
    out_lens = np.array([40, 31, 18])
    ref = _torch_forward_sum(x, in_lens, out_lens)
    got = float(
        forward_sum_loss(jnp.asarray(x), jnp.asarray(in_lens), jnp.asarray(out_lens))
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_jets_forward_sum_matches_torch_ctc():
    rng = np.random.RandomState(4)
    B, T_feats, T_text = 2, 30, 7
    raw = rng.randn(B, T_feats, T_text).astype(np.float32)
    logp = torch.log_softmax(torch.from_numpy(raw), dim=-1).numpy()
    ilens, olens = np.array([7, 5]), np.array([30, 24])

    blank = np.e**-1
    pad = F.pad(torch.from_numpy(logp), (1, 0), value=np.log(blank))
    ref = 0.0
    for b in range(B):
        target = torch.arange(1, ilens[b] + 1).unsqueeze(0)
        cur = pad[b, : olens[b], : ilens[b] + 1].unsqueeze(1)
        ref += F.ctc_loss(
            cur,
            target,
            input_lengths=torch.tensor([olens[b]]),
            target_lengths=torch.tensor([ilens[b]]),
            zero_infinity=True,
        )
    ref = float(ref / B)
    got = float(
        jets_forward_sum_loss(
            jnp.asarray(logp), jnp.asarray(ilens), jnp.asarray(olens)
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_beta_binomial_log_prior_matches_scipy():
    text_lens, feats_lens = np.array([5, 3]), np.array([12, 8])
    got = np.asarray(
        beta_binomial_log_prior(
            jnp.asarray(text_lens), jnp.asarray(feats_lens), 6, 14
        )
    )
    for b in range(2):
        T, N = feats_lens[b], text_lens[b]
        alpha = np.arange(1, T + 1, dtype=float)
        beta = np.array([T - t + 1 for t in alpha])
        k = np.arange(N)
        ref = betabinom.logpmf(k[:, None], N, alpha, beta).T  # (T, N)
        np.testing.assert_allclose(got[b, :T, :N], ref, rtol=1e-4, atol=1e-5)
    assert (got[0, 12:, :] <= -1e29).all()


def test_bin_loss():
    soft = np.array([[[0.9, 0.1], [0.2, 0.8]]], dtype=np.float32)
    hard = np.array([[[1.0, 0.0], [0.0, 1.0]]], dtype=np.float32)
    got = float(bin_loss(jnp.asarray(hard), jnp.asarray(soft)))
    ref = -(np.log(0.9) + np.log(0.8)) / 2
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_length_regulator_matches_repeat():
    hs = np.arange(2 * 4 * 3, dtype=np.float32).reshape(2, 4, 3)
    ds = np.array([[2, 0, 3, 1], [1, 1, 1, 0]])
    out = np.asarray(length_regulator(jnp.asarray(hs), jnp.asarray(ds), 8))
    for b in range(2):
        ref = np.repeat(hs[b], ds[b], axis=0)
        np.testing.assert_array_equal(out[b, : len(ref)], ref)
        assert (out[b, len(ref) :] == 0).all()


def test_gaussian_upsample_matches_formula():
    rng = np.random.RandomState(0)
    hs = rng.randn(2, 5, 7).astype(np.float32)
    ds = np.array([[3, 2, 4, 0, 0], [1, 2, 2, 2, 1]], dtype=np.float32)
    h_masks = np.arange(9)[None, :] < np.array([[9], [8]])
    d_masks = np.arange(5)[None, :] < np.array([[3], [5]])

    got = np.asarray(
        gaussian_upsample(
            jnp.asarray(hs),
            jnp.asarray(ds),
            jnp.asarray(h_masks),
            jnp.asarray(d_masks),
        )
    )
    # direct torch re-statement of espnet formula
    t = torch.arange(9).unsqueeze(0).repeat(2, 1).float() * torch.from_numpy(
        h_masks.astype(np.float32)
    )
    c = torch.from_numpy(ds).cumsum(-1) - torch.from_numpy(ds) / 2
    energy = -0.1 * (t.unsqueeze(-1) - c.unsqueeze(1)) ** 2
    energy = energy.masked_fill(
        ~torch.from_numpy(d_masks).unsqueeze(1).repeat(1, 9, 1), -float("inf")
    )
    ref = torch.softmax(energy, dim=2) @ torch.from_numpy(hs)
    np.testing.assert_allclose(got, ref.numpy(), rtol=1e-4, atol=1e-5)


def test_average_by_duration_matches_oracle():
    rng = np.random.RandomState(0)
    ds = np.array([[3, 0, 4, 2], [5, 1, 0, 0]])
    xs = rng.randn(2, 9).astype(np.float32)
    text_lens, feats_lens = np.array([4, 2]), np.array([9, 6])
    got = np.asarray(
        average_by_duration(
            jnp.asarray(ds), jnp.asarray(xs), jnp.asarray(text_lens), jnp.asarray(feats_lens)
        )
    )
    for b in range(2):
        cum = np.concatenate([[0], ds[b, : text_lens[b]].cumsum()])
        for n in range(text_lens[b]):
            seg = xs[b, cum[n] : cum[n + 1]]
            ref = seg.mean() if len(seg) else 0.0
            np.testing.assert_allclose(got[b, n], ref, rtol=1e-5, atol=1e-6)


def test_aggregate_by_ids_word_durations():
    pdur = jnp.asarray([[2.0, 1.0, 3.0, 4.0, 0.0]])
    ids = jnp.asarray([[0, 0, 1, 2, -1]])
    wdur = np.asarray(aggregate_by_ids(pdur, ids, 3))
    np.testing.assert_array_equal(wdur, [[3.0, 3.0, 4.0]])


def test_get_segments():
    x = jnp.arange(2 * 3 * 10, dtype=jnp.float32).reshape(2, 3, 10)
    out = np.asarray(get_segments(x, jnp.array([2, 5]), 4))
    np.testing.assert_array_equal(out[0, 0], [2, 3, 4, 5])
    np.testing.assert_array_equal(out[1, 0], [35, 36, 37, 38])


def test_get_random_segments_bounds():
    x = jnp.zeros((4, 1, 100))
    lengths = jnp.array([100, 50, 30, 10])
    segs, starts = get_random_segments(x, lengths, 20, jax.random.PRNGKey(0))
    assert segs.shape == (4, 1, 20)
    starts = np.asarray(starts)
    assert (starts >= 0).all()
    assert (starts <= np.maximum(np.asarray(lengths) - 20, 0)).all()


def test_host_beta_binomial_prior():
    prior = beta_binomial_prior(5, 12)
    assert prior.shape == (12, 5)
    # reference evaluates BetaBinom(n=P) only at k < P, so rows sum to
    # 1 - pmf(P) (exactly reproduces `src/tools/utils.py:51-61`)
    ref_row0 = betabinom(5, 1.0, 12.0).pmf(np.arange(5))
    np.testing.assert_allclose(prior[0], ref_row0, rtol=1e-10)
    assert (prior.sum(-1) <= 1.0 + 1e-9).all()
    # mass drifts monotonically towards later phonemes
    assert prior[0].argmax() == 0 and prior[-1].argmax() == 4
