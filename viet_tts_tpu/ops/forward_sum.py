"""Batched forward-sum (alignment CTC) losses — fully on device.

The reference computes these with per-sample Python loops around
`nn.CTCLoss` (`models/tts/fastspeech2/loss.py:199-227`,
`models/gan_tts/jets/loss.py:164-228`). Because the CTC "targets" are always
the strictly increasing sequence 1..N (every text token distinct), the CTC
forward algorithm specialises to a clean 3-band log-domain recursion that we
run as one batched `lax.scan` over mel frames.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

NEG = -1.0e30


def _logaddexp3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    m_safe = jnp.maximum(m, NEG)
    out = m_safe + jnp.log(
        jnp.exp(a - m_safe) + jnp.exp(b - m_safe) + jnp.exp(c - m_safe)
    )
    return jnp.maximum(out, NEG)


def ctc_forward_sum(
    log_probs: jnp.ndarray,
    key_lens: jnp.ndarray,
    query_lens: jnp.ndarray,
) -> jnp.ndarray:
    """CTC negative log-likelihood for targets = (1..key_len) per sample.

    Args:
        log_probs: (B, T_mel, T_text+1) log probabilities; column 0 is the
            CTC blank, column k is text token k.
        key_lens: (B,) number of text tokens.
        query_lens: (B,) number of mel frames.

    Returns:
        (B,) per-sample NLL (not length-normalised).
    """
    B, T_mel, _ = log_probs.shape
    T_text = log_probs.shape[-1] - 1
    S = 2 * T_text + 1  # interleaved blank/token states

    s = jnp.arange(S)
    is_token = (s % 2) == 1
    emit_col = jnp.where(is_token, (s + 1) // 2, 0)  # (S,)
    state_valid = s[None, :] <= (2 * key_lens[:, None])  # (B, S)

    lp_states = log_probs[:, :, emit_col]  # (B, T_mel, S)
    lp_states = jnp.where(state_valid[:, None, :], lp_states, NEG)

    alpha0 = jnp.where(
        (s[None, :] <= 1) & state_valid, lp_states[:, 0, :], NEG
    )

    t_idx = jnp.arange(T_mel)

    def step(alpha, inputs):
        lp_t, t = inputs
        stay = alpha
        prev1 = jnp.concatenate([jnp.full((B, 1), NEG), alpha[:, :-1]], axis=1)
        prev2 = jnp.concatenate([jnp.full((B, 2), NEG), alpha[:, :-2]], axis=1)
        # Skip transition (s-2) only into token states (labels all distinct).
        prev2 = jnp.where(is_token[None, :], prev2, NEG)
        new = lp_t + _logaddexp3(stay, prev1, prev2)
        new = jnp.where(state_valid, new, NEG)
        active = (t < query_lens)[:, None]
        return jnp.where(active, new, alpha), None

    # Serial DP over mel frames (order-dependent log-sum-exp), but each
    # iteration's arithmetic is tiny vs its dispatch latency on TPU
    # (PERF_NOTES.md §2: ~26us/iter x 512 frames bounds the FS2 train
    # step). unroll=8 fuses 8 frame updates per loop body: the (B, S)
    # carry stays in VMEM across the fused chain and loop overhead
    # amortizes 8x. Math is unchanged.
    alpha_final, _ = jax.lax.scan(
        step,
        alpha0,
        (jnp.swapaxes(lp_states[:, 1:, :], 0, 1), t_idx[1:]),
        unroll=8,
    )

    batch = jnp.arange(B)
    end_blank = alpha_final[batch, 2 * key_lens]
    end_token = alpha_final[batch, 2 * key_lens - 1]
    ll = jnp.logaddexp(
        jnp.maximum(end_blank, NEG), jnp.maximum(end_token, NEG)
    )
    return -ll


def forward_sum_loss(
    attn_logprob: jnp.ndarray,
    in_lens: jnp.ndarray,
    out_lens: jnp.ndarray,
    blank_logprob: float = -1.0,
) -> jnp.ndarray:
    """FastSpeech2 ForwardSumLoss (`fastspeech2/loss.py:199-227`).

    Args:
        attn_logprob: (B, 1, T_mel, T_text) unnormalised log attention.

    Blank column prepended at ``blank_logprob`` then log-softmaxed over the
    (key_len+1) valid columns per sample; per-sample NLL is divided by
    key_len (torch CTCLoss 'mean') and averaged over the batch.
    """
    x = attn_logprob[:, 0]  # (B, T_mel, T_text)
    B, T_mel, T_text = x.shape
    x = jnp.concatenate(
        [jnp.full((B, T_mel, 1), blank_logprob, x.dtype), x], axis=-1
    )
    col = jnp.arange(T_text + 1)
    col_valid = col[None, :] <= in_lens[:, None]  # (B, T_text+1)
    masked = jnp.where(col_valid[:, None, :], x, NEG)
    logz = jax.scipy.special.logsumexp(masked, axis=-1, keepdims=True)
    log_probs = jnp.where(col_valid[:, None, :], masked - logz, NEG)

    nll = ctc_forward_sum(log_probs, in_lens, out_lens)
    return (nll / jnp.maximum(in_lens, 1)).mean()


def jets_forward_sum_loss(
    log_p_attn: jnp.ndarray,
    ilens: jnp.ndarray,
    olens: jnp.ndarray,
    blank_prob: float = float(np.e**-1),
    bb_prior: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """JETS ForwardSumLoss (`jets/loss.py:164-228`).

    Args:
        log_p_attn: (B, T_feats, T_text), already log-softmaxed over text.
        bb_prior: optional (B, T_feats, T_text) log beta-binomial prior to
            add (see :func:`beta_binomial_log_prior`).

    No re-normalisation after adding the prior/blank (matches the reference
    feeding unnormalised scores to F.ctc_loss).
    """
    if bb_prior is not None:
        log_p_attn = jnp.maximum(log_p_attn + bb_prior, NEG)
    B, T_feats, T_text = log_p_attn.shape
    padded = jnp.concatenate(
        [
            jnp.full((B, T_feats, 1), float(np.log(blank_prob)), log_p_attn.dtype),
            log_p_attn,
        ],
        axis=-1,
    )
    nll = ctc_forward_sum(padded, ilens, olens)
    return (nll / jnp.maximum(ilens, 1)).mean()


def beta_binomial_log_prior(
    text_lens: jnp.ndarray,
    feats_lens: jnp.ndarray,
    t_text: int,
    t_feats: int,
    w: float = 1.0,
) -> jnp.ndarray:
    """Batched log beta-binomial alignment prior, in-graph.

    Equivalent of `jets/loss.py:231-268` (which loops per sample on the host
    with a shape-keyed cache): prior[b, t, k] = BetaBinom(k; N_b, w*(t+1),
    w*(T_b-t)) with N_b = text_len, T_b = feats_len; NEG outside the valid
    region.
    """
    gammaln = jax.scipy.special.gammaln

    def betaln(a, b):
        return gammaln(a) + gammaln(b) - gammaln(a + b)

    t = jnp.arange(t_feats, dtype=jnp.float32)[None, :, None]  # frame idx
    k = jnp.arange(t_text, dtype=jnp.float32)[None, None, :]  # token idx
    n = text_lens.astype(jnp.float32)[:, None, None]
    T = feats_lens.astype(jnp.float32)[:, None, None]

    alpha = w * (t + 1.0)
    beta = w * (T - t)
    log_binom = gammaln(n + 1.0) - gammaln(k + 1.0) - gammaln(n - k + 1.0)
    logp = log_binom + betaln(k + alpha, n - k + beta) - betaln(alpha, beta)

    valid = (t < T) & (k < n)
    return jnp.where(valid, logp, NEG)


def bin_loss(hard_attention: jnp.ndarray, soft_attention: jnp.ndarray) -> jnp.ndarray:
    """Binarization loss: -sum(log soft at hard=1)/sum(hard)
    (`fastspeech2/loss.py:230-237`)."""
    log_soft = jnp.log(jnp.maximum(soft_attention, 1e-12))
    total = (hard_attention * log_soft).sum()
    return -total / jnp.maximum(hard_attention.sum(), 1.0)
