"""Host-side beta-binomial alignment prior (offline preprocessing).

Equivalent of `src/tools/utils.py:51-61`: per-utterance (M mel frames x P
phonemes) prior probability matrix cached next to the wavs. The in-graph
log-domain version for JETS lives in `ops/forward_sum.py`.
"""

from __future__ import annotations

import numpy as np
from scipy.stats import betabinom


def beta_binomial_prior(
    phoneme_count: int, mel_count: int, scaling_factor: float = 1.0
) -> np.ndarray:
    """(mel_count, phoneme_count) matrix; row i ~ BetaBinom(P-1, w*i, w*(M+1-i))."""
    P, M = phoneme_count, mel_count
    k = np.arange(P)
    i = np.arange(1, M + 1, dtype=np.float64)
    a = scaling_factor * i
    b = scaling_factor * (M + 1.0 - i)
    return betabinom(P, a[:, None], b[:, None]).pmf(k[None, :])
