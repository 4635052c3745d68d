"""Beta-binomial alignment prior (host-side preprocessing).

Equivalent of the reference's prior pipeline
(`models/fastpitch/fastpitch/data_function.py:45-78`): the text<->mel
diagonal prior P[m, p] = BetaBinom(P-1; a=m+1, b=M-m) evaluated per mel
frame, with an interpolating cache over rounded sizes so long utterances
reuse zoomed versions of a few computed banks.
"""
from __future__ import annotations

import functools

import numpy as np
from scipy import ndimage
from scipy.stats import betabinom


@functools.lru_cache(maxsize=64)
def beta_binomial_prior(phoneme_count: int, mel_count: int,
                        scaling: float = 1.0) -> np.ndarray:
    """[mel_count, phoneme_count] prior matrix (data_function.py:68-78)."""
    P, M = phoneme_count, mel_count
    x = np.arange(P)
    rows = [betabinom(P, scaling * i, scaling * (M + 1 - i)).pmf(x)
            for i in range(1, M + 1)]
    return np.asarray(rows, dtype=np.float32)


class BetaBinomialInterpolator:
    """Cache priors at rounded sizes, interpolate to the requested size
    (data_function.py:45-65). Call with (mel_len, text_len)."""

    def __init__(self, round_mel_len_to: int = 100,
                 round_text_len_to: int = 20):
        self.round_mel = round_mel_len_to
        self.round_text = round_text_len_to

    @staticmethod
    def _round(val: int, to: int) -> int:
        return max(1, int(np.round((val + 1) / to))) * to

    def __call__(self, mel_len: int, text_len: int) -> np.ndarray:
        bw = self._round(mel_len, self.round_mel)
        bh = self._round(text_len, self.round_text)
        # reference quirk (data_function.py:62): the cached bank is computed
        # with (phoneme_count=rounded_mel, mel_count=rounded_text) and then
        # transposed, i.e. each TEXT column is a BetaBinomial over mel
        # frames; reproduced exactly for parity
        bank = beta_binomial_prior(bw, bh).T  # [bw, bh]
        out = ndimage.zoom(bank, zoom=(mel_len / bw, text_len / bh), order=1)
        assert out.shape == (mel_len, text_len)
        return out.astype(np.float32)
