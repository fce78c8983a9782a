"""Golden ITU-R BS.1770-4 multichannel loudness, float64.

The reference's ITU1770MultiChannelLoudness source is documented-but-absent
(ref: README:65-66; SURVEY.md §2.2); behavior here follows the BS.1770-4
standard directly: per-channel K-weighting (stage-1 high shelf + stage-2 RLB
high-pass), 400 ms gating blocks with 75 % overlap, surround channel weights,
absolute -70 LKFS and relative -10 LU gating.

The 48 kHz coefficient values produced by :func:`k_weighting_coeffs` match
the tables in BS.1770-4 Annex 1; for other rates the filters are re-designed
from the standard's analogue prototypes (pre-warped bilinear transform with
the published f0/Q/G parameters).
"""

from __future__ import annotations

import math

import numpy as np

from .biquad import biquad_process

# 5.1 channel weighting G_i (BS.1770-4 Table 3): L, R, C, Ls, Rs (LFE excluded)
CHANNEL_WEIGHTS_5_1 = np.array([1.0, 1.0, 1.0, 1.41, 1.41], np.float64)

ABSOLUTE_GATE_LKFS = -70.0
RELATIVE_GATE_LU = -10.0
_OFFSET = -0.691  # BS.1770-4 eq. (2)


def _shelf_coeffs(fs: float) -> np.ndarray:
    """Stage-1 spherical-head high shelf (BS.1770-4 Annex 1 pre-filter)."""
    f0 = 1681.974450955533
    G = 3.999843853973347
    Q = 0.7071752369554196
    K = math.tan(math.pi * f0 / fs)
    Vh = 10.0 ** (G / 20.0)
    Vb = Vh**0.4996667741545416
    a0 = 1.0 + K / Q + K * K
    b0 = (Vh + Vb * K / Q + K * K) / a0
    b1 = 2.0 * (K * K - Vh) / a0
    b2 = (Vh - Vb * K / Q + K * K) / a0
    a1 = 2.0 * (K * K - 1.0) / a0
    a2 = (1.0 - K / Q + K * K) / a0
    return np.array([b0, b1, b2, a1, a2], np.float64)


def _rlb_coeffs(fs: float) -> np.ndarray:
    """Stage-2 RLB high-pass (BS.1770-4 Annex 1)."""
    f0 = 38.13547087602444
    Q = 0.5003270373238773
    K = math.tan(math.pi * f0 / fs)
    a0 = 1.0 + K / Q + K * K
    a1 = 2.0 * (K * K - 1.0) / a0
    a2 = (1.0 - K / Q + K * K) / a0
    return np.array([1.0, -2.0, 1.0, a1, a2], np.float64)


def k_weighting_coeffs(fs: float) -> np.ndarray:
    """Both K-weighting biquads, ``[2, 5]`` (stage 1 shelf, stage 2 RLB)."""
    return np.stack([_shelf_coeffs(fs), _rlb_coeffs(fs)])


def k_weight(x: np.ndarray, fs: float) -> np.ndarray:
    """Apply K-weighting to ``[channels, time]`` audio."""
    x = np.atleast_2d(np.asarray(x, np.float64))
    shelf, rlb = k_weighting_coeffs(fs)
    out = np.empty_like(x)
    for c in range(x.shape[0]):
        y, _ = biquad_process(x[c], shelf)
        y, _ = biquad_process(y, rlb)
        out[c] = y
    return out


def block_loudness(x: np.ndarray, fs: float, weights=None):
    """Per-gating-block loudness l_j in LKFS over ``[channels, time]`` audio.

    400 ms blocks, 75 % overlap (BS.1770-4 §2 step 100 ms).  Returns
    ``(l_j, z_j)`` where ``z_j`` is the weighted mean-square power per block.
    """
    x = np.atleast_2d(np.asarray(x, np.float64))
    nch = x.shape[0]
    if weights is None:
        weights = (
            CHANNEL_WEIGHTS_5_1[:nch]
            if nch <= 5
            else np.ones(nch, np.float64)
        )
    weights = np.asarray(weights, np.float64)
    y = k_weight(x, fs)
    blk = int(round(0.400 * fs))
    step = int(round(0.100 * fs))
    nblocks = (y.shape[1] - blk) // step + 1
    if nblocks <= 0:
        return np.array([]), np.array([])
    z = np.empty(nblocks, np.float64)
    for j in range(nblocks):
        seg = y[:, j * step : j * step + blk]
        z[j] = np.sum(weights * np.mean(seg**2, axis=1))
    with np.errstate(divide="ignore"):
        l = _OFFSET + 10.0 * np.log10(z)
    return l, z


def integrated_loudness(x: np.ndarray, fs: float, weights=None) -> float:
    """Gated integrated loudness in LKFS (BS.1770-4 eq. (4)-(5))."""
    l, z = block_loudness(x, fs, weights)
    if l.size == 0:
        return -np.inf
    abs_mask = l > ABSOLUTE_GATE_LKFS
    if not abs_mask.any():
        return -np.inf
    rel_threshold = (
        _OFFSET + 10.0 * np.log10(np.mean(z[abs_mask])) + RELATIVE_GATE_LU
    )
    mask = abs_mask & (l > rel_threshold)
    if not mask.any():
        return -np.inf
    return _OFFSET + 10.0 * np.log10(np.mean(z[mask]))
