"""Pallas TPU kernels (optional backends for the hot ops)."""

from .perm_fft import perm_irfft_tail_pallas, perm_rfft_half_pallas
from .spectral_fir import (
    head_mac_tiled_pallas,
    rotated_mac_pallas,
    xt_grouped_mac_pallas,
)
from .spectral_mac import head_mac_pallas, pallas_mac_enabled

__all__ = [
    "head_mac_pallas",
    "head_mac_tiled_pallas",
    "pallas_mac_enabled",
    "perm_irfft_tail_pallas",
    "perm_rfft_half_pallas",
    "rotated_mac_pallas",
    "xt_grouped_mac_pallas",
]
