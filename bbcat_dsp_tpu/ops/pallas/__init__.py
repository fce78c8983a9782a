"""Pallas TPU kernels (optional backends for the hot ops)."""

from .spectral_fir import (
    head_mac_tiled_pallas,
    rotated_mac_pallas,
    windowed_grouped_mac_pallas,
)
from .spectral_mac import head_mac_pallas, pallas_mac_enabled

__all__ = [
    "head_mac_pallas",
    "head_mac_tiled_pallas",
    "pallas_mac_enabled",
    "rotated_mac_pallas",
    "windowed_grouped_mac_pallas",
]
