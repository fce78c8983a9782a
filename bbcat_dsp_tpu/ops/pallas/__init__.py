"""Pallas TPU kernels (optional backends for the hot ops)."""

from .spectral_mac import head_mac_pallas, pallas_mac_enabled

__all__ = ["head_mac_pallas", "pallas_mac_enabled"]
