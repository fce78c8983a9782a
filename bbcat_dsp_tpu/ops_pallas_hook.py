"""Late-bound hook connecting convolve to the optional Pallas kernels
(avoids a convolve <-> ops import cycle)."""

from __future__ import annotations


def maybe_pallas_mac(xext, H, ratio):
    import jax

    from .ops.pallas.spectral_mac import head_mac_pallas, pallas_mac_enabled

    if not pallas_mac_enabled():
        return None
    # non-TPU backends run the kernel through the Pallas interpreter
    interpret = jax.default_backend() != "tpu"
    return head_mac_pallas(xext, H, ratio, interpret=interpret)
