"""Dithering hooks.

Parity with the reference's ``Ditherer`` virtual interface and ``Dither_t``
enum (ref: src/SoundFormatConversions.h:39-54).  The reference ships the hook
but no concrete implementation (the base class is a no-op); we provide the
documented TPDF ditherer as a real implementation.

Dither is applied to the MSB-aligned 32-bit integer register immediately
before a narrowing integer write, with ``bits`` = the number of low bits about
to be discarded (ref: src/genconversions.php:220-223).
"""

from __future__ import annotations

import numpy as np


class Ditherer:
    """No-op base ditherer (ref: class Ditherer, SoundFormatConversions.h:39-48)."""

    def dither(self, channel: int, data: int, bits: int) -> int:
        return data

    def dither_block(
        self, data: np.ndarray, bits: int, channels: np.ndarray | None = None
    ) -> np.ndarray:
        """Vectorised hook used by the block transfer path."""
        return data


class TPDFDitherer(Ditherer):
    """Triangular-PDF dither: adds the sum of two independent uniform randoms
    spanning one LSB of the target width before truncation — the classic
    TPDF scheme named by the reference's ``Dither_TPDF`` enum
    (ref: src/SoundFormatConversions.h:50-54).
    """

    def __init__(self, seed: int = 0):
        self._rng = np.random.default_rng(seed)

    def dither_block(
        self, data: np.ndarray, bits: int, channels: np.ndarray | None = None
    ) -> np.ndarray:
        if bits <= 0:
            return data
        lsb = np.int64(1) << bits
        r = self._rng.integers(0, lsb, size=data.shape, dtype=np.int64)
        r += self._rng.integers(0, lsb, size=data.shape, dtype=np.int64)
        # r - lsb/2 gives zero-mean-plus-half-LSB TPDF, which exactly unbiases
        # the subsequent floor truncation (>> shift) of the narrowing write
        v = data.astype(np.int64) + (r - (lsb >> 1))
        return np.clip(v, -(2**31), 2**31 - 1).astype(np.int32)

    def dither(self, channel: int, data: int, bits: int) -> int:
        return int(self.dither_block(np.array([data], np.int32), bits)[0])
