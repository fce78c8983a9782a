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


class ShapedDitherer(Ditherer):
    """Error-feedback (noise-shaped) TPDF dither with per-channel state.

    Exercises the full extent of the reference's ``Ditherer`` contract: the
    virtual hook passes a channel index precisely so an implementation can
    keep per-channel feedback state (ref: src/SoundFormatConversions.h:44);
    the reference ships no such implementation — this is the stateful
    extension that slot invites.

    Classic error-feedback structure (Lipshitz/Wannamaker): the quantizer
    input is the sample minus the FIR-filtered history of previous
    quantization errors,

        w[n] = x[n] - sum_k h[k] * e[n-k],     e[n] = q(w[n] + r[n]) - w[n]

    which shapes the output noise by ``1 - H(z)`` — for the default
    first-order ``h = [1]`` a 6 dB/oct high-pass that moves quantization
    noise out of the audible low band (TPDF randomization ``r`` is kept, so
    the error stays statistically independent of the signal).  State is one
    error history per channel, carried across ``dither_block`` calls so
    block-streaming through :func:`transfer_samples` behaves identically to
    one whole-signal call.
    """

    def __init__(self, shape: tuple[float, ...] = (1.0,), seed: int = 0):
        self._h = np.asarray(shape, np.float64)
        self._rng = np.random.default_rng(seed)
        self._ehist: np.ndarray | None = None  # [order, nch], newest first

    def reset(self) -> None:
        self._ehist = None

    def _ensure(self, nch: int) -> np.ndarray:
        order = len(self._h)
        if self._ehist is None or self._ehist.shape[1] < nch:
            eh = np.zeros((order, nch))
            if self._ehist is not None:
                eh[:, : self._ehist.shape[1]] = self._ehist
            self._ehist = eh
        return self._ehist[:, :nch]

    def dither_block(
        self, data: np.ndarray, bits: int, channels: np.ndarray | None = None
    ) -> np.ndarray:
        if bits <= 0:
            return data
        lsb = float(1 << bits)
        if channels is None:
            nch = 1
        else:
            nch = int(np.max(channels)) + 1
        # the transfer path tiles channels frame-major (channel index cycles
        # fastest), so the flat block is exactly [nframes, nch]
        d2 = np.asarray(data, np.float64).reshape(-1, nch)
        eh = self._ensure(nch)

        half = 1 << (bits - 1)
        # both TPDF components drawn per-sample (last axis) so the RNG
        # stream is identical whether the signal arrives in one call or in
        # blocks — the streaming == whole-signal contract
        r = self._rng.integers(
            0, 1 << bits, size=(*d2.shape, 2)
        ).sum(-1).astype(np.float64)
        r -= half  # zero-mean-plus-half-LSB TPDF (unbiases floor truncation)

        # the recurrence is inherently sequential (the quantizer inside the
        # feedback loop is nonlinear), so the per-frame loop runs natively
        # (native/src/formatconv.cpp::fc_shaped_dither) when the C++ engine
        # is available; the Python loop below is the exact fallback (same
        # RNG stream, so the two paths are bit-identical)
        from ..utils.native import shaped_dither_block

        eh_c = np.ascontiguousarray(eh)
        native = shaped_dither_block(
            d2.astype(np.int64).clip(-(2**31), 2**31 - 1).astype(np.int32),
            r, eh_c, self._h, bits,
        )
        if native is not None:
            self._ehist[:, :nch] = eh_c
            return native.reshape(np.asarray(data).shape)

        out = np.empty_like(d2)
        for n in range(d2.shape[0]):
            w = d2[n] - self._h @ eh
            v = np.rint(w + r[n])
            # the narrowing write later truncates via (v >> bits) << bits
            # (arithmetic shift == floor); reproduce it to get the error
            q = np.floor(v / lsb) * lsb
            eh[1:] = eh[:-1]
            eh[0] = q - w
            out[n] = v
        self._ehist[:, :nch] = eh
        return np.clip(out.reshape(np.asarray(data).shape), -(2.0**31),
                       2.0**31 - 1).astype(np.int32)

    def dither(self, channel: int, data: int, bits: int) -> int:
        """Per-sample path, updating only ``channel``'s feedback state
        (the reference's scalar virtual-call signature)."""
        if bits <= 0:
            return data
        lsb = float(1 << bits)
        eh = self._ensure(channel + 1)
        w = float(data) - float(self._h @ eh[:, channel])
        r = float(self._rng.integers(0, 1 << bits, size=2).sum()
                  - (1 << (bits - 1)))
        v = float(np.rint(w + r))
        q = np.floor(v / lsb) * lsb
        eh[1:, channel] = eh[:-1, channel]
        eh[0, channel] = q - w
        return int(np.clip(v, -(2.0**31), 2.0**31 - 1))
