"""Schroeder reverberator — the composition the reference's all-pass was
built for (ref: src/AllPassFilter.h:12-15 "Building block for
reverbs/decorrelators").

Classic topology: N parallel feedback combs (dense modal response, decay
set per-comb from the target RT60) into a chain of series all-passes
(echo-density diffusion).  Every element is one of this framework's
phase-decomposed scans, so the whole reverb is a handful of parallel
associative scans per block — no per-sample loop anywhere.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..filters.allpass import allpass_apply, comb_apply

__all__ = ["SchroederReverb"]

# classic Schroeder/Moorer tunings at 25 kHz, scaled to fs (mutually prime)
_COMB_DELAYS_25K = (1557, 1617, 1491, 1422)
_ALLPASS_DELAYS_25K = (225, 556, 441)
_ALLPASS_COEFF = 0.7


class SchroederReverb:
    """Streaming stereo-capable reverb.

    ``rt60``: decay time in seconds; ``mix``: wet fraction;
    ``spread``: per-channel comb-delay offset (decorrelates channels).
    """

    def __init__(self, nchannels: int, fs: float = 48000.0,
                 rt60: float = 1.2, mix: float = 0.3, spread: int = 23,
                 dtype=jnp.float32):
        self.fs = fs
        self.mix = float(mix)
        scale = fs / 25000.0
        self.comb_delays = []
        self.comb_gains = []
        for i, d0 in enumerate(_COMB_DELAYS_25K):
            # per-channel offsets: same decay, different modes
            ds = tuple(int(round(d0 * scale)) + spread * c
                       for c in range(nchannels))
            self.comb_delays.append(ds)
            # g = 10^(-3 d / (rt60 fs)) gives -60 dB after rt60 seconds
            self.comb_gains.append(tuple(
                10.0 ** (-3.0 * d / (rt60 * fs)) for d in ds))
        # per-channel all-pass tunings decorrelate the dense tail between
        # channels (comb offsets alone leave the early field correlated)
        self.ap_delays = [
            tuple(int(round(d * scale)) + 7 * c for c in range(nchannels))
            for d in _ALLPASS_DELAYS_25K
        ]
        self.nchannels = nchannels
        self._comb_rings = [
            [jnp.zeros((1, d), dtype) for d in ds] for ds in self.comb_delays
        ]
        self._ap_rings = [
            [jnp.zeros((1, d), dtype) for d in ds] for ds in self.ap_delays
        ]

    def process_block(self, x: jax.Array) -> jax.Array:
        """``x [C, B]`` -> reverberated ``[C, B]`` (dry/wet mixed)."""
        wet = jnp.zeros_like(x)
        for ci, (ds, gs) in enumerate(
                zip(self.comb_delays, self.comb_gains)):
            outs = []
            for c in range(self.nchannels):
                y, self._comb_rings[ci][c] = comb_apply(
                    x[c:c + 1], gs[c], ds[c], self._comb_rings[ci][c]
                )
                outs.append(y)
            wet = wet + jnp.concatenate(outs, axis=0)
        wet = wet / len(self.comb_delays)
        for ai, ds in enumerate(self.ap_delays):
            outs = []
            for c in range(self.nchannels):
                y, self._ap_rings[ai][c] = allpass_apply(
                    wet[c:c + 1], _ALLPASS_COEFF, ds[c],
                    self._ap_rings[ai][c]
                )
                outs.append(y)
            wet = jnp.concatenate(outs, axis=0)
        return (1.0 - self.mix) * x + self.mix * wet

    def reset(self) -> None:
        self._comb_rings = [[jnp.zeros_like(r) for r in rs]
                            for rs in self._comb_rings]
        self._ap_rings = [[jnp.zeros_like(r) for r in rs]
                          for rs in self._ap_rings]
