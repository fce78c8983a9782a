"""Flagship model: streaming binaural (HRTF) renderer.

The framework's end-to-end composition (BASELINE.json config #3): N input
channels -> per-channel EQ cascade (modal IIR engine) -> C_in x 2 HRTF
matrix convolution with click-free IR swap -> stereo out, with BS.1770
loudness + true-peak metering on the output bus.

Everything in the audio path is one jittable pure step
(:func:`binaural_step`) over explicit state pytrees — the model the driver
compile-checks (``__graft_entry__.entry``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..convolve.block import ConvolverState, convolver_init
from ..convolve.matrix import (
    matrix_step,
    matrix_step_crossfade,
    partition_ir_matrix,
)
from ..filters.iir import modal_apply, modal_init, modal_params
from ..loudness import LoudnessMeter

__all__ = ["BinauralState", "binaural_init", "binaural_step", "BinauralRenderer"]


class BinauralState(NamedTuple):
    eq: tuple          # tuple of per-stage ModalState (leading batch = C_in)
    conv: ConvolverState


def binaural_init(
    eq_params: tuple, nchannels: int, block: int, nparts: int,
    dtype=jnp.float32,
) -> BinauralState:
    return BinauralState(
        eq=tuple(modal_init(p, (nchannels,), dtype) for p in eq_params),
        conv=convolver_init(nchannels, block, nparts, dtype),
    )


def binaural_step(
    state: BinauralState, eq_params: tuple, H: jax.Array, x: jax.Array
):
    """One block: ``x [C_in, B]`` -> ``y [2, B]``.  Pure/jittable."""
    y = x
    new_eq = []
    for p, s in zip(eq_params, state.eq):
        y, s2 = modal_apply(y, p, s)
        new_eq.append(s2)
    conv, out = matrix_step(state.conv, H, y)
    return BinauralState(eq=tuple(new_eq), conv=conv), out


class BinauralRenderer:
    """Streaming wrapper: EQ + HRTF matrix convolver + output metering.

    ``hrtf`` is ``[C_in, 2, N]`` (e.g. from
    :class:`bbcat_dsp_tpu.sofa.SOFAFile`); ``eq_stages`` an optional list of
    ``[5]`` biquad coefficient rows applied to every input channel.
    """

    def __init__(self, hrtf, block: int, eq_stages=None, fs: float = 48000.0,
                 nparts: int | None = None, dtype=jnp.float32):
        hrtf = np.asarray(hrtf)
        self.block = int(block)
        self.fs = fs
        self.H = partition_ir_matrix(hrtf, self.block, nparts)
        _, self.nparts, self.c_in, self.c_out, _ = self.H.shape
        eq_stages = [] if eq_stages is None else list(eq_stages)
        self.eq_params = tuple(modal_params(c, dtype) for c in eq_stages)
        self.state = binaural_init(
            self.eq_params, self.c_in, self.block, self.nparts, dtype
        )
        self.meter = LoudnessMeter(self.c_out, fs)
        self._meter_buf = np.zeros((self.c_out, 0), np.float32)
        self._pending_H = None
        self._step = jax.jit(binaural_step)

    def set_hrtf(self, hrtf) -> None:
        """Click-free HRTF exchange at the next block."""
        self._pending_H = partition_ir_matrix(
            np.asarray(hrtf), self.block, self.nparts
        )

    def process_block(self, x: jax.Array) -> jax.Array:
        if self._pending_H is not None:
            y = x
            new_eq = []
            for p, s in zip(self.eq_params, self.state.eq):
                y, s2 = modal_apply(y, p, s)
                new_eq.append(s2)
            conv, out = matrix_step_crossfade(
                self.state.conv, self.H, self._pending_H, y
            )
            self.state = BinauralState(eq=tuple(new_eq), conv=conv)
            self.H = self._pending_H
            self._pending_H = None
        else:
            self.state, out = self._step(self.state, self.eq_params, self.H, x)
        self._feed_meter(out)
        return out

    def _feed_meter(self, out: jax.Array) -> None:
        self._meter_buf = np.concatenate(
            [self._meter_buf, np.asarray(out, np.float32)], axis=-1
        )
        step = self.meter.step
        n = (self._meter_buf.shape[-1] // step) * step
        if n:
            self.meter.process(jnp.asarray(self._meter_buf[:, :n]))
            self._meter_buf = self._meter_buf[:, n:]

    def loudness(self) -> dict:
        return {
            "momentary_lkfs": self.meter.momentary(),
            "short_term_lkfs": self.meter.short_term(),
            "integrated_lkfs": self.meter.integrated(),
        }
