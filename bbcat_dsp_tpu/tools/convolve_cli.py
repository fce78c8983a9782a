"""CLI: offline convolution / binaural rendering of audio files.

    # convolve with an IR (multi-channel: per-channel IRs)
    python -m bbcat_dsp_tpu.tools.convolve_cli input.wav ir.wav out.wav

    # binaural: render N-channel input through a SOFA HRTF set (azimuths
    # spread evenly around the listener)
    python -m bbcat_dsp_tpu.tools.convolve_cli input.wav hrtf.sofa out.wav
"""

from __future__ import annotations

import sys

import numpy as np
import jax.numpy as jnp

from ..convolve import NonUniformConvolver
from ..models import BinauralRenderer
from ..formats.sample_format import SampleFormat
from .wav import read_wav, write_wav


def _pad_to(x: np.ndarray, mult: int) -> np.ndarray:
    pad = (-x.shape[-1]) % mult
    if pad:
        x = np.pad(x, [(0, 0), (0, pad)])
    return x


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) != 3:
        print(__doc__)
        return 2
    inp, irp, outp = argv
    audio, fs = read_wav(inp)

    if irp.lower().endswith(".sofa"):
        from ..sofa import SOFAFile

        s = SOFAFile.open(irp)
        C = audio.shape[0]
        azimuths = [(360.0 * i / C, 0.0) for i in range(C)]
        hrtf = s.hrtf_matrix(azimuths)
        block = 512
        r = BinauralRenderer(hrtf, block=block, fs=fs)
        x = _pad_to(audio, block)
        outs = [
            np.asarray(r.process_block(jnp.asarray(x[:, i*block:(i+1)*block])))
            for i in range(x.shape[-1] // block)
        ]
        y = np.concatenate(outs, -1)[:, : audio.shape[-1]]
        print(f"binaural: {C} ch -> 2 ch via {irp}; {r.loudness()}")
    else:
        ir, _ = read_wav(irp)
        if ir.shape[0] == 1 and audio.shape[0] > 1:
            ir = np.broadcast_to(ir, (audio.shape[0], ir.shape[1]))
        conv = NonUniformConvolver(ir, block=512, nchannels=audio.shape[0])
        x = _pad_to(audio, conv.super_block)
        y = np.asarray(conv.process(jnp.asarray(x)))[:, : audio.shape[-1]]
        print(f"convolved {audio.shape[0]} ch with {ir.shape[-1]}-tap IR")

    peak = np.abs(y).max()
    if peak > 1.0:
        y = y / peak * 0.999
        print(f"normalised by {peak:.3f} to avoid clipping")
    write_wav(outp, y, fs, SampleFormat.INT24)
    return 0


if __name__ == "__main__":
    sys.exit(main())
