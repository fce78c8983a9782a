"""CLI: BS.1770 loudness + true peak of audio files.

    python -m bbcat_dsp_tpu.tools.loudness_cli input.wav [input2.wav ...]
"""

from __future__ import annotations

import sys

import jax.numpy as jnp

from ..loudness import integrated_loudness, true_peak_db
from .wav import read_wav


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0 if argv else 2
    for path in argv:
        audio, fs = read_wav(path)
        L = float(integrated_loudness(jnp.asarray(audio), fs))
        tp = float(jnp.max(true_peak_db(jnp.asarray(audio))))
        print(f"{path}: integrated {L:+.1f} LKFS, true peak {tp:+.1f} dBTP "
              f"({audio.shape[0]} ch, {audio.shape[1] / fs:.1f} s @ {fs:.0f} Hz)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
