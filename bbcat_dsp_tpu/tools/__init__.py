"""Command-line tools built on the framework (the "host application" role
the reference left to its callers): loudness measurement, offline
convolution / binaural rendering, WAV I/O."""

from .wav import read_wav, write_wav

__all__ = ["read_wav", "write_wav"]
