"""Partitioned FFT convolution engines (the reference's documented-absent
BlockConvolver/Convolver capability, ref: README:38-44, rebuilt TPU-first).
"""

from .fft import rfft, irfft, register_backend, backends
from .block import (
    BlockConvolver,
    ConvolverState,
    convolver_init,
    convolver_render,
    convolver_step,
    convolver_step_crossfade,
    partition_ir,
)
from .matrix import (
    MatrixConvolver,
    matrix_step,
    matrix_step_crossfade,
    partition_ir_matrix,
)

__all__ = [
    "rfft",
    "irfft",
    "register_backend",
    "backends",
    "BlockConvolver",
    "ConvolverState",
    "convolver_init",
    "convolver_render",
    "convolver_step",
    "convolver_step_crossfade",
    "partition_ir",
    "MatrixConvolver",
    "matrix_step",
    "matrix_step_crossfade",
    "partition_ir_matrix",
]
