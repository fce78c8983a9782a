"""ITU-R BS.1770 loudness + true peak (ref: README:65-66, capability spec
from the standard; BASELINE.json config #4)."""

from .itu1770 import (
    LoudnessMeter,
    MeterState,
    block_powers,
    default_channel_weights,
    integrated_loudness,
    k_weight,
    k_weight_params,
)
from .truepeak import true_peak, true_peak_db

__all__ = [
    "LoudnessMeter",
    "MeterState",
    "block_powers",
    "default_channel_weights",
    "integrated_loudness",
    "k_weight",
    "k_weight_params",
    "true_peak",
    "true_peak_db",
]
