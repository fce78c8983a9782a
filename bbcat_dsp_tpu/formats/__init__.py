"""L1 — sample formats, conversion, dithering (ref: src/SoundFormatConversions.*,
src/SoundFormatRawConversions.*, src/genconversions.php)."""

from .sample_format import (
    SampleFormat,
    SAMPLE_FORMAT_COUNT,
    block_transfer_sanity_checks,
    get_bits_per_sample,
    get_bytes_per_sample,
    is_sample_float,
    is_sample_integer,
    sample_format_of,
)
from .dither import Ditherer, ShapedDitherer, TPDFDitherer
from . import host
from . import device
from .device import (
    convert,
    deinterleave,
    float_to_int32,
    int32_to_float,
    interleave,
    quantize,
    transfer_window,
)
from .host import transfer_samples, transfer_samples_linear, transfer_samples_typed

__all__ = [
    "SampleFormat",
    "SAMPLE_FORMAT_COUNT",
    "block_transfer_sanity_checks",
    "get_bits_per_sample",
    "get_bytes_per_sample",
    "is_sample_float",
    "is_sample_integer",
    "sample_format_of",
    "Ditherer",
    "ShapedDitherer",
    "TPDFDitherer",
    "host",
    "convert",
    "deinterleave",
    "float_to_int32",
    "int32_to_float",
    "interleave",
    "quantize",
    "transfer_window",
    "transfer_samples",
    "transfer_samples_linear",
    "transfer_samples_typed",
]
