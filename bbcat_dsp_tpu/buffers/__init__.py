"""L2 — buffering: rings, delay lines, FIFOs, multilayer aggregation
(ref: src/RingBuffer.h, src/SoundDelayBuffer.*, src/MultilayerBuffer.h)."""

from .ring import Ring, ring_advance, ring_init, ring_read_delayed, ring_write
from .delay import SoundDelayBuffer, SoundRingBuffer
from .multilayer import MultilayerBuffer

__all__ = [
    "Ring",
    "ring_advance",
    "ring_init",
    "ring_read_delayed",
    "ring_write",
    "SoundDelayBuffer",
    "SoundRingBuffer",
    "MultilayerBuffer",
]
