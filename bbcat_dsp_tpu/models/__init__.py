"""Composed stream-processing models (the framework's "model zoo" — the
reference is a primitives library, so the models are the BASELINE.json
pipeline configs made concrete)."""

from .binaural import BinauralRenderer, BinauralState, binaural_init, binaural_step
from .pipeline import EQDelayPipeline, MixdownPipeline
from .reverb import SchroederReverb

__all__ = [
    "BinauralRenderer",
    "BinauralState",
    "binaural_init",
    "binaural_step",
    "EQDelayPipeline",
    "MixdownPipeline",
    "SchroederReverb",
]
