"""Utilities: native bindings, profiling, checkpoint/resume."""

from . import native
from .native import native_available
from .profiling import Timer, named_scope, trace
from .checkpoint import load_state, save_state

__all__ = [
    "native",
    "native_available",
    "Timer",
    "named_scope",
    "trace",
    "load_state",
    "save_state",
]
