"""Utilities: native-library bindings, profiling helpers."""

from . import native
from .native import native_available

__all__ = ["native", "native_available"]
