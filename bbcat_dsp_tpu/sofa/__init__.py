"""SOFA (HRTF) file support (ref: README:77-78)."""

from .reader import SOFAFile, write_sofa

__all__ = ["SOFAFile", "write_sofa"]
