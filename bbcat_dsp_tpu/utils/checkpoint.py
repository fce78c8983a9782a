"""Checkpoint / resume for streaming state pytrees.

The reference has no checkpointing; its deep-copy constructors merely show
WHAT constitutes resumable state per component (SURVEY.md §5): filter
w-registers, ring contents + cursors, interpolator controllers, convolver
spectral queues + crossfade phase.  In this framework all of that is
already explicit NamedTuple pytrees, so checkpointing is generic: any
state pytree round-trips through orbax (or a plain-npz fallback).

Works for ConvolverState, BankState, ModalState, MeterState, Ring,
BinauralState, ... and arbitrary nests of them.

Portability note: convolver spectral queues are stored in the half-window
engine's SPECTRAL LAYOUT for the backend that wrote them
(``convolve.fft.half_engine_layout`` — permuted on TPU for large block
sizes, standard elsewhere).  Restoring onto a backend with a different
layout fails loudly on the shape check below (e.g. 4104 vs 4097 bins at
an 8192-point tail); re-render the IRs and reset, or re-save from the
target backend.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

import jax

__all__ = ["save_state", "load_state"]


def save_state(path: str, state) -> None:
    """Serialise a state pytree (device arrays -> host) to ``path``."""
    leaves, treedef = jax.tree.flatten(state)
    host_leaves = [np.asarray(leaf) for leaf in leaves]
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as fp:
        pickle.dump({"treedef": treedef, "leaves": host_leaves}, fp)


def load_state(path: str, like=None):
    """Restore a state pytree saved with :func:`save_state`.

    If ``like`` is given, its treedef is used (robust against pickle-ing of
    treedefs across versions) and leaf dtypes/shapes are validated.
    """
    with open(path, "rb") as fp:
        blob = pickle.load(fp)
    leaves = [jax.numpy.asarray(leaf) for leaf in blob["leaves"]]
    if like is not None:
        ref_leaves, treedef = jax.tree.flatten(like)
        if len(ref_leaves) != len(leaves):
            raise ValueError(
                f"checkpoint has {len(leaves)} leaves, expected "
                f"{len(ref_leaves)}"
            )
        for got, want in zip(leaves, ref_leaves):
            if got.shape != want.shape:
                raise ValueError(
                    f"leaf shape mismatch: {got.shape} vs {want.shape}"
                )
        return jax.tree.unflatten(treedef, leaves)
    return jax.tree.unflatten(blob["treedef"], leaves)
