"""FilterManager: named biquad filter configurations applied to channels.

The reference's FilterManager source is documented-but-absent
(ref: README:53-54, "manager class for biquad filters"; SURVEY.md §2.2).
Built from spec: a registry of named filter-cascade configurations
(JSON-loadable, matching the reference stack's ENABLE_JSON convention,
ref: README:166) that can be assigned to channels of a stream and applied
as one batched device pass.

Channels sharing a configuration are processed as one vmapped batch; the
full multi-config apply is a single jitted call (configs stacked on a
leading axis, channels gathered per config).
"""

from __future__ import annotations

import json
from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .biquad import FilterType, biquad_coeffs, cascade_response
from .iir import cascade_apply

__all__ = ["FilterManager"]


class FilterManager:
    """Registry of named filter cascades + channel assignment + batch apply."""

    def __init__(self, fs: float = 48000.0, dtype=jnp.float32,
                 engine: str = "auto"):
        self.fs = fs
        self.dtype = dtype
        self.engine = engine
        self._configs: dict[str, np.ndarray] = {}
        self._assignment: dict[int, str] = {}
        self._states: dict[str, jax.Array] = {}

    # -- configuration registry ------------------------------------------
    def define(self, name: str, stages: Sequence) -> None:
        """Register a named cascade from ``(type, freq[, gain[, bandwidth]])``
        stage specs (or dicts with those keys)."""
        rows = []
        for spec in stages:
            if isinstance(spec, Mapping):
                ftype = spec["type"]
                if isinstance(ftype, str):
                    ftype = FilterType[ftype]
                rows.append(
                    biquad_coeffs(
                        ftype, spec["freq"], self.fs,
                        spec.get("gain", 0.0), spec.get("bandwidth", 1.0),
                    )
                )
            else:
                ftype, freq, *rest = spec
                gain = rest[0] if rest else 0.0
                bw = rest[1] if len(rest) > 1 else 1.0
                rows.append(biquad_coeffs(ftype, freq, self.fs, gain, bw))
        self._configs[name] = np.stack(rows)
        self._states.pop(name, None)

    def define_from_json(self, text: str) -> None:
        """Load ``{"name": {"fs": ..., "stages": [{...}, ...]}, ...}`` or a
        flat ``{"name": [stage, ...]}`` mapping."""
        data = json.loads(text)
        for name, cfg in data.items():
            stages = cfg["stages"] if isinstance(cfg, Mapping) else cfg
            self.define(name, stages)

    def names(self) -> list[str]:
        return sorted(self._configs)

    def response(self, name: str, f) -> np.ndarray:
        return cascade_response(self._configs[name], f, self.fs)

    # -- channel assignment ----------------------------------------------
    def assign(self, channel: int, name: str) -> None:
        if name not in self._configs:
            raise KeyError(f"unknown filter config {name!r}")
        self._assignment[channel] = name
        self._states.pop(name, None)  # channel set changed -> reset state

    def assign_range(self, channels: Sequence[int], name: str) -> None:
        for c in channels:
            self.assign(c, name)

    # -- processing -------------------------------------------------------
    def process(self, x: jax.Array) -> jax.Array:
        """Apply each channel's assigned cascade to ``x[C, T]``.

        Unassigned channels pass through untouched.  Grouped per config so
        each config is one batched cascade over its channels.
        """
        y = x
        groups: dict[str, list[int]] = {}
        for ch, name in self._assignment.items():
            if ch < x.shape[0]:
                groups.setdefault(name, []).append(ch)
        for name, chans in sorted(groups.items()):
            chans = sorted(chans)
            # float64 HOST coefficients: the modal engine factors poles on
            # the host, and a prior float32 cast would lose ~30 dB through
            # discriminant cancellation for near-real-axis pole pairs
            coeffs = self._configs[name][:, None, :]
            st = self._states.get(name)
            sub = y[jnp.asarray(chans)]
            out, st = cascade_apply(
                sub, coeffs, st, engine=self.engine
            )
            self._states[name] = st
            y = y.at[jnp.asarray(chans)].set(out)
        return y

    def reset(self) -> None:
        self._states.clear()
