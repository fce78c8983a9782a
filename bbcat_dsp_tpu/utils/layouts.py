"""Device-memory layout pinning for streaming-state pytrees.

jax 0.9 lets XLA choose ENTRY/EXIT layouts for jitted functions (auto
layouts).  For the convolver renders this backfired: layout assignment
propagated a DUS-fusion-preferred twisted layout ``{2,0,3,1:T(2,128)}`` to
the spectral-queue carry and the IR spectra parameters, while the Pallas
MAC custom call constrains its operands to the default row-major layout —
so every render paid THREE full-queue relayout copies (~940 MB each at the
pod config, ~0.33 ms/super-block; measured in the config-5 trace,
docs/PERFORMANCE.md "Pod-scale MAC").

:func:`default_layout` pins a value to row-major inside a jit so layout
assignment keeps the whole chain (param -> DUS -> custom call -> result)
in one layout.  No-op where the constraint API is unavailable or invalid
(e.g. under some tracers).
"""

from __future__ import annotations

import jax

__all__ = ["default_layout"]


def default_layout(x: jax.Array) -> jax.Array:
    """Constrain ``x`` to the default row-major device layout (no-op on
    failure or for non-array leaves)."""
    try:
        from jax.experimental.layout import Layout, with_layout_constraint

        return with_layout_constraint(x, Layout(tuple(range(x.ndim))))
    except Exception:  # pragma: no cover - older jax / exotic tracers
        return x
