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

__all__ = ["default_layout", "device_put_row_major",
           "committed_off_row_major", "row_major_commit_broken"]

# set True the first time the backend refuses a row-major commit (see
# device_put_row_major); the layout-pinned render paths check it and go
# straight to their auto-layout fallbacks instead of paying a refused
# pinned call + re-commit + second refusal on EVERY invocation
row_major_commit_broken = False


def committed_off_row_major(tree) -> bool:
    """True when any array leaf in ``tree`` sits on device in a
    non-row-major layout — the condition under which a row-major-pinned
    jit may refuse the call outright (jax raises before launch rather
    than relayouting).  Measured on the v5e: whether jax relayouts or
    raises for an UNCOMMITTED off-layout arg is context-dependent (a
    fresh process relayouts; after other programs have warmed the
    executable cache the same call raises), so the precheck flags any
    concrete off-row-major layout, committed or not — the explicit
    re-commit costs the same one-time copy the silent relayout would.
    Conservatively False when the layout metadata API is unavailable."""
    for leaf in jax.tree.leaves(tree):
        try:
            if not isinstance(leaf, jax.Array):
                continue
            if (leaf.format.layout.major_to_minor
                    != tuple(range(leaf.ndim))):
                return True
        except Exception:  # pragma: no cover - old jax / exotic arrays
            continue
    return False


def default_layout(x: jax.Array) -> jax.Array:
    """Constrain ``x`` to the default row-major device layout (no-op on
    failure or for non-array leaves)."""
    try:
        from jax.experimental.layout import Layout, with_layout_constraint

        return with_layout_constraint(x, Layout(tuple(range(x.ndim))))
    except Exception:  # pragma: no cover - older jax / exotic tracers
        return x


def device_put_row_major(x):
    """Commit a host array to the device in ROW-MAJOR layout.

    jax 0.9 commits plain ``jnp.asarray`` 4-D transfers on this TPU in a
    twisted default layout (measured: ``major_to_minor=(0, 1, 3, 2)``),
    while the layout-pinned render programs declare row-major entry
    layouts — so every call paid an input-relayout dispatch per IR
    spectra stack (~1.7 ms for the 540 MB pod pair, the last
    unattributed copies in the config-5 trace).  Committing row-major at
    CREATION makes the per-call relayout disappear.  Falls back to plain
    ``jnp.asarray`` off-TPU / multi-device / old jax."""
    import jax.numpy as jnp

    try:
        if jax.default_backend() != "tpu" or len(jax.devices()) != 1:
            raise ValueError
        from jax.experimental.layout import Format, Layout
        from jax.sharding import SingleDeviceSharding

        import numpy as np

        # device arrays relayout device-side; hosts arrays transfer once
        a = x if isinstance(x, jax.Array) else np.asarray(x)
        out = jax.device_put(
            a,
            Format(Layout(tuple(range(a.ndim))),
                   SingleDeviceSharding(jax.devices()[0])),
        )
        # VERIFY the commit: the backend can silently return a
        # twisted-layout array instead of honouring the request (observed
        # 2026-08-20 for [2,14,1024,4128] under co-tenant HBM pressure —
        # smaller shapes still committed fine).  A committed-but-twisted
        # array is the worst outcome: the layout-pinned programs refuse
        # it AND (measured) feeding it to the Pallas-kernel renders fails
        # with async InvalidArgument, while a plain UNCOMMITTED transfer
        # executes correctly.  Prefer correctness: fall back to asarray.
        try:
            if (out.format.layout.major_to_minor
                    != tuple(range(out.ndim))):
                import warnings

                global row_major_commit_broken
                row_major_commit_broken = True
                warnings.warn(
                    "device_put_row_major: backend returned layout %s for "
                    "shape %s instead of row-major; using an uncommitted "
                    "transfer (renders stay correct; per-call relayouts "
                    "may cost a few %% RTF)" %
                    (out.format.layout.major_to_minor, out.shape),
                    RuntimeWarning, stacklevel=2)
                return jnp.asarray(a)
        except Exception:
            pass
        return out
    except ValueError:  # non-TPU / multi-device: expected, stay quiet
        return jnp.asarray(x)
    except Exception as e:  # pragma: no cover - device-side failure
        # an on-TPU device_put failing is NOT expected — it leaves the
        # array off-layout and every pinned call degraded; say so instead
        # of silently returning the original (a silent version of this
        # cost a round-3 session ~8% RT before it was found)
        import warnings

        warnings.warn(
            "device_put_row_major failed on-device (%s: %s); returning "
            "the original array — pinned renders may refuse or relayout"
            % (type(e).__name__, e), RuntimeWarning, stacklevel=2)
        return jnp.asarray(x)
