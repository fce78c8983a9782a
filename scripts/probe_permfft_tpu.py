"""Hardware probe: do the perm-FFT Pallas kernels build + run on the real TPU?

Round-2 A/B found every PALLAS_PERMFFT variant failed to build on v5e:
scoped-VMEM OOM (20.93 MB vs the 16 MB limit) at rt=64, n1=1024, the exact
config-#5 tail shapes (rows=14336, n=8192).  The kernels now bound rt to 32
at that size; this probe compiles + runs both directions at those shapes,
checks accuracy vs the XLA permuted formulation, and times a steady-state
call of each.

    python scripts/probe_permfft_tpu.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    print(jax.devices(), flush=True)

    from bbcat_dsp_tpu.convolve import fft as _fft
    from bbcat_dsp_tpu.ops.pallas.perm_fft import (
        perm_irfft_tail_pallas, perm_rfft_half_pallas)

    rng = np.random.default_rng(0)
    rows, r, n1 = 14336, 8, 1024
    n = r * n1
    x = jnp.asarray(rng.standard_normal((rows, r // 2, n1)).astype(np.float32))

    t0 = time.time()
    s = perm_rfft_half_pallas(x, n)
    s.block_until_ready()
    print(f"fwd compile+run OK in {time.time()-t0:.1f}s shape={s.shape}",
          flush=True)

    # accuracy vs the XLA permuted formulation (returns re/im PLANES
    # [2, rows, r*n1h1], f32 — same convention as the kernel output)
    xh = jnp.asarray(np.asarray(x).reshape(rows, n // 2))
    ref = np.asarray(_fft._perm_rfft_half(xh, n, prec=_fft._PREC))
    got = np.asarray(s).reshape(2, rows, -1)
    err = np.abs(got - ref).max()
    den = np.abs(ref).max()
    print(f"fwd max abs err vs XLA perm: {err:.3e} (den {den:.3e})", flush=True)

    t0 = time.time()
    y = perm_irfft_tail_pallas(s, n)
    y.block_until_ready()
    print(f"inv compile+run OK in {time.time()-t0:.1f}s shape={y.shape}",
          flush=True)
    yref = np.asarray(
        _fft._perm_irfft_tail(jnp.asarray(ref), n, prec=_fft._PREC))
    yerr = np.abs(np.asarray(y).reshape(rows, -1) - yref).max()
    print(f"inv max abs err vs XLA perm: {yerr:.3e}", flush=True)

    # steady-state timing (already compiled)
    for name, fn, arg in (("fwd", lambda a: perm_rfft_half_pallas(a, n), x),
                          ("inv", lambda a: perm_irfft_tail_pallas(a, n), s)):
        fn(arg).block_until_ready()
        t0 = time.time()
        for _ in range(10):
            out = fn(arg)
        out.block_until_ready()
        dt = (time.time() - t0) / 10
        print(f"{name}: {dt*1e3:.2f} ms/call ({rows} rows, n={n})", flush=True)

    ok = err < 2e-2 * den and yerr < 1e-4
    print("PROBE", "PASS" if ok else "FAIL", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
