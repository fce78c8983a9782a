"""Config-#5 head-radix A/B (round-5 experiment, VERDICT r4 next #3).

The fused head is compute-bound at the DIRECT half-window matmul's FLOPs
(~n^2/2 real MACs per direction at n = 1024).  A radix-r permuted head
trades that for ~2 n^2/r complex MACs — a real cut for r = 8 (n1 = 128)
— at the cost of the fused super-kernel (which only serves the std
layout), i.e. more HBM traffic on the unfused path.  Which effect wins
is an empirical question; this script measures it.

    python scripts/ab_head_radix.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

FS = 48000.0


def _measure(head_layout: str | None, radix_env: str | None):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    from bbcat_dsp_tpu.convolve import NonUniformConvolver
    from bbcat_dsp_tpu.convolve.fft import resolve_spectral_spec
    from bbcat_dsp_tpu.convolve.nonuniform import nonuniform_render_pinned

    rng = np.random.default_rng(0)
    C, N, B, ratio = 1024, 65536, 512, 8
    SB = B * ratio
    irs = (rng.standard_normal((C, N)) * np.exp(-np.arange(N) / 8000.0)
           ).astype(np.float32)
    if head_layout is None:
        spectral = None
        tag = "std (current default)"
    else:
        if radix_env:
            os.environ["BBCAT_DSP_PERM_RADIX"] = radix_env
        sh = resolve_spectral_spec(2 * B, backend="dftmm", probe=False,
                                   layout=head_layout)
        os.environ.pop("BBCAT_DSP_PERM_RADIX", None)
        st = resolve_spectral_spec(2 * SB, backend="dftmm", probe=False)
        spectral = (sh, st)
        tag = f"{sh.layout} radix={sh.radix}"
    conv = NonUniformConvolver(irs, block=B, ratio=ratio, spectral=spectral)
    T = SB * conv.tail_parts
    x = jnp.asarray(rng.standard_normal((C, T)).astype(np.float32))
    box = {"state": conv.state}

    def run():
        box["state"], y = nonuniform_render_pinned(
            box["state"], conv.H_head, conv.H_tail, x, B, tail_slot0=0,
            specs=conv.specs if spectral else None)
        return y

    run()  # compile

    def chain(n):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            last = None
            for _ in range(n):
                last = run()
            float(jnp.sum(last))
            best = min(best, time.perf_counter() - t0)
        return best

    for _ in range(4):
        t1, t2 = chain(1), chain(3)
        per = (t2 - t1) / 2
        if per > 0.2 * t1:
            break
    rtf = T / FS / per
    return {"head": tag, "rtf": round(rtf, 2)}


def main() -> int:
    import subprocess

    variants = [("std", []), ("perm8", ["perm", "8"]),
                ("perm4", ["perm", "4"])]
    if len(sys.argv) > 1 and sys.argv[1] == "--only":
        name = sys.argv[2]
        args = dict(variants)[name]
        r = _measure(*args) if args else _measure(None, None)
        print(json.dumps(r))
        return 0
    out = {}
    for name, _ in variants:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--only", name],
            capture_output=True, text=True, timeout=2900)
        r = None
        for ln in reversed(p.stdout.strip().splitlines()):
            try:
                r = json.loads(ln)
                break
            except ValueError:
                continue
        out[name] = r or {"error": p.stderr[-200:]}
        print(name, json.dumps(out[name]))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_AB_HEAD.json"), "w") as fp:
        json.dump(out, fp, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
