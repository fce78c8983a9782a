"""The last untested combination (VERDICT r4 next #1): shard_map x dftmm
x PERM layout x COMPILED Mosaic kernels, on the real chip.

Every sharded test and dryrun stage runs the Pallas kernels in *interpret*
mode on the CPU mesh; every hardware run compiles Mosaic but outside
shard_map.  This script builds a 1-device mesh ON THE TPU and runs
``channel_sharded_nonuniform_render`` with the frozen pod-default specs and
kernels FORCED (compiled — ``_interpret()`` is False on TPU), asserting
>=110 dB against the unsharded pinned render of the same engine.

Writes BENCH_SHARDED_TPU.json.

    python scripts/sharded_compiled_tpu.py [--pod]

``--pod`` additionally runs the full config-#5 geometry (1024 ch x 64k
taps) through the same sharded-compiled path.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def _snr(ref: np.ndarray, got: np.ndarray) -> float:
    err = np.sum((ref.astype(np.float64) - got.astype(np.float64)) ** 2)
    sig = np.sum(ref.astype(np.float64) ** 2)
    return float(10.0 * np.log10(sig / err)) if err > 0 else float("inf")


def _stage(C: int, N: int, B: int, ratio: int, T_groups: int = 2) -> dict:
    """Sharded-compiled vs unsharded render at one geometry."""
    import jax
    import jax.numpy as jnp

    from bbcat_dsp_tpu.convolve import NonUniformConvolver
    from bbcat_dsp_tpu.convolve.fft import resolve_spectral_spec
    from bbcat_dsp_tpu.parallel import (
        channel_sharded_nonuniform_render,
        make_mesh,
        shard_channels,
    )

    B2 = B * ratio
    # frozen pod-default specs with every kernel family FORCED (mode "1"):
    # on TPU _interpret() is False, so these compile as Mosaic inside the
    # shard_map manual-lowering body — the exact program a pod executes
    sh = resolve_spectral_spec(2 * B, backend="dftmm",
                               probe=False)._replace(mac="1", fused_head="1")
    st = resolve_spectral_spec(2 * B2, backend="dftmm",
                               probe=False)._replace(permfft="1", mac="1")
    specs = (sh, st)

    rng = np.random.default_rng(0)
    irs = (rng.standard_normal((C, N))
           * np.exp(-np.arange(N) / (N / 8.0))).astype(np.float64)
    single = NonUniformConvolver(irs, block=B, ratio=ratio, spectral=specs)
    Pt = single.tail_parts
    T = T_groups * Pt * B2
    x = rng.standard_normal((C, T)).astype(np.float32)

    t0 = time.perf_counter()
    y_ref = np.asarray(single.process(jnp.asarray(x)))
    t_single = time.perf_counter() - t0

    mesh = make_mesh(1, "ch")   # 1 real TPU device
    sharded = NonUniformConvolver(irs, block=B, ratio=ratio, spectral=specs)
    render = channel_sharded_nonuniform_render(mesh, B, tail_slot0=0,
                                               specs=specs)
    xs = shard_channels(x, mesh)
    st_sh, y = render(sharded.state, sharded.H_head, sharded.H_tail, xs)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    st_sh, y2 = render(st_sh, sharded.H_head, sharded.H_tail, xs)
    jax.block_until_ready(y2)
    t_sharded = time.perf_counter() - t0
    snr = _snr(y_ref, np.asarray(y))
    assert snr >= 110.0, (
        f"sharded-compiled diverged from unsharded: {snr:.1f} dB < 110 dB"
    )
    return {
        "geometry": f"{C}ch x {N}-tap, B={B} ratio={ratio} Pt={Pt}",
        "layout": st.layout,
        "radix": st.radix,
        "kernels": "forced (compiled Mosaic under shard_map)",
        "sharded_vs_unsharded_snr_db": round(snr, 1) if np.isfinite(snr)
        else "inf",
        "wall_s_unsharded_warmrender": round(t_single, 3),
        "wall_s_sharded_repeat": round(t_sharded, 3),
        "audio_seconds": T / 48000.0,
    }


_STAGES = {
    "headline": dict(C=64, N=32768, B=512, ratio=8),
    "pod": dict(C=1024, N=65536, B=512, ratio=8, T_groups=1),
}


def _run_child(name: str):
    """One stage in its OWN process: a warm process accumulates device
    state that can poison a later big program (same failure family as
    bench_all.py's per-config isolation — async TPU InvalidArgument only
    in warm processes, standalone always passes)."""
    import subprocess

    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--only", name],
        capture_output=True, text=True, timeout=900)
    for ln in reversed(p.stdout.strip().splitlines()):
        try:
            return json.loads(ln)
        except ValueError:
            continue
    return {"stage": name,
            "error": "subprocess produced no JSON (rc=%d): %s"
            % (p.returncode, p.stderr[-300:])}


def main() -> int:
    argv = sys.argv[1:]
    if argv[:1] == ["--only"]:
        import jax

        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        assert jax.default_backend() == "tpu", (
            "this script proves the COMPILED-kernel combination; run on TPU"
        )
        print(json.dumps(_stage(**_STAGES[argv[1]])))
        return 0

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
    from bench_all import _provenance  # shared provenance stamp

    out = {"provenance": _provenance()}
    out["headline_geometry"] = _run_child("headline")
    print(json.dumps(out["headline_geometry"]))
    if "--pod" in argv:
        out["pod_geometry"] = _run_child("pod")
        print(json.dumps(out["pod_geometry"]))
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_SHARDED_TPU.json")
    with open(path, "w") as fp:
        json.dump(out, fp, indent=1)
    print("wrote", path)
    ok = all(
        "error" not in v for k, v in out.items() if k != "provenance"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
