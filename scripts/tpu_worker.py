"""Persistent TPU session: executes python snippets from a file queue.

Amortizes the 100-300 s backend init across many experiments (the relay
makes fresh-process iteration impractical).  Protocol:

  echo '<python>' > /tmp/tpuq/in/007.py     # queued
  # worker execs it in one persistent namespace, writes stdout+traceback
  # to /tmp/tpuq/out/007.log (atomically via .tmp rename)

    python scripts/tpu_worker.py  # blocks; kill by exact PID when done
"""

from __future__ import annotations

import io
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

QDIR = os.environ.get("BBCAT_TPUQ_DIR", "/tmp/tpuq")


def _secure_qdir() -> None:
    """The worker EXECS whatever lands in the queue, so the queue dir must
    be owned by us and not writable by others (a world-writable fixed path
    on a shared host would let any local user run code as this user)."""
    os.makedirs(QDIR, mode=0o700, exist_ok=True)
    st = os.stat(QDIR)
    if st.st_uid != os.getuid() or (st.st_mode & 0o022):
        raise SystemExit(
            f"refusing to poll {QDIR}: owned by uid {st.st_uid} with mode "
            f"{oct(st.st_mode & 0o777)} (need: owned by uid {os.getuid()}, "
            "not group/world-writable).  Set BBCAT_TPUQ_DIR to a private "
            "directory."
        )


def main() -> None:
    _secure_qdir()
    os.makedirs(f"{QDIR}/in", exist_ok=True)
    os.makedirs(f"{QDIR}/out", exist_ok=True)
    with open(f"{QDIR}/pid", "w") as fp:
        fp.write(str(os.getpid()))

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp
    import numpy as np

    t0 = time.perf_counter()
    float(jnp.sum(jnp.ones((8, 128)) * 2))
    ns: dict = {
        "jax": jax, "jnp": jnp, "np": np, "time": time,
    }
    with open(f"{QDIR}/ready", "w") as fp:
        fp.write(f"init {time.perf_counter() - t0:.1f}s "
                 f"device={jax.devices()[0]}\n")

    done = set()
    while True:
        jobs = sorted(
            f for f in os.listdir(f"{QDIR}/in")
            if f.endswith(".py") and f not in done
        )
        for job in jobs:
            done.add(job)
            src = open(f"{QDIR}/in/{job}").read()
            buf = io.StringIO()
            old = sys.stdout
            sys.stdout = buf
            t0 = time.perf_counter()
            try:
                exec(compile(src, job, "exec"), ns)
                status = "ok"
            except Exception:
                traceback.print_exc(file=buf)
                status = "error"
            finally:
                sys.stdout = old
            out = f"{QDIR}/out/{job[:-3]}.log"
            with open(out + ".tmp", "w") as fp:
                fp.write(buf.getvalue())
                fp.write(f"\n[{status} {time.perf_counter() - t0:.1f}s]\n")
            os.replace(out + ".tmp", out)
        time.sleep(0.5)


if __name__ == "__main__":
    main()
