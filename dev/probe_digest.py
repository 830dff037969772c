"""Characterize the axon server's post-ingest 'digestion' stall.

Round-5 discovery: after progcache.prewarm() bursts ~15 executable ingests
(incl. three ~115MB step programs), the server stops answering NEW compile
RPCs for minutes (measured 260-680s, growing with accumulated server
state), while the client sits futex-idle. This probe answers:

  1. how long a tiny compile takes BEFORE any ingest (baseline),
  2. how long prewarm(block=True) takes client-side,
  3. whether EXECUTE RPCs of already-loaded programs still run during the
     digest window (probe A re-executes the baseline program every 2s),
  4. how long the first NEW compile after the burst stalls (probe B).

If (3) stays fast while (4) stalls, a warm gen_pano_360 can be made
stall-free by ensuring zero new compile RPCs after the prewarm burst.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python dev/probe_digest.py
"""

import threading
import time

import jax
import jax.numpy as jnp

from dynamicscaler_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from dynamicscaler_tpu.utils import progcache


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"[probe] {label}: {dt:.2f}s", flush=True)
    return out


def main():
    print("[probe] devices:", jax.devices(), flush=True)

    f = jax.jit(lambda a, b: (a @ a * b).sum())
    x = jnp.ones((512, 512), jnp.bfloat16)
    t("baseline tiny compile+exec", lambda: float(f(x, 1.0)))
    t("baseline re-exec", lambda: float(f(x, 2.0)))

    t("prewarm(block=True)", lambda: progcache.prewarm(block=True))

    stop = threading.Event()

    def exec_probe():
        i = 3.0
        while not stop.is_set():
            t0 = time.perf_counter()
            float(f(x, i))
            dt = time.perf_counter() - t0
            print(f"[probe] exec during digest: {dt:.2f}s", flush=True)
            i += 1
            stop.wait(2.0)

    th = threading.Thread(target=exec_probe, daemon=True)
    th.start()

    g = jax.jit(lambda a: (a * 2 + 1).sum())  # NEW program -> new compile
    t("first NEW compile after burst", lambda: float(g(x)))
    stop.set()
    th.join(timeout=5)
    t("tiny compile #2", lambda: float(jax.jit(lambda a: (a - 1).sum())(x)))


if __name__ == "__main__":
    main()
