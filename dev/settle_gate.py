"""Block until the axon server answers NEW compile RPCs promptly.

The server enters a post-ingest 'digestion' state (BENCH_NOTES round-5)
where new compile/ingest RPCs stall for minutes while executes keep
running. A warm gen_pano_360 started inside that window inherits a
260-1600s stall at its first tiny compile. This gate polls with a
fresh tiny program (new shape each attempt, so it is a genuinely new
compile) until one completes in under --fast seconds, then exits 0.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python dev/settle_gate.py [--fast 5] [--timeout 3600]
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", type=float, default=5.0)
    ap.add_argument("--timeout", type=float, default=3600.0)
    args = ap.parse_args()

    print(f"[settle] devices: {jax.devices()}", flush=True)
    deadline = time.time() + args.timeout
    n = 129  # vary the shape so each probe is a brand-new program
    while time.time() < deadline:
        x = jnp.ones((n, 128), jnp.bfloat16)
        t0 = time.perf_counter()
        float(jax.jit(lambda a: (a @ a.T).sum())(x))
        dt = time.perf_counter() - t0
        print(f"[settle] compile+exec ({n}x128): {dt:.1f}s", flush=True)
        if dt < args.fast:
            print("[settle] server responsive", flush=True)
            return 0
        n += 1
        time.sleep(10)
    print("[settle] timeout", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
