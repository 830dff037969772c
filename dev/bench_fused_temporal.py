"""Microbench: fused temporal-attention Pallas kernel vs the XLA path.

In-program slope methodology (BENCH_NOTES.md): per-call axon-tunnel floor
is ~25-30 ms, so chain K ops inside one jitted program and difference two
K values. Runs correctness on-chip first (bf16 tolerance).

Usage: PYTHONPATH=/root/repo python dev/bench_fused_temporal.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from dynamicscaler_tpu.utils.cache import enable_compilation_cache
from dynamicscaler_tpu.models.attention import CrossAttention
from dynamicscaler_tpu.ops import fused_temporal

enable_compilation_cache()

# (rows for CFG-packed B=16 window batch, F, C, heads)
SHAPES = [
    ("L1", 16 * 40 * 64, 16, 320, 5),
    ("L2", 16 * 20 * 32, 16, 640, 10),
]
K_LO, K_HI = 2, 10


def make_inputs(R, F, C, key):
    ks = jax.random.split(key, 7)
    x = jax.random.normal(ks[0], (R, F, C), jnp.bfloat16)
    s = 1.0 + 0.05 * jax.random.normal(ks[1], (C,), jnp.float32)
    b = 0.05 * jax.random.normal(ks[2], (C,), jnp.float32)
    mats = [
        (jax.random.normal(k, (C, C), jnp.float32) / np.sqrt(C)).astype(jnp.float32)
        for k in ks[3:7]
    ]
    bo = jnp.zeros((C,), jnp.float32)
    return x, s, b, mats, bo


def run_shape(name, R, F, C, heads):
    mod = CrossAttention(heads=heads, dim_head=C // heads, dtype=jnp.bfloat16)
    x, s, b, mats, bo = make_inputs(R, F, C, jax.random.PRNGKey(0))
    params = {
        "params": {
            "to_q": {"kernel": mats[0]},
            "to_k": {"kernel": mats[1]},
            "to_v": {"kernel": mats[2]},
            "to_out": {"kernel": mats[3], "bias": bo},
        }
    }

    def subblock(x):
        return mod.apply(params, x, ln=(s, b), add_residual=True)

    def chained(mode, K):
        def f(x):
            fused_temporal.set_mode(mode)  # read at trace time
            out = x
            for _ in range(K):
                out = subblock(out)
            return out.astype(jnp.float32).sum()

        return jax.jit(f)

    # correctness on-chip
    fused_temporal.set_mode("off")
    ref = jax.jit(subblock)(x)
    fused_temporal.set_mode("auto")
    got = jax.jit(subblock)(x)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
    ref_mag = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
    print(f"[{name}] max abs err fused-vs-xla: {err:.4g} (ref max {ref_mag:.3g})")

    results = {}
    for mode in ("off", "auto"):
        ts = {}
        for K in (K_LO, K_HI):
            fn = chained(mode, K)
            float(fn(x))  # compile+warm
            float(fn(x))
            t0 = time.perf_counter()
            for _ in range(3):
                float(fn(x))
            ts[K] = (time.perf_counter() - t0) / 3
        per_op = (ts[K_HI] - ts[K_LO]) / (K_HI - K_LO) * 1e3
        results[mode] = per_op
        print(f"[{name}] {mode:4s}: {per_op:.3f} ms/op  (K2={ts[K_LO]*1e3:.1f}ms K10={ts[K_HI]*1e3:.1f}ms)")
    speedup = results["off"] / results["auto"]
    flops = 8 * R * F * C * C
    print(
        f"[{name}] speedup x{speedup:.2f}; kernel {flops/results['auto']/1e9:.0f} GFLOP/s "
        f"vs xla {flops/results['off']/1e9:.0f} (projection flops only)"
    )


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform)
    for args in SHAPES:
        run_shape(*args)
