"""Microbench: fused spatial self-attention Pallas kernel vs the XLA path.

In-program slope methodology (BENCH_NOTES.md). Correctness on-chip first.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python dev/bench_fused_spatial.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from dynamicscaler_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from dynamicscaler_tpu.models.attention import CrossAttention
from dynamicscaler_tpu.ops import fused_temporal

# microbatch-8 production rows: BF = 8 * 16
SHAPES = [
    ("L1", 128, 2560, 320, 5),
    ("L2", 128, 640, 640, 10),
    ("L3", 128, 160, 1280, 20),
]
K_LO, K_HI = 1, 3


def run_shape(name, B, N, C, heads):
    mod = CrossAttention(heads=heads, dim_head=C // heads, dtype=jnp.bfloat16)
    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    x = jax.random.normal(ks[0], (B, N, C), jnp.bfloat16)
    s = 1.0 + 0.05 * jax.random.normal(ks[1], (C,), jnp.float32)
    b = 0.05 * jax.random.normal(ks[2], (C,), jnp.float32)
    mats = [
        (jax.random.normal(k, (C, C), jnp.float32) / np.sqrt(C)) for k in ks[3:7]
    ]
    params = {
        "params": {
            "to_q": {"kernel": mats[0]},
            "to_k": {"kernel": mats[1]},
            "to_v": {"kernel": mats[2]},
            "to_out": {"kernel": mats[3], "bias": jnp.zeros((C,), jnp.float32)},
        }
    }

    def subblock(p, x):
        return mod.apply(p, x, ln=(s, b), add_residual=True)

    def chained(mode, K):
        def f(p, x):
            fused_temporal.set_mode(mode)  # read at trace time
            out = x
            for _ in range(K):
                out = subblock(p, out)
            return out.astype(jnp.float32).sum()

        return jax.jit(f)

    # correctness on-chip
    fused_temporal.set_mode("off")
    try:
        ref = jax.jit(subblock)(params, x)
        fused_temporal.set_mode("auto")
        got = jax.jit(subblock)(params, x)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
        print(f"[{name}] max abs err fused-vs-xla: {err:.4g}")
    except Exception as e:
        print(f"[{name}] correctness check failed: {type(e).__name__} {str(e)[:100]}")

    results = {}
    for mode in ("off", "auto"):
        try:
            ts = {}
            for K in (K_LO, K_HI):
                fn = chained(mode, K)
                float(fn(params, x)); float(fn(params, x))
                t0 = time.perf_counter()
                for _ in range(3):
                    float(fn(params, x))
                ts[K] = (time.perf_counter() - t0) / 3
            per_op = (ts[K_HI] - ts[K_LO]) / (K_HI - K_LO) * 1e3
            results[mode] = per_op
            print(f"[{name}] {mode:4s}: {per_op:.3f} ms/op")
        except Exception as e:
            print(f"[{name}] {mode} FAILED: {type(e).__name__} {str(e)[:100]}")
            results[mode] = float("nan")
    if results.get("off") and results.get("auto"):
        flops = 8 * B * N * C * C + 4 * B * N * N * C
        print(
            f"[{name}] speedup x{results['off']/results['auto']:.2f}; "
            f"kernel {flops/results['auto']/1e9:.0f} GFLOP/s vs xla "
            f"{flops/results['off']/1e9:.0f}"
        )


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform)
    for args in SHAPES:
        run_shape(*args)
