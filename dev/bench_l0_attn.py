"""L0 (C=320, N=2560) spatial self-attention core shoot-out on TPU v5e.

flops_split.py puts the whole-transformer matmul floor at L0-spatial at
~20.3 ms/instance vs 29.58 measured (mega level) — the largest remaining
per-instance gap in the UNet. This bench isolates the self-attention
sub-block (LN -> QKV -> attend -> out-proj) at the real shape
[rows=128, N=2560, C=320, 5 heads x d=64] and compares:

  fused    : ops/fused_spatial.py full sub-block Pallas kernel (current)
  xla      : plain XLA (materializes [rows, 5, N, N] logits in HBM)
  flash    : XLA LN/projections + stock Pallas TPU flash attention core
             (jax.experimental.pallas.ops.tpu.flash_attention)

If flash wins, the integration point is ops/attention.py dispatch (keep
the fused projections, swap the core); if fused wins, the 9 ms gap is
softmax/VPU floor and goes in the BENCH_NOTES ceiling section.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python dev/bench_l0_attn.py
"""

import functools
import time

import jax
import jax.numpy as jnp

from dynamicscaler_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from jax.experimental.pallas.ops.tpu import flash_attention as fa

from dynamicscaler_tpu.ops import fused_spatial, fused_temporal

R, N, C, H, D = 128, 2560, 320, 5, 64


def slope(fn, *args, k_lo=1, k_hi=5):
    def chained(K):
        def f(x, *rest):
            out = x
            for _ in range(K):
                out = fn(out, *rest)
            return out.astype(jnp.float32).sum()
        return jax.jit(f)

    ts = {}
    for K in (k_lo, k_hi):
        g = chained(K)
        float(g(*args)); float(g(*args))
        t0 = time.perf_counter()
        for _ in range(3):
            float(g(*args))
        ts[K] = (time.perf_counter() - t0) / 3
    return (ts[k_hi] - ts[k_lo]) / (k_hi - k_lo) * 1e3


def make_params(key):
    ks = jax.random.split(key, 6)
    s = 0.02
    return dict(
        ln_scale=jnp.ones((C,), jnp.float32),
        ln_bias=jnp.zeros((C,), jnp.float32),
        wq=jax.random.normal(ks[0], (C, C), jnp.bfloat16) * s,
        wk=jax.random.normal(ks[1], (C, C), jnp.bfloat16) * s,
        wv=jax.random.normal(ks[2], (C, C), jnp.bfloat16) * s,
        wo=jax.random.normal(ks[3], (C, C), jnp.bfloat16) * s,
        bo=jnp.zeros((C,), jnp.bfloat16),
    )


def ln(x, p):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * p["ln_scale"] + p["ln_bias"]).astype(x.dtype)


def heads(x):
    return x.reshape(R, N, H, D).transpose(0, 2, 1, 3)


def xla_attn(x, p):
    h = ln(x, p)
    q, k, v = heads(h @ p["wq"]), heads(h @ p["wk"]), heads(h @ p["wv"])
    logits = jnp.einsum("rhnd,rhmd->rhnm", q, k).astype(jnp.float32) * (D ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    o = jnp.einsum("rhnm,rhmd->rhnd", probs, v)
    o = o.transpose(0, 2, 1, 3).reshape(R, N, C)
    return x + o @ p["wo"] + p["bo"]


def flash_attn(x, p):
    h = ln(x, p)
    q, k, v = heads(h @ p["wq"]), heads(h @ p["wk"]), heads(h @ p["wv"])
    o = fa.flash_attention(q, k, v, sm_scale=D ** -0.5)
    o = o.astype(x.dtype).transpose(0, 2, 1, 3).reshape(R, N, C)
    return x + o @ p["wo"] + p["bo"]


def fused_attn(x, p):
    return fused_spatial.fused_ln_spatial_attention(
        x, p["ln_scale"], p["ln_bias"], p["wq"], p["wk"], p["wv"],
        p["wo"], p["bo"], heads=H, scale=D ** -0.5, eps=1e-5,
        add_residual=True,
    )


def main():
    fused_temporal.set_plan("off")
    x = jax.random.normal(jax.random.PRNGKey(0), (R, N, C), jnp.bfloat16)
    p = make_params(jax.random.PRNGKey(1))
    for name, fn in [("xla", xla_attn), ("flash", flash_attn),
                     ("fused", fused_attn)]:
        try:
            t = slope(fn, x, p)
            print(f"L0 self-attn {name:6s}: {t:7.2f} ms/instance")
        except Exception as e:
            print(f"L0 self-attn {name:6s}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
