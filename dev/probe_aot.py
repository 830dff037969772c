"""Probe: where does the axon first-call program cost land?

Times, for a freshly-built big program: trace+lower, .compile(), first
execute, second execute — and whether a compile() on thread B overlaps a
running execution from thread A. Decides the AOT warm-start design for
gen_pano_360 (VERDICT r2 #2).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python dev/probe_aot.py
"""

import threading
import time

import jax
import jax.numpy as jnp

from dynamicscaler_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from dynamicscaler_tpu.config import videocrafter_i2v
from dynamicscaler_tpu.models.unet3d import UNet3D

cfg = videocrafter_i2v(dtype="bfloat16")
unet = UNet3D(cfg.unet, dtype=jnp.bfloat16)
L = cfg.unet.text_context_len + cfg.resampler.num_queries


def make_prog(B, F, H, W, K):
    x = jnp.zeros((B, F, H, W, cfg.unet.in_channels), jnp.bfloat16)
    t = jnp.full((B,), 500, jnp.int32)
    ctx = jnp.zeros((B, L, cfg.unet.context_dim), jnp.bfloat16)
    shapes = jax.eval_shape(lambda: unet.init(jax.random.PRNGKey(0), x[:1, :2], t[:1], ctx[:1], 16))
    params = jax.tree.map(lambda s: jnp.full(s.shape, 0.01, jnp.bfloat16), shapes)

    def f(p, x):
        out = x
        for _ in range(K):
            out = unet.apply(p, out, t, ctx, 16)
        return out.astype(jnp.float32).sum()

    return jax.jit(f), params, x


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"{label}: {time.perf_counter() - t0:.1f}s", flush=True)
    return out


# program A: the 'stage' already running (distinct K -> distinct program)
fa, pa, xa = make_prog(8, 16, 40, 64, 2)
timed("A trace+compile", lambda: fa.lower(pa, xa).compile())
timed("A first exec", lambda: float(fa(pa, xa)))
timed("A second exec", lambda: float(fa(pa, xa)))

# program B: compile/load while A executes in a loop on another thread
fb, pb, xb = make_prog(8, 16, 40, 64, 3)

stop = {"v": False}


def a_loop():
    n = 0
    while not stop["v"]:
        float(fa(pa, xa))
        n += 1
    print(f"A ran {n} iters while B compiled", flush=True)


th = threading.Thread(target=a_loop)
th.start()
t0 = time.perf_counter()
compiled_b = fb.lower(pb, xb).compile()
t_compile = time.perf_counter() - t0
stop["v"] = True
th.join()
print(f"B compile (A busy): {t_compile:.1f}s", flush=True)
timed("B first exec", lambda: float(fb(pb, xb)))
timed("B second exec", lambda: float(fb(pb, xb)))
