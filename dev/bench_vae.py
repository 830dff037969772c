"""Time VAE decode on TPU with the gn_silu Pallas kernel on vs off.

Decides the DSCALER_GNSILU_SITES "vae" default from data (the unet site is
already measured-off, see ops/fused_twrap._GNSILU_SITES). Decode of one
40x64 latent window -> 320x512 frames, 16 frames chained through vmap like
pipelines/tiled_vae does, slope-timed (K=1 vs K=2 chained decodes) to
cancel the axon per-call floor.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python dev/bench_vae.py
"""

import time

import jax
import jax.numpy as jnp

from dynamicscaler_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from dynamicscaler_tpu.config import videocrafter_i2v
from dynamicscaler_tpu.models.vae import AutoencoderKL
from dynamicscaler_tpu.ops import fused_twrap

F, H, W = 16, 40, 64


def measure(sites: str) -> float:
    fused_twrap.set_gnsilu_sites(sites)
    cfg = videocrafter_i2v(dtype="bfloat16").vae
    vae = AutoencoderKL(cfg, dtype=jnp.bfloat16)
    z = jax.random.normal(jax.random.PRNGKey(0), (F, H, W, cfg.z_channels), jnp.bfloat16)
    shapes = jax.eval_shape(lambda: vae.init(jax.random.PRNGKey(0), z[:1], method=vae.decode))
    params = jax.tree.map(lambda s: jnp.full(s.shape, 0.01, jnp.bfloat16), shapes)

    def chained(K):
        def f(p, z):
            out = z
            for _ in range(K):
                frames = vae.apply(p, out, method=vae.decode)
                # feed a latent-shaped reduction back so K decodes truly
                # chain; tiny (not zero) scale so XLA can't fold the
                # dependency away (frames are RGB-3, z is 4-channel —
                # keepdims mean broadcasts over the channel mismatch)
                fb = frames[:, ::8, ::8, :].astype(out.dtype)
                out = out + fb.mean(-1, keepdims=True) * jnp.asarray(1e-3, out.dtype)
            return frames.astype(jnp.float32).sum()
        return jax.jit(f)

    ts = {}
    for K in (1, 2):
        fn = chained(K)
        float(fn(params, z)); float(fn(params, z))
        t0 = time.perf_counter()
        for _ in range(3):
            float(fn(params, z))
        ts[K] = (time.perf_counter() - t0) / 3
    per_decode = (ts[2] - ts[1]) * 1e3
    print(f"sites={sites or '(none)':9s}: {per_decode:7.1f} ms / 16-frame window decode")
    return per_decode


if __name__ == "__main__":
    import json
    import os
    import subprocess

    on = measure("vae")
    off = measure("")
    verdict = "KEEP kernel (vae)" if on <= off else "DEMOTE vae site too"
    print(f"kernel-on {on:.1f} ms vs off {off:.1f} ms -> {verdict}")
    # durable artifact (VERDICT r4: measurement inputs must survive the
    # session) — read by nothing programmatically, cited by BENCH_NOTES
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        commit = subprocess.run(
            ["git", "-C", root, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or None
    except Exception:
        commit = None
    os.makedirs(os.path.join(root, "results"), exist_ok=True)
    with open(os.path.join(root, "results", "vae_latest.json"), "w") as f:
        json.dump(
            {
                "ms_per_window_decode": {"gnsilu_vae": round(on, 1),
                                         "gnsilu_off": round(off, 1)},
                "verdict": verdict,
                "method": "slope-timed K=1 vs K=2 chained 16-frame decodes",
                "commit": commit,
                "measured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
            },
            f,
            indent=2,
        )
