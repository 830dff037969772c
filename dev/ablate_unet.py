"""Ablation: full-size UNet forward time by component (in-program slope).

Chains K forwards inside one jitted program (K=1 vs K=3) to cancel the
axon per-call floor. B=8 (CFG-packed window batch 4x2) at the native
40x64x16 window latent, matching bench.py.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python dev/ablate_unet.py [variant...]
Variants: full full_nofused no_tattn no_tconv convs_only
          no_k_temporal no_k_spatial no_k_cross no_k_ff no_k_block
          no_k_wrap (disable one fused-kernel class, everything else on;
          block = whole-transformer-block kernels, wrap = GN+proj_in /
          proj_out+residual wrapper kernels)
"""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

from dynamicscaler_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from dynamicscaler_tpu.config import videocrafter_i2v
from dynamicscaler_tpu.models.unet3d import UNet3D
from dynamicscaler_tpu.ops import fused_temporal

import os

# DSCALER_ABLATE_B overrides the batch (e.g. 16: compiles fine offline at
# 4.8GB temp — round-2's remote B=16 compile failure was tunnel flakiness)
B = int(os.environ.get("DSCALER_ABLATE_B", "8"))
FRAMES, H, W = 16, 40, 64
K_LO, K_HI = 1, 3


def variant_cfg(name):
    cfg = videocrafter_i2v(dtype="bfloat16").unet
    if name in ("full", "full_nofused", "k_gnsilu_unet") or name.startswith("no_k_"):
        return cfg
    if name == "no_tattn":
        return dataclasses.replace(cfg, temporal_attention=False)
    if name == "no_tconv":
        return dataclasses.replace(cfg, temporal_conv=False)
    if name == "convs_only":
        return dataclasses.replace(
            cfg, temporal_attention=False, attention_resolutions=()
        )
    raise SystemExit(f"unknown variant {name}")


def measure(name):
    from dynamicscaler_tpu.ops import fused_twrap

    fused_temporal.set_mode("off" if name == "full_nofused" else "auto")
    # no_k_<kind>: full model with ONE fused-kernel class disabled
    # (kind in temporal/spatial/cross/ff) — attributes time per kernel.
    # k_gnsilu_unet: re-enable the gn_silu kernel at the (demoted) unet
    # site to re-check the measured regression after dispatch changes.
    fused_temporal._DISABLED = (
        frozenset([name[5:]]) if name.startswith("no_k_") else frozenset()
    )
    fused_twrap.set_gnsilu_sites(
        "unet,vae" if name == "k_gnsilu_unet"
        else os.environ.get("DSCALER_GNSILU_SITES", "vae")
    )
    ucfg = variant_cfg(name)
    unet = UNet3D(ucfg, dtype=jnp.bfloat16)
    L = ucfg.text_context_len + 16
    x = jax.random.normal(jax.random.PRNGKey(0), (B, FRAMES, H, W, ucfg.in_channels), jnp.bfloat16)
    t = jnp.full((B,), 500, jnp.int32)
    ctx = jnp.zeros((B, L, ucfg.context_dim), jnp.bfloat16)
    shapes = jax.eval_shape(lambda: unet.init(jax.random.PRNGKey(0), x[:1, :2], t[:1], ctx[:1], 16))
    params = jax.tree.map(lambda s: jnp.full(s.shape, 0.01, jnp.bfloat16), shapes)

    def chained(K):
        def f(p, x):  # params as an ARG — closing over them captures 2.9GB
            out = x    # of constants into the lowered program (hangs the
            for _ in range(K):  # remote tunnel)
                out = unet.apply(p, out, t, ctx, 16)
            return out.astype(jnp.float32).sum()
        return jax.jit(f)

    ts = {}
    for K in (K_LO, K_HI):
        fn = chained(K)
        float(fn(params, x)); float(fn(params, x))
        t0 = time.perf_counter()
        for _ in range(3):
            float(fn(params, x))
        ts[K] = (time.perf_counter() - t0) / 3
    per_fwd = (ts[K_HI] - ts[K_LO]) / (K_HI - K_LO) * 1e3

    try:
        fl = float(
            jax.jit(lambda p, x: unet.apply(p, x, t, ctx, 16))
            .lower(params, x).compile().cost_analysis()["flops"]
        )
    except Exception:
        fl = float("nan")
    # per_fwd is in ms: FLOP / (ms/1e3) / 1e9 = fl / per_fwd / 1e6 GFLOP/s
    print(f"{name:14s}: {per_fwd:7.1f} ms/fwd  {fl/1e12:6.1f} TF  {fl/per_fwd/1e6:6.0f} GFLOP/s")
    return per_fwd, fl


def _head_commit():
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        return subprocess.run(
            ["git", "-C", root, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or None
    except Exception:
        return None


_COMMIT = _head_commit()


def record(results):
    """Merge measurements into results/ablate_latest.json so bench.py can
    compute pct-of-speed-of-light (convs_only achieved GFLOP/s is the
    measured ceiling; VERDICT r3 #4). Accumulates across invocations at the
    same commit; a new commit resets the file."""
    import json

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "results", "ablate_latest.json")
    commit = _COMMIT  # captured at process start — a commit landing while
    # a long ablation runs must not relabel numbers measured at older code
    rec = {"commit": commit, "batch": B, "variants": {}}
    try:
        with open(path) as f:
            prev = json.load(f)
        if prev.get("commit") == commit and prev.get("batch") == B:
            rec = prev
    except Exception:
        pass
    for name, (ms, fl) in results.items():
        rec["variants"][name] = {
            "ms_per_fwd": round(ms, 1),
            "tflops": round(fl / 1e12, 2) if fl == fl else None,
            # ms is milliseconds: fl / (ms/1e3) / 1e9 == fl / ms / 1e6
            "gflops_per_sec": round(fl / ms / 1e6, 1) if fl == fl else None,
        }
    rec["measured_at"] = time.strftime("%Y-%m-%d %H:%M:%S")
    rec["measured_at_unix"] = time.time()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(rec, f, indent=2)
    print(f"recorded -> {path}")


if __name__ == "__main__":
    names = sys.argv[1:] or ["full", "full_nofused", "no_tattn", "no_tconv", "convs_only"]
    out = {}
    for n in names:
        out[n] = measure(n)
        record(out)  # write after EVERY variant — a tunnel hang can't lose
        # the ones already measured
