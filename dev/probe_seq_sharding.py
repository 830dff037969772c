"""Probe: does the seq-sharded planar step all-gather the full latent?

Lowers _window_step on a (data=4, seq=2) CPU mesh and scans the optimized
HLO for collectives whose result is as large as the full latent.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  PYTHONPATH=/root/repo python dev/probe_seq_sharding.py
"""

import re

import numpy as np
import jax
import jax.numpy as jnp

from dynamicscaler_tpu.models.lvdm import LatentVideoDiffusion, tiny_test_config
from dynamicscaler_tpu.utils.tokenizer import HashTokenizer
from dynamicscaler_tpu.parallel.mesh import make_mesh, replicate
from dynamicscaler_tpu.pipelines.planar import PlanarShiftWindowEngine, StepPlan
from dynamicscaler_tpu.ops.ddim import make_ddim_schedule


def main():
    model = LatentVideoDiffusion.init_random(
        tiny_test_config(img_attention=False), jax.random.PRNGKey(0),
        tokenizer=HashTokenizer(512),
    )
    mesh = make_mesh(n_data=4, n_seq=2)
    params = replicate(model.params, mesh)
    sched = make_ddim_schedule(8, 1000, linear_start=0.00085, linear_end=0.012)

    F, H, W, C = 4, 16, 64, 4
    sizes = (4, 16, 32)
    engine = PlanarShiftWindowEngine(
        model, sched, sizes, guidance_scale=7.5, fps=16, overlap_mode="last",
        mesh=mesh,
    )
    # 4 windows sliding over W (ring)
    origins = np.asarray([[0, 0, w0] for w0 in (0, 16, 32, 48)], np.int32)
    N = len(origins)
    ctx = jnp.zeros((N, 77, model.config.unet.context_dim))
    uctx = jnp.zeros((1, 77, model.config.unet.context_dim))
    latent = jnp.zeros((1, F, H, W, C))
    denoised = jnp.zeros_like(latent)
    em = jnp.zeros((N, *sizes, 1))

    lowered = engine._step_fn.lower(
        params, sched, latent, denoised, jnp.asarray(origins), em,
        ctx, uctx, jnp.int32(500), jnp.int32(3), jnp.asarray(0.5),
        jnp.asarray(0.5), jax.random.PRNGKey(0),

    )
    compiled = lowered.compile()
    hlo = compiled.as_text()

    full_latent_elems = F * H * W * C
    bad = []
    for line in hlo.splitlines():
        if "all-gather" in line or "all-reduce" in line or "all-to-all" in line:
            m = re.search(r"(f32|bf16|f16)\[([\d,]+)\]", line)
            if not m:
                continue
            dims = [int(d) for d in m.group(2).split(",")]
            elems = int(np.prod(dims))
            tag = "FULL-LATENT" if elems >= full_latent_elems else "small"
            if elems >= full_latent_elems:
                bad.append(line.strip()[:200])
            print(f"[{tag:11s}] {int(elems):8d} elems  {line.strip()[:140]}")
    print()
    print("full-latent-sized collectives:", len(bad))
    # also show per-device shard shape of the output latent
    out_shardings = compiled.output_shardings
    print("output shardings:", out_shardings)


if __name__ == "__main__":
    main()
