"""Engine semantics gates.

``sequential`` overlap mode must equal a hand-rolled ordered window loop
built from the public ops (each window reading prior windows' writes —
the reference's exact semantics), and ``last`` mode must equal it when
windows don't overlap.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dynamicscaler_tpu.models.lvdm import LatentVideoDiffusion, tiny_test_config
from dynamicscaler_tpu.utils.tokenizer import HashTokenizer
from dynamicscaler_tpu.ops.ddim import ddim_step, re_noise
from dynamicscaler_tpu.ops.ring import get_ring_window, set_ring_window
from dynamicscaler_tpu.ops.blend import mix_with_mask
from dynamicscaler_tpu.pipelines.planar import PlanarShiftWindowEngine, StepPlan
from dynamicscaler_tpu.pipelines.t2v import make_schedule_for_model
from dynamicscaler_tpu.pipelines.conditioning import build_uncond_context


@pytest.fixture(scope="module")
def setup():
    model = LatentVideoDiffusion.init_random(
        tiny_test_config(img_attention=False), jax.random.PRNGKey(0),
        tokenizer=HashTokenizer(512),
    )
    sched = make_schedule_for_model(model, 4)
    ctx = model.encode_text(["w"])
    uncond = build_uncond_context(model, with_image=False)
    return model, sched, ctx, uncond


def manual_sequential(model, sched, latent, plan, uncond, key, sizes, guidance=7.5, fps=16):
    """Reference-ordered loop built from public ops only."""
    denoised = jnp.zeros_like(latent)
    for i, sp in enumerate(plan):
        step_key = jax.random.fold_in(key, i)
        mask_global = jnp.zeros_like(latent)
        for k in range(len(sp.origins)):
            origin = tuple(int(o) for o in sp.origins[k])
            win = get_ring_window(latent, origin, sizes)
            mask_win = get_ring_window(mask_global, origin, sizes)
            prev = win
            if sp.renoise_ratio is not None:
                noised = re_noise(
                    sched, win, sp.index - 1, sp.index,
                    key=jax.random.fold_in(step_key, k),
                )
                win = mix_with_mask(win, noised, mask_win, sp.renoise_ratio)
            x2 = jnp.concatenate([win, win], 0)
            cc = jnp.concatenate([sp.context[k : k + 1], uncond], 0)
            eps = model.apply_unet(x2, jnp.full((2,), sp.t), cc, fps)
            eps = eps[1:] + guidance * (eps[:1] - eps[1:])
            new, den_w = ddim_step(sched, win, eps, jnp.full((sizes[0],), sp.index))
            if sp.merge_prev_ratio is not None:
                new = mix_with_mask(new, prev, mask_win, sp.merge_prev_ratio)
            latent = set_ring_window(latent, new, origin)
            denoised = set_ring_window(denoised, den_w, origin)
            mask_global = set_ring_window(mask_global, jnp.ones_like(new), origin)
    return latent, denoised


def make_plan(sched, origins, ctx, steps=2, renoise=1.0, merge_prev=0.3):
    S = sched.num_ddim_steps
    plan = []
    for i in range(steps):
        last = i == steps - 1
        plan.append(
            StepPlan(
                t=int(sched.ddim_timesteps[S - 1 - i]),
                index=S - 1 - i,
                origins=np.asarray(origins, np.int32),
                context=jnp.broadcast_to(ctx, (len(origins),) + ctx.shape[1:]),
                earlier_mask=None,
                renoise_ratio=None if last else renoise,
                merge_prev_ratio=None if last else merge_prev,
            )
        )
    return plan


def test_sequential_mode_matches_manual_loop(setup):
    model, sched, ctx, uncond = setup
    sizes = (4, 8, 8)
    # overlapping + wrapping windows
    origins = [(0, 0, 0), (0, 0, 6), (0, 4, 12)]
    latent0 = jax.random.normal(jax.random.PRNGKey(5), (1, 4, 12, 16, 4))
    plan = make_plan(sched, origins, ctx)

    engine = PlanarShiftWindowEngine(model, sched, sizes, overlap_mode="sequential")
    lat_e, den_e = engine.run(latent0, plan, uncond, jax.random.PRNGKey(9))

    lat_m, den_m = manual_sequential(
        model, sched, latent0, plan, uncond, jax.random.PRNGKey(9), sizes
    )
    np.testing.assert_allclose(np.asarray(lat_e), np.asarray(lat_m), atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(den_e), np.asarray(den_m), atol=2e-4, rtol=1e-4)


def test_last_mode_equals_sequential_when_disjoint(setup):
    model, sched, ctx, uncond = setup
    sizes = (4, 8, 8)
    origins = [(0, 0, 0), (0, 0, 8), (0, 8, 0), (0, 8, 8)]  # tiling, no overlap
    latent0 = jax.random.normal(jax.random.PRNGKey(6), (1, 4, 16, 16, 4))
    plan = make_plan(sched, origins, ctx)

    outs = {}
    for mode in ("last", "sequential", "average"):
        engine = PlanarShiftWindowEngine(model, sched, sizes, overlap_mode=mode)
        # earlier_mask needed for 'last' blending path; zero masks = disjoint
        plan_m = [
            StepPlan(
                t=sp.t, index=sp.index, origins=sp.origins, context=sp.context,
                earlier_mask=np.zeros((len(sp.origins),) + (sizes[0], sizes[1], sizes[2], 1), np.float32),
                renoise_ratio=sp.renoise_ratio, merge_prev_ratio=sp.merge_prev_ratio,
            )
            for sp in plan
        ]
        outs[mode] = np.asarray(
            engine.run(latent0, plan_m, uncond, jax.random.PRNGKey(9))[1]
        )
    np.testing.assert_allclose(outs["last"], outs["sequential"], atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(outs["last"], outs["average"], atol=2e-4, rtol=1e-4)
