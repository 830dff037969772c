"""Numerical regression fixtures: fixed-key tiny-model outputs must not
drift across refactors (catches accidental math changes; regenerate
deliberately with REGEN=1 when a change is intended)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dynamicscaler_tpu.models.lvdm import LatentVideoDiffusion, tiny_test_config
from dynamicscaler_tpu.utils.tokenizer import HashTokenizer
from dynamicscaler_tpu.pipelines import t2v
from dynamicscaler_tpu.ops.ddim import make_ddim_schedule, ddim_step

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "regression.npz")


def compute_outputs():
    model = LatentVideoDiffusion.init_random(
        tiny_test_config(img_attention=False), jax.random.PRNGKey(0),
        tokenizer=HashTokenizer(512),
    )
    _, den = t2v.basic_sample(
        model, "regression", height=32, width=32, frames=4,
        num_inference_steps=4, key=jax.random.PRNGKey(42), decode=False,
    )
    sched = make_ddim_schedule(8, 1000)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 4, 4, 2))
    xp, _ = ddim_step(sched, x, x * 0.5, jnp.asarray([3, 7]))

    i2v_model = LatentVideoDiffusion.init_random(
        tiny_test_config(img_attention=True), jax.random.PRNGKey(0),
        tokenizer=HashTokenizer(512),
    )
    pano = (np.mgrid[0:32, 0:64].sum(0) % 7 / 7.0 - 0.5).astype(np.float32)
    pano = np.stack([pano] * 3, -1)
    from dynamicscaler_tpu.pipelines import i2v as i2v_pipe, sphere as sphere_pipe

    _, den_i2v = i2v_pipe.sample_shift_multi_windows(
        i2v_model, "reg", pano, total_w=64, total_h=32, total_f=4,
        num_windows_w=4, num_windows_h=2, loop_step=2,
        height=16, width=16, frames=4, num_inference_steps=3,
        key=jax.random.PRNGKey(7), decode=False,
    )
    _, _, den_sp = sphere_pipe.sample_shift_sphere_panorama(
        i2v_model, "reg", pano, equirect_width=64, equirect_height=32,
        phi_theta_dict={0.0: [0.0, 120.0, 240.0], 60.0: [0.0]},
        view_fov=110, loop_step_theta=2, total_f=4,
        height=16, width=16, frames=4, num_inference_steps=3,
        paste_on_static=True, key=jax.random.PRNGKey(8),
    )
    return {
        "basic_sample": np.asarray(den),
        "ddim_step": np.asarray(xp),
        "i2v_planar": np.asarray(den_i2v),
        "sphere": np.asarray(den_sp),
    }


def test_regression_fixtures():
    outs = compute_outputs()
    if not os.path.exists(FIXTURE) or os.environ.get("REGEN"):
        os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
        np.savez_compressed(FIXTURE, **outs)
        pytest.skip("fixture (re)generated")
    ref = np.load(FIXTURE)
    for k, v in outs.items():
        np.testing.assert_allclose(v, ref[k], atol=1e-5, rtol=1e-5, err_msg=k)
