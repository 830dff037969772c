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
    return {"basic_sample": np.asarray(den), "ddim_step": np.asarray(xp)}


def test_regression_fixtures():
    outs = compute_outputs()
    if not os.path.exists(FIXTURE) or os.environ.get("REGEN"):
        os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
        np.savez_compressed(FIXTURE, **outs)
        pytest.skip("fixture (re)generated")
    ref = np.load(FIXTURE)
    for k, v in outs.items():
        np.testing.assert_allclose(v, ref[k], atol=1e-5, rtol=1e-5, err_msg=k)
