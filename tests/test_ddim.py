"""DDIM schedule / step math vs an independent torch oracle.

The oracle re-implements the published DDIM equations (Song et al. 2020)
with torch float32 semantics the way the reference stack does, so agreement
here means parity with ``pipeline/scheduler.py`` given identical noise.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from dynamicscaler_tpu.ops.ddim import (
    make_beta_schedule,
    make_ddim_schedule,
    make_ddim_timesteps,
    ddim_step,
    re_noise,
    re_noise_per_frame,
    q_sample,
)

LINEAR_START = 0.00085
LINEAR_END = 0.012
T = 1000


def torch_tables(num_steps):
    betas = (
        torch.linspace(LINEAR_START**0.5, LINEAR_END**0.5, T, dtype=torch.float64) ** 2
    )
    alphas_cumprod = torch.cumprod(1.0 - betas, dim=0)
    ddim_ts = np.linspace(0, T - 1, num_steps).round().astype(np.int64)
    a = alphas_cumprod[ddim_ts].numpy()
    a_prev = np.asarray([alphas_cumprod[0].item()] + alphas_cumprod[ddim_ts[:-1]].numpy().tolist())
    return betas.numpy(), alphas_cumprod.numpy(), ddim_ts, a, a_prev


def test_schedule_tables_match_torch_oracle():
    sched = make_ddim_schedule(48, T, linear_start=LINEAR_START, linear_end=LINEAR_END)
    betas, acp, ddim_ts, a, a_prev = torch_tables(48)
    np.testing.assert_allclose(np.asarray(sched.betas), betas, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sched.alphas_cumprod), acp, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(sched.ddim_timesteps), ddim_ts)
    np.testing.assert_allclose(np.asarray(sched.ddim_alphas), a, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sched.ddim_alphas_prev), a_prev, rtol=1e-6)
    # eta=0 -> all sigmas zero
    assert np.all(np.asarray(sched.ddim_sigmas) == 0)


def test_ddim_timesteps_uniform_quad():
    ts = make_ddim_timesteps(48, 1000, "uniform")
    assert ts[0] == 0 and ts[-1] == 999 and len(ts) == 48
    tq = make_ddim_timesteps(10, 1000, "quad")
    assert np.all(np.diff(tq) >= 0)


def test_ddim_step_matches_oracle(rng):
    sched = make_ddim_schedule(48, T, linear_start=LINEAR_START, linear_end=LINEAR_END)
    _, _, _, a, a_prev = torch_tables(48)
    x = rng.standard_normal((1, 4, 8, 10, 4)).astype(np.float32)  # B F H W C
    eps = rng.standard_normal(x.shape).astype(np.float32)
    idx = 30
    x_prev, pred_x0 = ddim_step(sched, jnp.asarray(x), jnp.asarray(eps), jnp.full((4,), idx))

    # oracle (eta=0): x_prev = sqrt(a_prev) * pred_x0 + sqrt(1 - a_prev) * eps
    px0 = (x - np.sqrt(1 - a[idx], dtype=np.float32) * eps) / np.float32(np.sqrt(a[idx]))
    ref = np.float32(np.sqrt(a_prev[idx])) * px0 + np.float32(np.sqrt(1 - a_prev[idx])) * eps
    np.testing.assert_allclose(np.asarray(pred_x0), px0, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(x_prev), ref, rtol=2e-5, atol=2e-5)


def test_ddim_step_per_frame_indices(rng):
    """FIFO-style: different index per frame == applying the scalar step
    frame-by-frame."""
    sched = make_ddim_schedule(48, T, linear_start=LINEAR_START, linear_end=LINEAR_END)
    F = 4
    x = jnp.asarray(rng.standard_normal((1, F, 6, 6, 4)).astype(np.float32))
    eps = jnp.asarray(rng.standard_normal(x.shape).astype(np.float32))
    indices = jnp.asarray([3, 17, 29, 47])
    x_prev, px0 = ddim_step(sched, x, eps, indices)
    for f in range(F):
        xf, pf = ddim_step(
            sched, x[:, f : f + 1], eps[:, f : f + 1], indices[f : f + 1]
        )
        np.testing.assert_allclose(np.asarray(x_prev[:, f]), np.asarray(xf[:, 0]), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(px0[:, f]), np.asarray(pf[:, 0]), rtol=1e-6)


def test_re_noise_statistics_and_formula(rng):
    sched = make_ddim_schedule(48, T, linear_start=LINEAR_START, linear_end=LINEAR_END)
    x = jnp.asarray(rng.standard_normal((1, 2, 8, 8, 4)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal(x.shape).astype(np.float32))
    out = re_noise(sched, x, 5, 40, key=None, noise=noise)
    acp = np.asarray(sched.alphas_cumprod)
    ts = np.asarray(sched.ddim_timesteps)
    ratio = acp[ts[40]] / acp[ts[5]]
    ref = np.sqrt(ratio) * np.asarray(x) + np.sqrt(1 - ratio) * np.asarray(noise)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)


def test_re_noise_per_frame_matches_scalar(rng):
    sched = make_ddim_schedule(48, T, linear_start=LINEAR_START, linear_end=LINEAR_END)
    F = 3
    x = jnp.asarray(rng.standard_normal((1, F, 4, 4, 2)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal(x.shape).astype(np.float32))
    steps = jnp.asarray([10, 20, 47])
    out = re_noise_per_frame(sched, x, steps, key=None, noise=noise)
    for f in range(F):
        ref = re_noise(sched, x[:, f : f + 1], 0, int(steps[f]), key=None, noise=noise[:, f : f + 1])
        np.testing.assert_allclose(np.asarray(out[:, f]), np.asarray(ref[:, 0]), rtol=1e-6)


def test_q_sample_use_scale(rng):
    sched = make_ddim_schedule(
        48, T, linear_start=LINEAR_START, linear_end=LINEAR_END,
        use_scale=True, scale_b=0.7, mid_step=400,
    )
    # scale_arr: linspace(1, 0.7, 400) then flat 0.7
    sa = np.asarray(sched.scale_arr)
    assert sa.shape[0] >= T
    np.testing.assert_allclose(sa[0], 1.0, rtol=1e-6)
    np.testing.assert_allclose(sa[399:], 0.7, rtol=1e-6)

    x0 = jnp.asarray(rng.standard_normal((1, 1, 4, 4, 2)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal(x0.shape).astype(np.float32))
    t = 500
    out = q_sample(sched, x0, t, noise=noise)
    acp = np.asarray(sched.alphas_cumprod)
    ref = (
        np.sqrt(acp[t]) * 0.7 * np.asarray(x0)
        + np.sqrt(1 - acp[t]) * np.asarray(noise)
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)


def test_ddim_full_chain_reduces_noise(rng):
    """Sanity: iterating ddim_step from pure noise with eps=x converges to ~0
    scale (the analytic fixed point when the model predicts the noise
    exactly)."""
    sched = make_ddim_schedule(20, T, linear_start=LINEAR_START, linear_end=LINEAR_END)
    x = jnp.asarray(rng.standard_normal((1, 1, 8, 8, 4)).astype(np.float32))
    for i in reversed(range(20)):
        x, _ = ddim_step(sched, x, x, jnp.asarray([i]))
        # when eps == x: pred_x0 = x (1 - sqrt(1-a))/sqrt(a) ... just check finite
        assert np.all(np.isfinite(np.asarray(x)))
