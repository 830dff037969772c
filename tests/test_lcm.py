"""LCM scheduler vs torch-oracle re-implementation of the published math."""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from dynamicscaler_tpu.ops.lcm import (
    LCMSchedule,
    boundary_scalings,
    lcm_add_noise,
    lcm_step,
    make_lcm_schedule,
    rescale_zero_terminal_snr,
)


def torch_tables():
    betas = torch.linspace(0.00085**0.5, 0.012**0.5, 1000, dtype=torch.float64) ** 2
    return torch.cumprod(1 - betas, 0).float()


def test_lcm_timestep_spacing():
    s = make_lcm_schedule(4, lcm_origin_steps=50)
    # c = 20; origin = [19, 39, ..., 999]; skip = 12 -> [999, 759, 519, 279]
    np.testing.assert_array_equal(np.asarray(s.timesteps), [999, 759, 519, 279])
    s1 = make_lcm_schedule(1)
    assert len(np.asarray(s1.timesteps)) == 1 and s1.timesteps[0] == 999


def test_boundary_scalings_formula():
    c_skip, c_out = boundary_scalings(jnp.asarray([0.0, 100.0]))
    # t=0 -> c_skip = 1, c_out = 0
    np.testing.assert_allclose(float(c_skip[0]), 1.0)
    np.testing.assert_allclose(float(c_out[0]), 0.0)
    t = 100.0
    ref_skip = 0.25 / ((t / 0.1) ** 2 + 0.25)
    ref_out = (t / 0.1) / ((t / 0.1) ** 2 + 0.25) ** 0.5
    np.testing.assert_allclose(float(c_skip[1]), ref_skip, rtol=1e-6)
    np.testing.assert_allclose(float(c_out[1]), ref_out, rtol=1e-5)


def test_lcm_step_epsilon_matches_oracle(rng):
    s = make_lcm_schedule(4)
    acp = torch_tables()
    x = rng.standard_normal((1, 2, 4, 4, 3)).astype(np.float32)
    eps = rng.standard_normal(x.shape).astype(np.float32)
    noise = rng.standard_normal(x.shape).astype(np.float32)

    t, t_prev = 759, 999  # fifo: prev_timeindex = index - 1 (more noise)
    prev, den = lcm_step(
        s, jnp.asarray(x), jnp.asarray(eps),
        jnp.asarray([t, t]), jnp.asarray([t_prev, t_prev]),
        noise=jnp.asarray(noise),
    )
    a_t, a_p = float(acp[t]), float(acp[t_prev])
    px0 = (x - np.sqrt(1 - a_t, dtype=np.float32) * eps) / np.float32(np.sqrt(a_t))
    cs = 0.25 / ((t / 0.1) ** 2 + 0.25)
    co = (t / 0.1) / ((t / 0.1) ** 2 + 0.25) ** 0.5
    dref = co * px0 + cs * x
    pref = np.sqrt(a_p, dtype=np.float32) * dref + np.sqrt(1 - a_p, dtype=np.float32) * noise
    np.testing.assert_allclose(np.asarray(den), dref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(prev), pref, rtol=1e-4, atol=1e-5)


def test_lcm_fifo_per_frame_differs(rng):
    s = make_lcm_schedule(4)
    x = jnp.asarray(rng.standard_normal((1, 4, 2, 2, 1)).astype(np.float32))
    eps = jnp.asarray(rng.standard_normal(x.shape).astype(np.float32))
    noise = jnp.zeros_like(x)
    ts = jnp.asarray([999, 759, 519, 279])
    prev_ts = jnp.asarray([999, 999, 759, 519])
    prev, den = lcm_step(s, x, eps, ts, prev_ts, noise=noise)
    # frame-wise equals scalar application
    for f in range(4):
        pf, df = lcm_step(
            s, x[:, f:f+1], eps[:, f:f+1], ts[f:f+1], prev_ts[f:f+1], noise=noise[:, f:f+1]
        )
        np.testing.assert_allclose(np.asarray(prev[:, f]), np.asarray(pf[:, 0]), rtol=1e-6)


def test_zero_snr_rescale_terminal():
    betas = np.linspace(0.00085**0.5, 0.012**0.5, 1000) ** 2
    rb = rescale_zero_terminal_snr(betas)
    acp = np.cumprod(1 - rb)
    assert acp[-1] < 1e-10  # terminal SNR ~ 0


def test_add_noise_per_frame(rng):
    s = make_lcm_schedule(4)
    x = jnp.asarray(rng.standard_normal((1, 2, 2, 2, 1)).astype(np.float32))
    n = jnp.asarray(rng.standard_normal(x.shape).astype(np.float32))
    out = lcm_add_noise(s, x, jnp.asarray([100, 900]), noise=n)
    acp = np.asarray(s.alphas_cumprod)
    for f, t in enumerate([100, 900]):
        ref = np.sqrt(acp[t]) * np.asarray(x[:, f]) + np.sqrt(1 - acp[t]) * np.asarray(n[:, f])
        np.testing.assert_allclose(np.asarray(out[:, f]), ref, rtol=1e-5)
