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


def _torch_fifo_step(model_pred, timeindex_list, timestep_list, sample_latent,
                     timesteps, acp, final_acp, multistep=True):
    """Test-local transcription of T2VTurboScheduler.fifo_step
    (d_scheduler.py:465-545) — per-frame loop, epsilon parameterization,
    noise injected by the caller via torch.randn (patched)."""
    prev_list, den_list = [], []
    for i, time_index in enumerate(timeindex_list):
        model_output = model_pred[:, :, [i]]
        sample = sample_latent[:, :, [i]]
        timestep = timestep_list[i]
        prev_timeindex = time_index - 1
        if 0 <= prev_timeindex < len(timesteps):
            prev_timestep = int(timesteps[prev_timeindex])
        else:
            prev_timestep = timestep
        alpha_prod_t = acp[timestep]
        alpha_prod_t_prev = acp[prev_timestep] if prev_timestep >= 0 else final_acp
        beta_prod_t = 1 - alpha_prod_t
        beta_prod_t_prev = 1 - alpha_prod_t_prev
        sigma_data = 0.5
        c_skip = sigma_data**2 / ((timestep / 0.1) ** 2 + sigma_data**2)
        c_out = (timestep / 0.1) / ((timestep / 0.1) ** 2 + sigma_data**2) ** 0.5
        pred_x0 = (sample - beta_prod_t.sqrt() * model_output) / alpha_prod_t.sqrt()
        denoised = c_out * pred_x0 + c_skip * sample
        if multistep:
            noise = torch.randn(model_output.shape)
            prev_sample = (
                alpha_prod_t_prev.sqrt() * denoised + beta_prod_t_prev.sqrt() * noise
            )
        else:
            prev_sample = denoised
        prev_list.append(prev_sample)
        den_list.append(denoised)
    return torch.cat(prev_list, dim=2), torch.cat(den_list, dim=2)


def test_fifo_step_queue_update_matches_reference_math(rng, monkeypatch):
    """The FIFO queue update (pipelines/fifo.py lcm path = lcm_step +
    fifo_timestep_vectors) vs the transcribed fifo_step oracle
    (d_scheduler.py:465-545), identical injected noise (VERDICT r2 #6).

    The queue holds the ASCENDING timesteps (front cleanest); fifo_step's
    timeindex i maps slot i's prev to slot i-1's timestep, front keeps its
    own."""
    from dynamicscaler_tpu.ops.lcm import fifo_timestep_vectors

    F = 4
    s = make_lcm_schedule(F)
    t_asc, t_prev = fifo_timestep_vectors(s)
    # reference side: self.timesteps reversed to ascending by its fifo
    # sampler ("已经被 fifo_sample 修改了"), timeindex_list = range(F)
    timesteps_asc = torch.tensor(np.asarray(t_asc))
    acp = torch_tables()

    x = rng.standard_normal((1, 3, F, 4, 4)).astype(np.float32)  # [B,C,F,H,W]
    eps = rng.standard_normal(x.shape).astype(np.float32)
    noises = [rng.standard_normal((1, 3, 1, 4, 4)).astype(np.float32) for _ in range(F)]

    queue = [torch.from_numpy(n) for n in noises]
    monkeypatch.setattr(torch, "randn", lambda *shape, **kw: queue.pop(0))
    ref_prev, ref_den = _torch_fifo_step(
        torch.from_numpy(eps), list(range(F)), [int(t) for t in timesteps_asc],
        torch.from_numpy(x), timesteps_asc, acp, torch.tensor(1.0),
    )

    noise_j = jnp.asarray(
        np.concatenate(noises, axis=2).transpose(0, 2, 3, 4, 1)
    )  # [B,F,H,W,C]
    got_prev, got_den = lcm_step(
        s,
        jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
        jnp.asarray(eps.transpose(0, 2, 3, 4, 1)),
        t_asc, t_prev,
        noise=noise_j,
    )
    np.testing.assert_allclose(
        np.asarray(got_den).transpose(0, 4, 1, 2, 3), ref_den.numpy(),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got_prev).transpose(0, 4, 1, 2, 3), ref_prev.numpy(),
        rtol=1e-4, atol=1e-5,
    )
