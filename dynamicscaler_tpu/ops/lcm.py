"""LCM / T2V-Turbo scheduler as pure functions.

Rebuild of the vendored ``T2VTurboScheduler`` (pipeline/d_scheduler.py:
55-125 beta schedules + zero-terminal-SNR rescale, :322-366 LCM timestep
spacing + boundary-condition scalings, :368-463 ``step``, :465-545 the
per-frame-timestep ``fifo_step``, :550-601 ``add_noise``). The FIFO variant
is the vectorized default here: ``lcm_step`` takes per-frame (timestep,
prev-timestep) vectors, so diagonal (streaming) denoising is one fused
program instead of a Python frame loop.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct


def rescale_zero_terminal_snr(betas: np.ndarray) -> np.ndarray:
    """Zero terminal SNR (arXiv 2305.08891, Alg. 1; d_scheduler.py:95-125)."""
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    abs_sqrt = np.sqrt(alphas_cumprod)
    a0, aT = abs_sqrt[0], abs_sqrt[-1]
    abs_sqrt = (abs_sqrt - aT) * a0 / (a0 - aT)
    abar = abs_sqrt**2
    alphas = np.concatenate([abar[:1], abar[1:] / abar[:-1]])
    return 1.0 - alphas


@struct.dataclass
class LCMSchedule:
    alphas_cumprod: jnp.ndarray  # [T]
    timesteps: jnp.ndarray  # [S] int32, DESCENDING (LCM inference order)
    final_alpha_cumprod: jnp.ndarray  # scalar
    num_inference_steps: int = struct.field(pytree_node=False, default=4)
    prediction_type: str = struct.field(pytree_node=False, default="epsilon")
    sigma_data: float = struct.field(pytree_node=False, default=0.5)


def make_lcm_schedule(
    num_inference_steps: int,
    lcm_origin_steps: int = 50,
    num_train_timesteps: int = 1000,
    linear_start: float = 0.00085,
    linear_end: float = 0.012,
    rescale_betas_zero_snr_flag: bool = False,
    set_alpha_to_one: bool = True,
    prediction_type: str = "epsilon",
) -> LCMSchedule:
    """scaled_linear betas + LCM linear-spacing timesteps
    (d_scheduler.py:200-212,322-356)."""
    betas = (
        np.linspace(linear_start**0.5, linear_end**0.5, num_train_timesteps, dtype=np.float64)
        ** 2
    )
    if rescale_betas_zero_snr_flag:
        betas = rescale_zero_terminal_snr(betas)
    alphas_cumprod = np.cumprod(1.0 - betas)
    final = 1.0 if set_alpha_to_one else alphas_cumprod[0]

    c = num_train_timesteps // lcm_origin_steps
    lcm_origin = np.arange(1, lcm_origin_steps + 1) * c - 1
    skip = max(len(lcm_origin) // num_inference_steps, 1)
    timesteps = lcm_origin[::-skip][:num_inference_steps]

    return LCMSchedule(
        alphas_cumprod=jnp.asarray(alphas_cumprod, jnp.float32),
        timesteps=jnp.asarray(timesteps, jnp.int32),
        final_alpha_cumprod=jnp.asarray(final, jnp.float32),
        num_inference_steps=num_inference_steps,
        prediction_type=prediction_type,
    )


def boundary_scalings(t, sigma_data: float = 0.5):
    """LCM boundary-condition scalings (d_scheduler.py:360-366)."""
    t = jnp.asarray(t, jnp.float32)
    c_skip = sigma_data**2 / ((t / 0.1) ** 2 + sigma_data**2)
    c_out = (t / 0.1) / jnp.sqrt((t / 0.1) ** 2 + sigma_data**2)
    return c_skip, c_out


def lcm_step(
    schedule: LCMSchedule,
    sample: jnp.ndarray,  # [B, F, H, W, C]
    model_output: jnp.ndarray,
    timesteps: jnp.ndarray,  # [F] current DDPM timestep per frame
    prev_timesteps: jnp.ndarray,  # [F] previous (less-noisy) timestep per frame
    key: Optional[jax.Array] = None,
    noise: Optional[jnp.ndarray] = None,
    frame_axis: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One LCM update, vectorized over per-frame timesteps (the ``fifo_step``
    generalization; pass identical vectors for plain ``step``).

    Returns (prev_sample, denoised).
    """
    nd = sample.ndim
    shape = [1] * nd
    shape[frame_axis] = -1

    a_t = schedule.alphas_cumprod[timesteps].reshape(shape)
    a_prev = jnp.where(
        prev_timesteps >= 0,
        schedule.alphas_cumprod[jnp.maximum(prev_timesteps, 0)],
        schedule.final_alpha_cumprod,
    ).reshape(shape)
    b_t = 1.0 - a_t
    b_prev = 1.0 - a_prev

    if schedule.prediction_type == "epsilon":
        pred_x0 = (sample - jnp.sqrt(b_t) * model_output) / jnp.sqrt(a_t)
    elif schedule.prediction_type == "sample":
        pred_x0 = model_output
    elif schedule.prediction_type == "v_prediction":
        pred_x0 = jnp.sqrt(a_t) * sample - jnp.sqrt(b_t) * model_output
    else:
        raise ValueError(schedule.prediction_type)

    c_skip, c_out = boundary_scalings(timesteps, schedule.sigma_data)
    c_skip = c_skip.reshape(shape)
    c_out = c_out.reshape(shape)
    denoised = c_out * pred_x0 + c_skip * sample

    if schedule.num_inference_steps > 1:
        if noise is None:
            noise = jax.random.normal(key, sample.shape, sample.dtype)
        prev_sample = jnp.sqrt(a_prev) * denoised + jnp.sqrt(b_prev) * noise
    else:
        prev_sample = denoised
    return prev_sample, denoised


def fifo_timestep_vectors(schedule: LCMSchedule) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-queue-slot (timestep, prev_timestep) vectors for FIFO diagonal
    denoising, transcribing ``fifo_step``'s index mapping
    (d_scheduler.py:485-495): the queue runs front (cleanest) -> back, i.e.
    the ASCENDING timesteps list; slot i's previous timestep is slot i-1's,
    and the front slot keeps its own (prev_timeindex out of range)."""
    t_asc = schedule.timesteps[::-1]
    prev = jnp.concatenate([t_asc[:1], t_asc[:-1]])
    return t_asc, prev


def lcm_add_noise(
    schedule: LCMSchedule,
    original: jnp.ndarray,
    timesteps,
    key: Optional[jax.Array] = None,
    noise: Optional[jnp.ndarray] = None,
    frame_axis: int = 1,
) -> jnp.ndarray:
    """q(x_t | x_0) with per-frame timesteps (d_scheduler.py:550-583)."""
    if noise is None:
        noise = jax.random.normal(key, original.shape, original.dtype)
    timesteps = jnp.asarray(timesteps)
    if timesteps.ndim == 0:
        sac = jnp.sqrt(schedule.alphas_cumprod[timesteps])
        soc = jnp.sqrt(1.0 - schedule.alphas_cumprod[timesteps])
    else:
        shape = [1] * original.ndim
        shape[frame_axis] = -1
        sac = jnp.sqrt(schedule.alphas_cumprod[timesteps]).reshape(shape)
        soc = jnp.sqrt(1.0 - schedule.alphas_cumprod[timesteps]).reshape(shape)
    return sac * original + soc * noise
