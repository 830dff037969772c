"""Pure-function DDIM / DDPM schedule math.

TPU-native redesign of the reference scheduler layer (reference:
``pipeline/scheduler.py:18-110``, ``lvdm/models/utils_diffusion.py:31-113``,
``lvdm/models/ddpm3d.py:113-165,411-420``):

* All schedule tables are precomputed in float64 on the host and stored as
  float32 arrays inside an immutable :class:`DDIMSchedule` pytree, so every
  sampler step is a pure jittable function of (schedule, state, key).
* ``ddim_step`` takes a **per-frame index vector** — the reference's
  FIFO-style per-frame timestep API (``pipeline/scheduler.py:61-96`` loops
  over frames in Python) becomes a single vectorized gather + broadcast.
* Noise is explicit: every stochastic op takes a ``jax.random`` key. With
  ``eta == 0`` (the reference's only used setting) ``ddim_step`` is
  deterministic and needs no key.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct


# ---------------------------------------------------------------------------
# Host-side schedule construction (float64 numpy, mirrors DDPM conventions)
# ---------------------------------------------------------------------------


def make_beta_schedule(
    schedule: str,
    n_timestep: int,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """Beta schedule table (float64). Mirrors lvdm/models/utils_diffusion.py:31."""
    if schedule == "linear":
        betas = (
            np.linspace(linear_start**0.5, linear_end**0.5, n_timestep, dtype=np.float64)
            ** 2
        )
    elif schedule == "cosine":
        timesteps = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        alphas = np.cos(timesteps / (1 + cosine_s) * np.pi / 2) ** 2
        alphas = alphas / alphas[0]
        betas = 1 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, 0, 0.999)
    elif schedule == "sqrt_linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == "sqrt":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64) ** 0.5
    else:
        raise ValueError(f"schedule '{schedule}' unknown")
    return betas


def make_ddim_timesteps(
    num_ddim_timesteps: int,
    num_ddpm_timesteps: int,
    discretize: str = "uniform",
) -> np.ndarray:
    """DDIM sub-schedule timestep selection (lvdm/models/utils_diffusion.py:56)."""
    if discretize == "uniform":
        ts = (
            np.linspace(0, num_ddpm_timesteps - 1, num_ddim_timesteps)
            .round()
            .astype(np.int64)
        )
        return ts
    elif discretize == "quad":
        ts = (
            np.linspace(0, np.sqrt(num_ddpm_timesteps * 0.8), num_ddim_timesteps) ** 2
        ).astype(int)
        return ts + 1
    raise NotImplementedError(f"ddim discretization '{discretize}' unknown")


def make_scale_arr(
    num_timesteps: int,
    scale_a: float = 1.0,
    scale_b: float = 0.3,
    mid_step: int = 400,
    fix_scale_bug: bool = False,
) -> np.ndarray:
    """VideoCrafter latent-scale array (lvdm/models/ddpm3d.py:362-376).

    Note the reference keeps its historical off-by-config bug: unless
    ``fix_scale_bug`` the flat tail has length ``num_timesteps`` (total array
    is then truncated by indexing past ``num_timesteps`` never occurring).
    """
    scale_step = num_timesteps - mid_step if fix_scale_bug else num_timesteps
    arr1 = np.linspace(scale_a, scale_b, mid_step, dtype=np.float64)
    arr2 = np.full(scale_step, scale_b, dtype=np.float64)
    return np.concatenate([arr1, arr2])[:num_timesteps] if fix_scale_bug else np.concatenate([arr1, arr2])


@struct.dataclass
class DDIMSchedule:
    """Immutable pytree of schedule tables.

    Tables indexed by DDPM timestep ``t in [0, T)`` have length ``T``; tables
    indexed by DDIM step index have length ``S`` (= ``num_ddim_steps``).
    """

    # DDPM tables, length T
    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    # DDIM tables, length S
    ddim_timesteps: jnp.ndarray  # int32, ascending (t values per ddim index)
    ddim_alphas: jnp.ndarray
    ddim_alphas_prev: jnp.ndarray
    ddim_sqrt_one_minus_alphas: jnp.ndarray
    ddim_sigmas: jnp.ndarray
    # VideoCrafter `use_scale` latent scaling (length T); all-ones if unused
    scale_arr: jnp.ndarray
    use_scale: bool = struct.field(pytree_node=False, default=False)
    num_ddpm_timesteps: int = struct.field(pytree_node=False, default=1000)
    num_ddim_steps: int = struct.field(pytree_node=False, default=50)
    eta: float = struct.field(pytree_node=False, default=0.0)


def make_ddim_schedule(
    num_ddim_steps: int,
    num_ddpm_timesteps: int = 1000,
    beta_schedule: str = "linear",
    linear_start: float = 0.00085,
    linear_end: float = 0.012,
    eta: float = 0.0,
    discretize: str = "uniform",
    use_scale: bool = False,
    scale_a: float = 1.0,
    scale_b: float = 0.3,
    mid_step: int = 400,
    given_alphas_cumprod: Optional[np.ndarray] = None,
    dtype=jnp.float32,
) -> DDIMSchedule:
    """Build the full schedule (host-side float64 → device float32).

    Combines the reference's DDPM ``register_schedule`` (ddpm3d.py:113) and
    DDIM ``make_schedule`` (pipeline/scheduler.py:18) into one pure call.
    """
    if given_alphas_cumprod is not None:
        alphas_cumprod = np.asarray(given_alphas_cumprod, dtype=np.float64)
        betas = 1.0 - alphas_cumprod / np.append(1.0, alphas_cumprod[:-1])
        num_ddpm_timesteps = alphas_cumprod.shape[0]
    else:
        betas = make_beta_schedule(
            beta_schedule, num_ddpm_timesteps, linear_start=linear_start, linear_end=linear_end
        )
        alphas_cumprod = np.cumprod(1.0 - betas, axis=0)

    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
    ddim_ts = make_ddim_timesteps(num_ddim_steps, num_ddpm_timesteps, discretize)

    ddim_alphas = alphas_cumprod[ddim_ts]
    ddim_alphas_prev = np.asarray(
        [alphas_cumprod[0]] + alphas_cumprod[ddim_ts[:-1]].tolist()
    )
    ddim_sigmas = eta * np.sqrt(
        (1 - ddim_alphas_prev) / (1 - ddim_alphas) * (1 - ddim_alphas / ddim_alphas_prev)
    )

    scale_arr = (
        make_scale_arr(num_ddpm_timesteps, scale_a=scale_a, scale_b=scale_b, mid_step=mid_step)
        if use_scale
        else np.ones(num_ddpm_timesteps, dtype=np.float64)
    )

    f32 = lambda x: jnp.asarray(x, dtype=dtype)
    return DDIMSchedule(
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        ddim_timesteps=jnp.asarray(ddim_ts, dtype=jnp.int32),
        ddim_alphas=f32(ddim_alphas),
        ddim_alphas_prev=f32(ddim_alphas_prev),
        ddim_sqrt_one_minus_alphas=f32(np.sqrt(1.0 - ddim_alphas)),
        ddim_sigmas=f32(ddim_sigmas),
        scale_arr=f32(scale_arr),
        use_scale=use_scale,
        num_ddpm_timesteps=int(num_ddpm_timesteps),
        num_ddim_steps=int(num_ddim_steps),
        eta=float(eta),
    )


# ---------------------------------------------------------------------------
# Device-side pure step functions (latent layout [B, F, H, W, C])
# ---------------------------------------------------------------------------


def _per_frame(table: jnp.ndarray, indices: jnp.ndarray, ndim: int, frame_axis: int) -> jnp.ndarray:
    """Gather `table[indices]` ([F]) and broadcast against an ndim-rank array
    with frames at `frame_axis`."""
    vals = table[indices]
    shape = [1] * ndim
    shape[frame_axis] = -1
    return vals.reshape(shape)


def ddim_step(
    schedule: DDIMSchedule,
    x: jnp.ndarray,
    noise_pred: jnp.ndarray,
    indices: jnp.ndarray,
    key: Optional[jax.Array] = None,
    frame_axis: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One DDIM update with a per-frame DDIM index vector.

    Replaces the per-frame Python loop of the reference
    (pipeline/scheduler.py:61-96) with a vectorized gather: ``indices`` is an
    int array of shape [F] giving each frame's DDIM step index (FIFO-style
    diagonal denoising passes a different index per frame).

    Returns ``(x_prev, pred_x0)``.
    """
    indices = jnp.asarray(indices)
    nd = x.ndim
    a_t = _per_frame(schedule.ddim_alphas, indices, nd, frame_axis)
    a_prev = _per_frame(schedule.ddim_alphas_prev, indices, nd, frame_axis)
    sigma_t = _per_frame(schedule.ddim_sigmas, indices, nd, frame_axis)
    sqrt_omat = _per_frame(schedule.ddim_sqrt_one_minus_alphas, indices, nd, frame_axis)

    pred_x0 = (x - sqrt_omat * noise_pred) / jnp.sqrt(a_t)
    dir_xt = jnp.sqrt(1.0 - a_prev - sigma_t**2) * noise_pred

    x_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt
    if key is not None and schedule.eta > 0:
        x_prev = x_prev + sigma_t * jax.random.normal(key, x.shape, x.dtype)
    return x_prev, pred_x0


def re_noise(
    schedule: DDIMSchedule,
    x_a: jnp.ndarray,
    step_a,
    step_b,
    key: jax.Array,
    noise: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Closed-form jump q(x_b | x_a) between two DDIM steps
    (pipeline/scheduler.py:98-110). ``step_a < step_b`` adds noise.

    ``step_a``/``step_b`` may be traced scalars (enables per-frame vmapping).
    """
    t_a = schedule.ddim_timesteps[step_a]
    t_b = schedule.ddim_timesteps[step_b]
    acp_a = schedule.alphas_cumprod[t_a]
    acp_b = schedule.alphas_cumprod[t_b]
    # clamp: fused division can round a/a marginally above 1 under jit,
    # which would put sqrt(1 - ratio) at NaN for step_a == step_b
    ratio = jnp.clip(acp_b / acp_a, 0.0, 1.0)
    c = jnp.sqrt(ratio)
    s = jnp.sqrt(1.0 - ratio)
    if noise is None:
        noise = jax.random.normal(key, x_a.shape, x_a.dtype)
    return c * x_a + s * noise


def re_noise_per_frame(
    schedule: DDIMSchedule,
    x_a: jnp.ndarray,
    steps_b: jnp.ndarray,
    key: jax.Array,
    step_a: int = 0,
    frame_axis: int = 1,
    noise: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Progressive skip-noise init: re-noise each frame to its own DDIM step
    (vectorizes the reference's per-frame loop at
    i2v_sphere_panorama_pipeline.py:190-200)."""
    nd = x_a.ndim
    t_a = schedule.ddim_timesteps[step_a]
    t_b = schedule.ddim_timesteps[steps_b]  # [F]
    acp_a = schedule.alphas_cumprod[t_a]
    acp_b = schedule.alphas_cumprod[t_b]  # [F]
    shape = [1] * nd
    shape[frame_axis] = -1
    ratio = jnp.clip(acp_b / acp_a, 0.0, 1.0)
    c = jnp.sqrt(ratio).reshape(shape)
    s = jnp.sqrt(1.0 - ratio).reshape(shape)
    if noise is None:
        noise = jax.random.normal(key, x_a.shape, x_a.dtype)
    return c * x_a + s * noise


def ddim_scale_tables(schedule: DDIMSchedule) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(ddim_scale_arr, ddim_scale_arr_prev) for the legacy `use_scale` step
    (lvdm/models/samplers/ddim.py:42-47): the DDPM scale array gathered at
    the DDIM timesteps, and its shifted-by-one predecessor."""
    sc = schedule.scale_arr[schedule.ddim_timesteps]
    sc_prev = jnp.concatenate(
        [schedule.scale_arr[:1], schedule.scale_arr[schedule.ddim_timesteps[:-1]]]
    )
    return sc, sc_prev


def ddim_step_scaled(
    schedule: DDIMSchedule,
    x: jnp.ndarray,
    noise_pred: jnp.ndarray,
    indices: jnp.ndarray,
    key: Optional[jax.Array] = None,
    frame_axis: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Legacy DDIMSampler step with VideoCrafter `use_scale` correction
    (lvdm/models/samplers/ddim.py:267-272): pred_x0 is un-scaled by
    scale_t and re-scaled by scale_{t_prev} in the x_prev recurrence.

    The pano scheduler (pipeline/scheduler.py:61-96 -> `ddim_step` here)
    deliberately ignores the scale in-step; only the legacy batch-eval
    path applies it. With ``use_scale=False`` this equals ``ddim_step``.
    Vectorized over a per-frame DDIM index vector like ``ddim_step``.
    """
    indices = jnp.asarray(indices)
    nd = x.ndim
    a_t = _per_frame(schedule.ddim_alphas, indices, nd, frame_axis)
    a_prev = _per_frame(schedule.ddim_alphas_prev, indices, nd, frame_axis)
    sigma_t = _per_frame(schedule.ddim_sigmas, indices, nd, frame_axis)
    sqrt_omat = _per_frame(schedule.ddim_sqrt_one_minus_alphas, indices, nd, frame_axis)

    pred_x0 = (x - sqrt_omat * noise_pred) / jnp.sqrt(a_t)
    dir_xt = jnp.sqrt(1.0 - a_prev - sigma_t**2) * noise_pred

    if schedule.use_scale:
        sc, sc_prev = ddim_scale_tables(schedule)
        scale_t = _per_frame(sc, indices, nd, frame_axis)
        scale_prev = _per_frame(sc_prev, indices, nd, frame_axis)
        pred_x0 = pred_x0 / scale_t
        x_prev = jnp.sqrt(a_prev) * scale_prev * pred_x0 + dir_xt
    else:
        x_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt
    if key is not None and schedule.eta > 0:
        x_prev = x_prev + sigma_t * jax.random.normal(key, x.shape, x.dtype)
    return x_prev, pred_x0


def cfg_combine(
    eps_cond: jnp.ndarray,
    eps_uncond: jnp.ndarray,
    guidance_scale: float,
    uc_type: Optional[str] = None,
) -> jnp.ndarray:
    """Classifier-free-guidance noise combination incl. the legacy sampler's
    alternate formulas (lvdm/models/samplers/ddim.py:217-226)."""
    if uc_type is None:
        return eps_uncond + guidance_scale * (eps_cond - eps_uncond)
    if uc_type == "cfg_original":
        return eps_cond + guidance_scale * (eps_cond - eps_uncond)
    if uc_type == "cfg_ours":
        return eps_cond + guidance_scale * (eps_uncond - eps_cond)
    raise NotImplementedError(f"uc_type '{uc_type}' unknown")


def temporal_guidance_combine(
    eps: jnp.ndarray,
    eps_temporal: jnp.ndarray,
    eps_no_temporal: jnp.ndarray,
    scale: float,
) -> jnp.ndarray:
    """`conditional_guidance_scale_temporal` term
    (lvdm/models/samplers/ddim.py:228-231): push eps along the difference
    between the temporal-attention and temporal-attention-free predictions.

    Note: in the reference this is a silent no-op — the shipped UNet swallows
    ``no_temporal_attn`` via **kwargs (openaimodel3d.py:657), so
    eps_temporal == eps_no_temporal there. Our UNet3D implements the flag
    for real (models/unet3d.py `no_temporal_attn`).
    """
    return eps + scale * (eps_temporal - eps_no_temporal)


def stochastic_encode(
    schedule: DDIMSchedule,
    x0: jnp.ndarray,
    t,
    key: Optional[jax.Array] = None,
    noise: Optional[jnp.ndarray] = None,
    use_original_steps: bool = False,
) -> jnp.ndarray:
    """Noise x0 to DDIM step-index ``t`` (lvdm/models/samplers/ddim.py:330-348).

    ``t`` indexes the DDIM sub-schedule (or raw DDPM timesteps when
    ``use_original_steps``); scalar or per-batch [B].
    """
    if use_original_steps:
        sac = schedule.sqrt_alphas_cumprod
        somac = schedule.sqrt_one_minus_alphas_cumprod
    else:
        sac = jnp.sqrt(schedule.ddim_alphas)
        somac = schedule.ddim_sqrt_one_minus_alphas
    if noise is None:
        noise = jax.random.normal(key, x0.shape, x0.dtype)
    t = jnp.asarray(t)
    shape = (-1,) + (1,) * (x0.ndim - 1) if t.ndim else ()
    c = sac[t].reshape(shape) if t.ndim else sac[t]
    s = somac[t].reshape(shape) if t.ndim else somac[t]
    return c * x0 + s * noise


def q_sample(
    schedule: DDIMSchedule,
    x_start: jnp.ndarray,
    t,
    key: Optional[jax.Array] = None,
    noise: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Forward diffusion q(x_t | x_0) with optional VideoCrafter `use_scale`
    latent scaling (lvdm/models/ddpm3d.py:411-420)."""
    if noise is None:
        noise = jax.random.normal(key, x_start.shape, x_start.dtype)
    sac = schedule.sqrt_alphas_cumprod[t]
    somac = schedule.sqrt_one_minus_alphas_cumprod[t]
    if schedule.use_scale:
        sac = sac * schedule.scale_arr[t]
    return sac * x_start + somac * noise
