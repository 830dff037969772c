"""FIFO diagonal denoising — streaming infinite video generation.

The reference ships the machinery for this but never wires it up: its DDIM
scheduler takes a per-frame index list (pipeline/scheduler.py:61-96) and the
vendored T2V-Turbo scheduler has ``fifo_step`` (d_scheduler.py:465-545),
imported only by a latent-encoding util. This module makes it a working
sampler.

Scheme (FIFO-Diffusion): keep a queue of ``frames`` latents at staggered
DDIM indices ``[0, 1, ..., F-1]`` (front = cleanest). Each iteration runs
ONE UNet forward with the per-frame index vector, emits the now-clean front
frame, shifts the queue, and appends fresh noise at the back — so an
arbitrarily long, temporally coherent stream costs one UNet call per output
frame. The whole generation loop is a single jitted ``lax.scan``; the UNet is
conditioned on each queue slot's own timestep (per-frame t rides the
(B F) batch of the time embedding).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from dynamicscaler_tpu.models.lvdm import LatentVideoDiffusion
from dynamicscaler_tpu.ops.ddim import DDIMSchedule, ddim_step, re_noise_per_frame
from dynamicscaler_tpu.ops.lcm import (
    LCMSchedule,
    fifo_timestep_vectors,
    lcm_add_noise,
    lcm_step,
    make_lcm_schedule,
)
from dynamicscaler_tpu.pipelines.conditioning import build_uncond_context
from dynamicscaler_tpu.pipelines.t2v import make_schedule_for_model


@partial(
    jax.jit,
    static_argnames=("model", "guidance_scale", "fps", "num_out_frames"),
)
def _fifo_loop(
    params,
    schedule: DDIMSchedule,
    queue: jnp.ndarray,  # [1, F, h, w, C] staggered-noise queue
    context: jnp.ndarray,
    uncond: jnp.ndarray,
    key: jax.Array,
    *,
    model: LatentVideoDiffusion,
    guidance_scale: float,
    fps: int,
    num_out_frames: int,
):
    F = queue.shape[1]
    indices = jnp.arange(F)  # front frame at index 0 (about to finish)
    # per-frame DDPM timestep fed to the UNet: each queue slot's own t
    # (true FIFO-Diffusion conditioning — the time embedding rides the
    # (B F) batch, so per-frame t is native; the reference's fifo machinery
    # is dormant and its UNet only ever saw a scalar t)
    t_frames = schedule.ddim_timesteps[indices]  # [F]
    t2 = jnp.broadcast_to(t_frames[None], (2, F))
    ctx2 = jnp.concatenate([context, uncond], axis=0)

    def body(carry, i):
        queue, key = carry
        key, k_noise = jax.random.split(key)
        x2 = jnp.concatenate([queue, queue], axis=0)
        eps = model.apply_unet(x2, t2, ctx2, fps, params=params)
        eps = eps[1:] + guidance_scale * (eps[:1] - eps[1:])
        stepped, denoised = ddim_step(schedule, queue, eps, indices)
        out_frame = denoised[:, 0]
        # shift: drop front, append pure noise at the back of the queue
        fresh = jax.random.normal(k_noise, queue[:, :1].shape, queue.dtype)
        queue = jnp.concatenate([stepped[:, 1:], fresh], axis=1)
        return (queue, key), out_frame

    (queue, _), frames = jax.lax.scan(body, (queue, key), jnp.arange(num_out_frames))
    # frames: [num_out, 1, h, w, C] -> [1, num_out, h, w, C]
    return jnp.swapaxes(frames, 0, 1), queue


@partial(
    jax.jit,
    static_argnames=("model", "guidance_scale", "fps", "num_out_frames"),
)
def _fifo_loop_lcm(
    params,
    schedule: LCMSchedule,
    queue: jnp.ndarray,  # [1, F, h, w, C] staggered-noise queue
    context: jnp.ndarray,
    uncond: jnp.ndarray,
    key: jax.Array,
    *,
    model: LatentVideoDiffusion,
    guidance_scale: float,
    fps: int,
    num_out_frames: int,
):
    """LCM / T2V-Turbo FIFO stream: ``fifo_step`` semantics
    (d_scheduler.py:465-545) vectorized into one lax.scan — the consumer of
    ops/lcm.py's ``lcm_step``."""
    F = queue.shape[1]
    t_frames, prev_frames = fifo_timestep_vectors(schedule)  # ascending
    t2 = jnp.broadcast_to(t_frames[None], (2, F))
    ctx2 = jnp.concatenate([context, uncond], axis=0)

    def body(carry, i):
        queue, key = carry
        key, k_step, k_noise = jax.random.split(key, 3)
        x2 = jnp.concatenate([queue, queue], axis=0)
        eps = model.apply_unet(x2, t2, ctx2, fps, params=params)
        eps = eps[1:] + guidance_scale * (eps[:1] - eps[1:])
        stepped, denoised = lcm_step(
            schedule, queue, eps, t_frames, prev_frames, key=k_step
        )
        out_frame = denoised[:, 0]
        fresh = jax.random.normal(k_noise, queue[:, :1].shape, queue.dtype)
        queue = jnp.concatenate([stepped[:, 1:], fresh], axis=1)
        return (queue, key), out_frame

    (queue, _), frames = jax.lax.scan(body, (queue, key), jnp.arange(num_out_frames))
    return jnp.swapaxes(frames, 0, 1), queue


def fifo_sample(
    model: LatentVideoDiffusion,
    prompt: str,
    num_output_frames: int,
    height: int = 320,
    width: int = 512,
    frames: Optional[int] = None,
    fps: int = 16,
    guidance_scale: float = 7.5,
    key: Optional[jax.Array] = None,
    base_latent: Optional[jnp.ndarray] = None,
    decode: bool = True,
    scheduler: str = "ddim",
) -> Tuple[Optional[jnp.ndarray], jnp.ndarray]:
    """Generate a stream of ``num_output_frames`` via FIFO diagonal
    denoising. Queue depth = ``frames`` (= number of scheduler steps each
    frame receives). ``scheduler``: ``ddim`` (VideoCrafter models) or
    ``lcm`` (T2V-Turbo distilled models, d_scheduler.py fifo_step
    semantics). Returns (video or None, latent frames [1, N, h, w, C])."""
    assert key is not None
    assert scheduler in ("ddim", "lcm"), scheduler
    frames = frames or model.config.unet.temporal_length
    vs = model.config.vae.spatial_scale
    h, w = height // vs, width // vs

    context = model.encode_text([prompt])
    uncond = build_uncond_context(model, with_image=False)

    k_init, k_run = jax.random.split(key)
    if base_latent is None:
        base = jax.random.normal(k_init, (1, frames, h, w, model.config.unet.in_channels))
    else:
        base = base_latent

    if scheduler == "lcm":
        sched = make_lcm_schedule(num_inference_steps=frames)
        t_frames, _ = fifo_timestep_vectors(sched)
        # stagger: slot j noised to its own LCM timestep (front cleanest)
        queue = lcm_add_noise(
            sched, base, t_frames, key=jax.random.fold_in(k_init, 1)
        )
        loop = partial(_fifo_loop_lcm, model=model, guidance_scale=guidance_scale,
                       fps=fps, num_out_frames=num_output_frames)
    else:
        sched = make_schedule_for_model(model, frames)  # S == queue depth
        # stagger: frame j re-noised to DDIM index j (front cleanest)
        queue = re_noise_per_frame(
            sched, base, jnp.arange(frames), key=jax.random.fold_in(k_init, 1)
        )
        loop = partial(_fifo_loop, model=model, guidance_scale=guidance_scale,
                       fps=fps, num_out_frames=num_output_frames)

    frames_out, _ = loop(model.params, sched, queue, context, uncond, k_run)
    video = model.decode_video(frames_out) if decode else None
    return video, frames_out
