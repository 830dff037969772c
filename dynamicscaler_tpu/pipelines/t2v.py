"""Text-to-video pipelines (VideoCrafter2 t2v).

``basic_sample`` is the minimal end-to-end slice (reference
pipeline/t2v_normal_pipeline.py:70-212, SURVEY §3.4): plain single-window
DDIM with CFG. The whole denoise loop runs as one jitted ``lax.scan`` —
zero per-step Python overhead.

``sample_shift_multi_windows`` is the planar multi-window t2v sampler
(t2v_normal_pipeline.py:214-570) built on the shared
:class:`PlanarShiftWindowEngine`, including pre-denoise residual init and
docking.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from dynamicscaler_tpu.models.lvdm import LatentVideoDiffusion
from dynamicscaler_tpu.ops.ddim import DDIMSchedule, ddim_step, make_ddim_schedule, re_noise
from dynamicscaler_tpu.ops.resize import resize_video_latent
from dynamicscaler_tpu.pipelines.conditioning import build_uncond_context
from dynamicscaler_tpu.pipelines.planar import (
    PlanarShiftWindowEngine,
    StepPlan,
)
from dynamicscaler_tpu.core.windows import IntegerGrid


def make_schedule_for_model(model: LatentVideoDiffusion, num_steps: int) -> DDIMSchedule:
    d = model.config.diffusion
    return make_ddim_schedule(
        num_steps,
        d.timesteps,
        beta_schedule=d.beta_schedule,
        linear_start=d.linear_start,
        linear_end=d.linear_end,
        use_scale=d.use_scale,
        scale_a=d.scale_a,
        scale_b=d.scale_b,
        mid_step=d.mid_step,
    )


@partial(jax.jit, static_argnames=("model", "guidance_scale", "fps", "num_skip"))
def _basic_sample_loop(
    params,
    schedule: DDIMSchedule,
    latent: jnp.ndarray,
    context: jnp.ndarray,
    uncond: jnp.ndarray,
    *,
    model: LatentVideoDiffusion,
    guidance_scale: float,
    fps: int,
    num_skip: int = 0,
):
    """All DDIM steps in one scan; CFG packed into one 2-batch UNet call."""
    S = schedule.num_ddim_steps
    F = latent.shape[1]
    ctx2 = jnp.concatenate([context, uncond], axis=0)

    def body(lat, i):
        index = S - 1 - i - num_skip
        t = schedule.ddim_timesteps[index]
        x2 = jnp.concatenate([lat, lat], axis=0)
        eps = model.apply_unet(x2, jnp.full((2,), t), ctx2, fps, params=params)
        eps = eps[1:] + guidance_scale * (eps[:1] - eps[1:])
        lat, den = ddim_step(schedule, lat, eps, jnp.full((F,), index))
        return lat, den

    latent, dens = jax.lax.scan(body, latent, jnp.arange(S - num_skip))
    return latent, dens[-1]


def basic_sample(
    model: LatentVideoDiffusion,
    prompt: str,
    height: int = 320,
    width: int = 512,
    frames: int = 16,
    fps: int = 16,
    guidance_scale: float = 7.5,
    num_inference_steps: int = 48,
    key: Optional[jax.Array] = None,
    latents: Optional[jnp.ndarray] = None,
    skip_time_step_idx: Optional[int] = None,
    decode: bool = True,
):
    """Single-window t2v generation (t2v_normal_pipeline.py:70-212).

    Returns (video or None, denoised latent [1, F, h, w, C]).
    """
    sched = make_schedule_for_model(model, num_inference_steps)
    vs = model.config.vae.spatial_scale
    h, w = height // vs, width // vs

    context = model.encode_text([prompt])
    uncond = build_uncond_context(model, with_image=False)
    if model.config.unet.use_image_attention:
        raise ValueError("basic_sample is the t2v path; use i2v pipelines for image cond")

    if latents is None:
        assert key is not None, "need a PRNG key for the initial noise"
        latents = jax.random.normal(
            key, (1, frames, h, w, model.config.unet.in_channels)
        )
        assert not skip_time_step_idx, "skip requires a prepared latent"

    latent, denoised = _basic_sample_loop(
        model.params,
        sched,
        latents,
        context,
        uncond,
        model=model,
        guidance_scale=guidance_scale,
        fps=fps,
        num_skip=int(skip_time_step_idx or 0),
    )
    video = model.decode_video(denoised) if decode else None
    return video, denoised


@partial(jax.jit, static_argnames=("model", "guidance_scale", "fps"))
def _freetraj_sample_loop(
    params,
    schedule: DDIMSchedule,
    latent: jnp.ndarray,
    context: jnp.ndarray,
    uncond: jnp.ndarray,
    traj,
    traj_thres: jnp.ndarray,
    *,
    model: LatentVideoDiffusion,
    guidance_scale: float,
    fps: int,
):
    """basic_sample's scan with FreeTraj attention re-weighting: the
    trajectory state is re-gated per step from the current timestep
    (spatial masking only while t > thres; temporal re-weighting always)."""
    from dynamicscaler_tpu.ops import freetraj as freetraj_ops

    S = schedule.num_ddim_steps
    F = latent.shape[1]
    ctx2 = jnp.concatenate([context, uncond], axis=0)

    def body(lat, i):
        index = S - 1 - i
        t = schedule.ddim_timesteps[index]
        tr = freetraj_ops.gate_active(traj, jnp.full((2,), t), traj_thres, 2, F)
        x2 = jnp.concatenate([lat, lat], axis=0)
        eps = model.apply_unet(
            x2, jnp.full((2,), t), ctx2, fps, params=params, traj=tr
        )
        eps = eps[1:] + guidance_scale * (eps[:1] - eps[1:])
        lat, den = ddim_step(schedule, lat, eps, jnp.full((F,), index))
        return lat, den

    latent, dens = jax.lax.scan(body, latent, jnp.arange(S))
    return latent, dens[-1]


def freetraj_sample(
    model: LatentVideoDiffusion,
    prompt: str,
    traj_keyframes: Sequence[Sequence[float]],
    traj_token_ids: Optional[Sequence[int]] = None,
    traj_thres: float = 600.0,
    traj_classes: Tuple[bool, bool, bool] = (True, True, True),
    height: int = 320,
    width: int = 512,
    frames: int = 16,
    fps: int = 16,
    guidance_scale: float = 7.5,
    num_inference_steps: int = 48,
    key: Optional[jax.Array] = None,
    decode: bool = True,
):
    """Single-window t2v with FreeTraj trajectory control — a WORKING
    version of the reference's dead FreeTraj variant
    (lvdm/modules/attention_freetraj.py, openaimodel3d_freetraj.py; see
    ops/freetraj.py for the semantics and deviations).

    ``traj_keyframes``: rows (frame_idx | frac, h0, h1, w0, w1) — the
    foreground box path, fractions of the video extent.
    ``traj_token_ids``: prompt token positions of the target word
    (default [2]: first content token after BOS for a one-word subject).
    ``traj_classes``: (temporal_attn, self_attn, cross_attn).
    Returns (video or None, denoised latent [1, F, h, w, C]).
    """
    from dynamicscaler_tpu.ops import freetraj as freetraj_ops

    assert key is not None, "need a PRNG key for the initial noise"
    sched = make_schedule_for_model(model, num_inference_steps)
    vs = model.config.vae.spatial_scale
    h, w = height // vs, width // vs

    context = model.encode_text([prompt])
    uncond = build_uncond_context(model, with_image=False)
    if model.config.unet.use_image_attention:
        raise ValueError("freetraj_sample is a t2v path; i2v conditioning unsupported")

    traj = freetraj_ops.make_freetraj(
        traj_keyframes,
        frames,
        text_len=model.config.unet.text_context_len,
        fg_token_ids=traj_token_ids,
        batch=2,  # CFG-packed (cond, uncond)
        temporal_attn=traj_classes[0],
        self_attn=traj_classes[1],
        cross_attn=traj_classes[2],
    )

    latents = jax.random.normal(
        key, (1, frames, h, w, model.config.unet.in_channels)
    )
    latent, denoised = _freetraj_sample_loop(
        model.params,
        sched,
        latents,
        context,
        uncond,
        traj,
        jnp.asarray(traj_thres, jnp.float32),
        model=model,
        guidance_scale=guidance_scale,
        fps=fps,
    )
    video = model.decode_video(denoised) if decode else None
    return video, denoised


def sample_shift_multi_windows(
    model: LatentVideoDiffusion,
    prompt: str,
    num_windows_f: int = 1,
    num_windows_h: int = 1,
    num_windows_w: int = 1,
    height: int = 320,
    width: int = 512,
    frames: int = 16,
    fps: int = 16,
    guidance_scale: float = 7.5,
    num_inference_steps: int = 48,
    loop_step: Optional[int] = None,
    dock_at_h: bool = False,
    shift_jump_odd: Tuple[bool, bool, bool] = (False, False, False),
    docking: Tuple[bool, bool, bool] = (False, False, False),  # (f, h, w)
    docking_step_range: Optional[Sequence[int]] = None,
    merge_renoised_overlap_latent_ratio: Optional[float] = 1.0,
    merge_prev_denoised_ratio_list: Optional[Sequence[float]] = None,
    merge_predenoise_ratio_list: Optional[Sequence[float]] = None,
    sparse_add_residual: bool = True,
    random_shuffle_init_frame_stride: int = 0,
    init_panorama_latent: Optional[jnp.ndarray] = None,
    clear_pre_denoised_latent: Optional[jnp.ndarray] = None,
    use_pre_denoise: bool = False,
    pre_denoise_steps: int = 0,
    overlap_mode: str = "last",
    mesh=None,
    unet_microbatch: int = 8,
    key: Optional[jax.Array] = None,
    decode: bool = True,
):
    """Planar integer-grid shift-window t2v
    (t2v_normal_pipeline.py:214-570). The global latent is
    ``num_windows_* x`` the native window in each axis; every step denoises
    all windows in one batched program with cyclically shifting origins.

    ``use_pre_denoise``: generate a single-window clip first, upsample its
    latent to the global size and re-noise as init
    (t2v_normal_pipeline.py:348-403).
    """
    assert key is not None
    sched = make_schedule_for_model(model, num_inference_steps)
    vs = model.config.vae.spatial_scale
    wh, ww = height // vs, width // vs
    loop_step = loop_step or num_inference_steps

    grid = IntegerGrid(
        win_f=frames,
        win_h=wh,
        win_w=ww,
        num_windows_f=num_windows_f,
        num_windows_h=num_windows_h,
        num_windows_w=num_windows_w,
        loop_step=loop_step,
        dock_at_h=dock_at_h,
        shift_jump_odd_f=shift_jump_odd[0],
        shift_jump_odd_h=shift_jump_odd[1],
        shift_jump_odd_w=shift_jump_odd[2],
        docking_f=docking[0],
        docking_h=docking[1],
        docking_w=docking[2],
        docking_step_range=None if docking_step_range is None else tuple(docking_step_range),
    )
    total_f, total_h, total_w = grid.total_f, grid.total_h, grid.total_w

    context = model.encode_text([prompt])
    uncond = build_uncond_context(model, with_image=False)

    k_init, k_pre, k_run = jax.random.split(key, 3)
    resized_residual = None
    if init_panorama_latent is None:
        latent = jax.random.normal(
            k_init, (1, total_f, total_h, total_w, model.config.unet.in_channels)
        )
        if random_shuffle_init_frame_stride > 0:
            # shuffle init-noise frames beyond the first window in strided
            # groups (t2v_normal_pipeline.py:328-337; NOTE the reference's
            # indexing shuffles the H axis — dim 3 of BCFHW — by accident;
            # we shuffle frames, the documented intent)
            rng = np.random.default_rng(int(jax.random.randint(k_init, (), 0, 2**31 - 1)))
            order = np.arange(total_f)
            stride = random_shuffle_init_frame_stride
            for start in range(frames, total_f, stride):
                n = min(stride, total_f - start)
                src = order[start - frames : start - frames + n].copy()
                rng.shuffle(src)
                order[start : start + n] = src
            latent = latent[:, order]
        if use_pre_denoise:
            if clear_pre_denoised_latent is not None:
                small = clear_pre_denoised_latent
            else:
                _, small = basic_sample(
                    model,
                    prompt,
                    height=height,
                    width=width,
                    frames=frames,
                    fps=fps,
                    guidance_scale=guidance_scale,
                    num_inference_steps=num_inference_steps,
                    key=k_pre,
                    decode=False,
                )
            big = resize_video_latent(small, total_h, total_w, mode="bicubic")
            big = jnp.tile(big, (1, num_windows_f, 1, 1, 1))[:, :total_f]
            resized_residual = big
            latent = re_noise(
                sched, big, 0, num_inference_steps - 1, key=jax.random.fold_in(k_pre, 1)
            )
    else:
        latent = init_panorama_latent

    S = sched.num_ddim_steps
    plan: List[StepPlan] = []
    ddim_ts_np = np.asarray(sched.ddim_timesteps)  # one readback, not S
    for i in range(S):
        origins = np.asarray(grid.step_origins(i), np.int32)
        last = i == S - 1
        plan.append(
            StepPlan(
                t=int(ddim_ts_np[S - 1 - i]),
                index=S - 1 - i,
                origins=origins,
                # base [1, L, D]; the step program tiles to len(origins)
                # internally (planar._window_step — avoids per-shape host
                # broadcast programs through the remote tunnel)
                context=context,
                earlier_mask=None,  # generated on-device inside the step
                renoise_ratio=None if last else merge_renoised_overlap_latent_ratio,
                merge_prev_ratio=None
                if last or merge_prev_denoised_ratio_list is None
                else float(merge_prev_denoised_ratio_list[i]),
            )
        )

    engine = PlanarShiftWindowEngine(
        model,
        sched,
        (frames, wh, ww),
        guidance_scale=guidance_scale,
        fps=fps,
        overlap_mode=overlap_mode,
        mesh=mesh,
        unet_microbatch=unet_microbatch,
    )

    pre_step = None
    if use_pre_denoise and merge_predenoise_ratio_list is not None and resized_residual is not None:
        from dynamicscaler_tpu.ops.blend import checkerboard_mix

        residual = resized_residual

        @jax.jit
        def pre_step(latent, i, key):
            # per-step residual re-anchoring (t2v_normal_pipeline.py:445-468)
            ratio = jnp.asarray(merge_predenoise_ratio_list)[i]
            index = S - 1 - i
            noised = re_noise(sched, residual, 0, index, key=key)
            if sparse_add_residual:
                return checkerboard_mix(latent, noised, ratio, i)
            return latent * ratio + noised * (1.0 - ratio)

    latent, denoised = engine.run(latent, plan, uncond, k_run, pre_step=pre_step)
    video = model.decode_video(denoised) if decode else None
    return video, denoised
