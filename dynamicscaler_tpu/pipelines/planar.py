"""Planar shift-window denoising engine.

The TPU-native heart of DynamicScaler: one DDIM step over N overlapping
ring-windows is ONE jitted XLA program — windows are gathered from the
global latent as a batch, the UNet runs once on a ``2N`` CFG-packed batch,
and results scatter back — replacing the reference's sequential Python
window loop (i2v_sphere_panorama_pipeline.py:812-968,
i2v_normal_pipeline.py:254-413).

Overlap semantics (SURVEY §7 "hard part (a)"): the reference denoises
windows in order; window k+1 *reads* regions window k already wrote this
step, re-noises them (``merge_renoised_overlap_latent_ratio``) and later
merges back pre-step content (``merge_prev_denoised_ratio``), with
last-write-wins scatter. Three modes reproduce / redesign this:

* ``last`` (default): windows read the step-start snapshot; the
  order-dependent blends use precomputed earlier-window coverage masks, and
  the scatter is an ordered ``lax.scan`` (last-write-wins). Statistically
  equivalent to the reference; one UNet call per step.
* ``average``: commutative weighted scatter-average over overlaps (the
  blend the reference itself uses for tiled VAE encode,
  i2v_sphere_panorama_pipeline.py:546-560). Fully order-free.
* ``sequential``: exact reference ordering inside one jitted
  ``lax.scan`` — window k+1 reads window k's writes. Parity/testing mode
  (N UNet calls per step, still zero Python overhead).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from dynamicscaler_tpu.models.lvdm import LatentVideoDiffusion
from dynamicscaler_tpu.ops.ddim import DDIMSchedule, ddim_step, re_noise
from dynamicscaler_tpu.ops.ring import get_ring_window, set_ring_window, add_ring_window
from dynamicscaler_tpu.ops.blend import mix_with_mask, normalize_accumulated


def earlier_coverage_masks(
    origins: Sequence[Tuple[int, int, int]],
    sizes: Tuple[int, int, int],
    dims: Tuple[int, int, int],
) -> np.ndarray:
    """masks[k] = 1 where window k's footprint was already covered by
    windows < k in this step (the reference's within-step ``denoised_mask``
    as seen by window k, i2v_sphere_panorama_pipeline.py:858-871)."""
    F, H, W = dims
    fs, hs, ws = sizes
    cov = np.zeros((F, H, W), bool)
    masks = np.zeros((len(origins), fs, hs, ws, 1), np.float32)
    for k, (f0, h0, w0) in enumerate(origins):
        fi = (np.arange(fs) + f0) % F
        hi = (np.arange(hs) + h0) % H
        wi = (np.arange(ws) + w0) % W
        masks[k, ..., 0] = cov[np.ix_(fi, hi, wi)]
        cov[np.ix_(fi, hi, wi)] = True
    return masks


def device_earlier_masks(origins, sizes, latent_like):
    """On-device twin of :func:`earlier_coverage_masks`: pure index math over
    the (traced) origin array, generated inside the jitted step instead of
    host numpy + a tens-of-MB per-step upload. Returns [N, f, h, w, 1]."""
    fs, hs, ws = sizes

    def body(cov, origin):
        m = get_ring_window(cov, tuple(origin), sizes)[0]
        cov = set_ring_window(
            cov, jnp.ones((1, fs, hs, ws, 1), cov.dtype), tuple(origin)
        )
        return cov, m

    cov0 = jnp.zeros(latent_like.shape[:-1] + (1,), jnp.float32)
    _, masks = jax.lax.scan(body, cov0, origins)
    return masks


@dataclasses.dataclass(frozen=True)
class StepPlan:
    """Host-precomputed data for one DDIM step of the window loop."""

    t: int  # DDPM timestep fed to the UNet
    index: int  # DDIM table index (total_steps - i - 1)
    origins: np.ndarray  # [N, 3] int32 (f0, h0, w0)
    context: jnp.ndarray  # per-window cond context (see _window_step forms)
    earlier_mask: Optional[np.ndarray]  # [N, f, h, w, 1] or None
    renoise_ratio: Optional[float]
    merge_prev_ratio: Optional[float]
    # optional [N] int32 row ids into a shared all-phases context bank
    # (context then holds the bank; rows resolve in-program)
    ctx_idx: Optional[np.ndarray] = None


_STEP_FN_CACHE: dict = {}

# steady-state rate of the most recent run() loop (utils/timing.LoopStats);
# read by gen_pano_360's e2e artifact
from dynamicscaler_tpu.utils.timing import LoopStats

LOOP_STATS = LoopStats()


class PlanarShiftWindowEngine:
    def __init__(
        self,
        model: LatentVideoDiffusion,
        schedule: DDIMSchedule,
        window_sizes: Tuple[int, int, int],
        guidance_scale: float = 7.5,
        fps: int = 16,
        overlap_mode: str = "last",
        mesh=None,
        unet_microbatch: int = 8,
    ):
        assert overlap_mode in ("last", "average", "sequential")
        self.model = model
        self.schedule = schedule
        self.window_sizes = window_sizes
        self.guidance_scale = guidance_scale
        self.fps = fps
        self.overlap_mode = overlap_mode
        self.mesh = mesh
        # one jit object per static signature, shared across engine
        # instances: an AOT warm run (gen_pano_360 background thread) and the
        # real stage call then share one compiled executable — compiles
        # through the axon tunnel cost minutes and the persistent disk cache
        # does not shortcut the remote compiler (measured, dev/probe_aot.py)
        ck = (
            id(model), window_sizes, guidance_scale, fps, overlap_mode,
            None if mesh is None else id(mesh), unet_microbatch,
        )
        hit = _STEP_FN_CACHE.get(ck)
        if hit is None:
            step_partial = partial(
                _window_step,
                model=model,
                sizes=window_sizes,
                guidance=guidance_scale,
                fps=fps,
                mode=overlap_mode,
                mesh=mesh,
                unet_microbatch=unet_microbatch,
            )
            if mesh is None:
                # persistent trace cache: warm processes skip the minutes of
                # client-side tracing/lowering of this program entirely
                # (utils/progcache.py; measured in BENCH_NOTES round-4)
                from dynamicscaler_tpu.utils import progcache

                fn = progcache.cached_jit(
                    step_partial,
                    name="planar_step",
                    fingerprint=progcache.obj_fingerprint(
                        model.config, window_sizes, guidance_scale, fps,
                        overlap_mode, unet_microbatch,
                    ),
                    # the previous step's latent/denoised buffers are dead
                    # after the call — donate them so giant panoramas update
                    # in place
                    donate_argnums=(2, 3),
                )
            else:
                # exported modules pin device assignments; mesh runs keep
                # plain jit (multi-chip launches are long-lived anyway)
                fn = jax.jit(step_partial, donate_argnums=(2, 3))
            # keep model/mesh alive so the id() keys can't be reused
            _STEP_FN_CACHE[ck] = (fn, model, mesh)
            hit = _STEP_FN_CACHE[ck]
        self._step_fn = hit[0]

    def run(
        self,
        latent: jnp.ndarray,  # [1, F, H, W, C]
        plan: Sequence[StepPlan],
        uncond_context: jnp.ndarray,  # [1, L, D]
        key: jax.Array,
        params=None,
        pre_step=None,  # optional callable(latent, i, key) -> latent
        warm_only: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Run the full window-denoise loop. Returns (latent, denoised).

        ``warm_only``: execute ONE dummy step per distinct plan signature
        instead of the loop — populates this step program's jit dispatch
        cache (compile + device load) so a later real run pays none of it.
        The compile runs on the host/tunnel and overlaps chip compute from
        other threads (measured: a full UNet program compiled in 191s while
        the chip ran 83 other iterations, dev/probe_aot.py)."""
        params = params if params is not None else self.model.params
        # step buffers are donated (in-place update chain); copy once so the
        # caller's init latent stays valid
        latent = jnp.array(latent, copy=True)
        denoised = jnp.zeros_like(latent)

        if warm_only:
            from dynamicscaler_tpu.utils.timing import Marker

            _wm = Marker("planar-warm")
            seen = set()
            for i, sp in enumerate(plan):
                sig = (len(sp.origins), sp.context.shape, sp.earlier_mask is None)
                if sig in seen:
                    continue
                seen.add(sig)
                latent, denoised = self._step_fn(
                    params, self.schedule, latent, denoised,
                    jnp.asarray(sp.origins, jnp.int32),
                    None if sp.earlier_mask is None else jnp.asarray(sp.earlier_mask),
                    sp.context, uncond_context,
                    jnp.asarray(sp.t, jnp.int32), jnp.asarray(sp.index, jnp.int32),
                    jnp.asarray(0.0), jnp.asarray(0.0),
                    jax.random.fold_in(key, i),
                    None if sp.ctx_idx is None else jnp.asarray(sp.ctx_idx),
                )
                _wm.lap(f"sig {sig}", block=latent if _wm.on else None)
            return latent, denoised
        from dynamicscaler_tpu.utils.timing import Marker

        _tm = Marker("planar")
        LOOP_STATS.start(len(plan))
        for i, sp in enumerate(plan):
            step_key = jax.random.fold_in(key, i)
            if pre_step is not None:
                latent = pre_step(latent, i, jax.random.fold_in(step_key, 7))
            latent, denoised = self._step_fn(
                params,
                self.schedule,
                latent,
                denoised,
                jnp.asarray(sp.origins, jnp.int32),
                None if sp.earlier_mask is None else jnp.asarray(sp.earlier_mask),
                sp.context,
                uncond_context,
                jnp.asarray(sp.t, jnp.int32),
                jnp.asarray(sp.index, jnp.int32),
                jnp.asarray(0.0 if sp.renoise_ratio is None else sp.renoise_ratio),
                jnp.asarray(0.0 if sp.merge_prev_ratio is None else sp.merge_prev_ratio),
                step_key,
                None if sp.ctx_idx is None else jnp.asarray(sp.ctx_idx),
            )
            _tm.lap(f"step {i}/{len(plan)} N={len(sp.origins)}",
                    block=latent if _tm.on else None)
            if i == 0:
                LOOP_STATS.mark_first(latent)
        LOOP_STATS.finish(latent)
        return latent, denoised


def _window_step(
    params,
    schedule: DDIMSchedule,
    latent: jnp.ndarray,
    denoised_buf: jnp.ndarray,
    origins: jnp.ndarray,  # [N, 3]
    earlier_mask,  # [N, f, h, w, 1] or None
    context: jnp.ndarray,  # [N, L, D]
    uncond_context: jnp.ndarray,  # [1, L, D]
    t,
    index,
    renoise_ratio,
    merge_prev_ratio,
    key,
    ctx_idx=None,  # [N] int32 rows into a shared context bank, or None
    *,
    model: LatentVideoDiffusion,
    sizes,
    guidance,
    fps,
    mode,
    mesh=None,
    unet_microbatch: int = 0,
):
    from dynamicscaler_tpu.parallel.mesh import constrain_latent, constrain_window_batch

    # global pano latent rides the mesh 'seq' axis along W (ring <-> ring ICI)
    latent = constrain_latent(latent, mesh)
    denoised_buf = constrain_latent(denoised_buf, mesh)

    N = origins.shape[0]
    # Per-window conds resolve INSIDE the program — host-side slicing /
    # tiling would each be a tiny XLA program or transfer whose remote
    # round trips through the axon tunnel cost 0.4-25s apiece (see
    # pipelines/i2v.py). Two forms:
    #  * ctx_idx given: context is an all-phases bank; gather rows;
    #  * else: context is one base block [N_base, L, D] with N_base
    #    dividing N (frame-window repeats of per-spatial-window conds, or
    #    a single shared prompt) — tile to N. Origins order is
    #    spatial-fastest per frame block, matching tile().
    if ctx_idx is not None:
        context = context[ctx_idx]
    elif context.shape[0] != N:
        context = jnp.tile(context, (N // context.shape[0], 1, 1))
    fs, hs, ws = sizes
    frame_idx = jnp.full((fs,), index, jnp.int32)

    def unet_eps(x, cc):
        return model.apply_unet_microbatched(
            x, t, cc, fps, params=params, microbatch=unet_microbatch
        )

    def denoise_batch(wins, ctx):
        """wins [n, f, h, w, C] -> (x_prev, pred_x0); one CFG-packed UNet call,
        window batch sharded over the mesh 'data' axis."""
        n = wins.shape[0]
        if guidance != 1.0:
            x = jnp.concatenate([wins, wins], axis=0)
            uc = jnp.broadcast_to(uncond_context, (n,) + uncond_context.shape[1:])
            cc = jnp.concatenate([ctx, uc], axis=0)
            x = constrain_window_batch(x, mesh)
            eps = unet_eps(x, cc)
            eps = eps[n:] + guidance * (eps[:n] - eps[n:])
        else:
            wins_s = constrain_window_batch(wins, mesh)
            eps = unet_eps(wins_s, ctx)
        return ddim_step(schedule, wins, eps, frame_idx)

    if mode == "sequential":
        # exact reference ordering: each window reads prior windows' writes
        def body(carry, xs):
            lat, den, mask_global = carry
            origin, ctx, k = xs
            win = get_ring_window(lat, tuple(origin), sizes)
            mask_win = get_ring_window(mask_global, tuple(origin), sizes)
            prev = win
            noised = re_noise(
                schedule, win, index - 1, index, key=jax.random.fold_in(key, k)
            )
            win = mix_with_mask(win, noised, mask_win, renoise_ratio)
            new, den_w = denoise_batch(win[0][None], ctx[None])
            new, den_w = new[0][None], den_w[0][None]
            new = mix_with_mask(new, prev, mask_win, merge_prev_ratio)
            lat = set_ring_window(lat, new, tuple(origin))
            den = set_ring_window(den, den_w, tuple(origin))
            mask_global = set_ring_window(
                mask_global, jnp.ones_like(new), tuple(origin)
            )
            return (lat, den, mask_global), None

        mask0 = jnp.zeros_like(latent)
        (latent, denoised_buf, _), _ = jax.lax.scan(
            body, (latent, denoised_buf, mask0), (origins, context, jnp.arange(N))
        )
        return latent, denoised_buf

    # snapshot modes: gather all windows at once
    def gather(origin):
        return get_ring_window(latent, (origin[0], origin[1], origin[2]), sizes)[0]

    wins = jax.vmap(gather)(origins)  # [N, f, h, w, C]
    prev = wins

    if earlier_mask is None and mode == "last":
        # pure index math — generated in-program from the origins instead of
        # host numpy + per-step upload
        earlier_mask = device_earlier_masks(origins, sizes, latent)

    if mode == "last":
        # ratios are traced (0.0 = no-op mix): one step program for every
        # step of the schedule, so the expensive first-call program load
        # happens once instead of once per renoise/merge variant
        # clamp: on the final step index-1 == -1 and renoise_ratio == 0.0 —
        # the result is discarded by the no-op mix, but the table read must
        # not rely on XLA's out-of-bounds gather clamping (ADVICE r2)
        noised = re_noise(schedule, wins, jnp.maximum(index - 1, 0), index, key=key)
        wins = mix_with_mask(wins, noised, earlier_mask, renoise_ratio)

    new, den = denoise_batch(wins, context)

    if mode == "last":
        new = mix_with_mask(new, prev, earlier_mask, merge_prev_ratio)

    if mode == "average":
        accum = jnp.zeros_like(latent)
        count = jnp.zeros(latent.shape[:-1] + (1,), latent.dtype)
        dac = jnp.zeros_like(latent)

        def body(carry, xs):
            accum, count, dac = carry
            origin, w, d = xs
            accum = add_ring_window(accum, w[None], tuple(origin))
            count = add_ring_window(count, jnp.ones_like(w[None, ..., :1]), tuple(origin))
            dac = add_ring_window(dac, d[None], tuple(origin))
            return (accum, count, dac), None

        (accum, count, dac), _ = jax.lax.scan(body, (accum, count, dac), (origins, new, den))
        latent = normalize_accumulated(accum, count, latent)
        denoised_buf = normalize_accumulated(dac, count, denoised_buf)
        return latent, denoised_buf

    # mode == "last": ordered scatter, last write wins (reference order)
    def body(carry, xs):
        lat, den = carry
        origin, w, d = xs
        lat = set_ring_window(lat, w[None], tuple(origin))
        den = set_ring_window(den, d[None], tuple(origin))
        return (lat, den), None

    (latent, denoised_buf), _ = jax.lax.scan(body, (latent, denoised_buf), (origins, new, den))
    return latent, denoised_buf
