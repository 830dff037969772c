"""Spherical (equirectangular) panorama shift-window denoising — the
flagship stage-1 algorithm.

Reference: ``VC2_Pipeline_I2V_SpherePano.basic_sample_shift_shpere_panorama``
(i2v_sphere_panorama_pipeline.py:32-496) and the t2v variant
(t2v_sphere_panorama_pipeline.py:24-316). TPU redesign:

* The (phi, theta) view set per step depends only on the step phase
  ``i % loop_step_theta`` — all projection index maps AND all per-view CLIP
  conditionings (pano-crop image embeds + per-phi prompts) are precomputed
  per phase. The reference runs ~1,320 CLIP image forwards + ~660 text
  forwards per clip; here it is ``loop_step_theta`` batched forwards total.
* One DDIM step = one jitted program: batched view gather, 2N CFG-packed
  UNet call, vectorized DDIM, ordered (or averaged) scatter.
* ``paste_on_static`` re-anchoring: the clean pano latent is tiled-VAE
  encoded ONCE (the reference re-encodes the same image every step,
  i2v_sphere_panorama_pipeline.py:245-254) and re-noised to the current
  level inside the step program.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from dynamicscaler_tpu.models.lvdm import LatentVideoDiffusion
from dynamicscaler_tpu.ops.ddim import DDIMSchedule, ddim_step, re_noise, re_noise_per_frame
from dynamicscaler_tpu.ops.blend import mix_with_mask, normalize_accumulated
from dynamicscaler_tpu.ops.ring import wrap_slice_indices
from dynamicscaler_tpu.ops.resize import resize_video_latent
from dynamicscaler_tpu.ops.sphere import make_sphere_views
from dynamicscaler_tpu.pipelines.conditioning import (
    build_uncond_context,
    cat_text_image,
    encode_texts_cached,
)
from dynamicscaler_tpu.pipelines.t2v import make_schedule_for_model
from dynamicscaler_tpu.pipelines.tiled_vae import tiled_vae_encode
from dynamicscaler_tpu.core.windows import frame_window_origins, sphere_phase_views
from dynamicscaler_tpu.utils.timing import LoopStats

# steady-state rate of the most recent sphere loop; read by gen_pano_360's
# e2e artifact (wall-clock alone is tunnel-RPC noisy, BENCH_NOTES.md)
LOOP_STATS = LoopStats()

# one cached-jit step object per static signature, shared across sampler
# calls in a process (AOT warm + real stage share one program; see planar's
# _STEP_FN_CACHE for the measured rationale). Values keep the model alive
# so id() keys can't be reused.
_SPHERE_STEP_CACHE: dict = {}


# ---------------------------------------------------------------------------
# host-side precomputation
# ---------------------------------------------------------------------------


def _phase_view_maps(
    phase_views: Dict[int, List[Tuple[float, float]]],
    view_fov: float,
    lat_h: int,
    lat_w: int,
    eq_lat_h: int,
    eq_lat_w: int,
    phi_fov_dict: Optional[Dict[float, float]] = None,
):
    """Per phase: stacked latent-space gather/scatter index maps [Nv, h, w].
    ``phi_fov_dict`` overrides the FOV per phi row
    (t2v_sphere_panorama_pipeline.py:189-192)."""
    fov_of = lambda phi: (phi_fov_dict or {}).get(phi, view_fov)
    out = {}
    for phase, views in phase_views.items():
        svs = make_sphere_views(
            [(fov_of(phi), theta, phi) for (phi, theta) in views],
            lat_h, lat_w, eq_lat_h, eq_lat_w,
        )
        out[phase] = dict(
            gather=jnp.asarray(np.stack([v.gather_idx for v in svs])),
            scatter=jnp.asarray(np.stack([v.scatter_idx for v in svs])),
            valid=jnp.asarray(np.stack([v.valid for v in svs]).astype(np.float32)),
            scatter_np=np.stack([v.scatter_idx for v in svs]),
            gather_np=np.stack([v.gather_idx for v in svs]),
            valid_np=np.stack([v.valid for v in svs]),
        )
    return out


def sphere_earlier_masks(
    scatter_idx: np.ndarray,  # [Nv, hs, ws] write footprint (eq_pixels = invalid)
    f_origins: Sequence[int],
    frames: int,
    total_f: int,
    eq_pixels: int,
    gather_idx: np.ndarray = None,  # [Nv, h, w] read positions (native res)
    gather_valid: np.ndarray = None,
) -> np.ndarray:
    """Earlier-window coverage mask per (frame-window, view) pair, pano-pixel
    accurate (the within-step ``denoised_mask`` each view sees,
    i2v_sphere_panorama_pipeline.py:345-365).

    Coverage is WRITTEN with each window's scatter footprint (at the
    set-scale resolution) and READ at the native view resolution via the
    gather maps — mirroring the reference's mask get/set pair. With unit
    scale factors, ``gather_idx`` defaults to reading through the scatter
    map itself.
    """
    Nv = scatter_idx.shape[0]
    if gather_idx is None:
        gather_idx = scatter_idx
        gather_valid = scatter_idx < eq_pixels
    h, w = gather_idx.shape[1:]
    pairs = [(f0, v) for f0 in f_origins for v in range(Nv)]
    cov = np.zeros((total_f, eq_pixels), bool)
    masks = np.zeros((len(pairs), frames, h, w, 1), np.float32)
    for k, (f0, v) in enumerate(pairs):
        fi = (np.arange(frames) + f0) % total_f
        gidx = gather_idx[v].reshape(-1).clip(0)
        gval = gather_valid[v].reshape(-1)
        m = cov[np.ix_(fi, np.minimum(gidx, eq_pixels - 1))]  # [frames, h*w]
        masks[k, ..., 0] = (m & gval[None, :]).reshape(frames, h, w)
        sidx = scatter_idx[v]
        svalid = sidx < eq_pixels
        cov[np.ix_(fi, np.unique(sidx[svalid]))] = True
    return masks


def device_sphere_masks(
    mask_gather_idx: jnp.ndarray,  # [Nv, h, w] native-res read map
    mask_valid: jnp.ndarray,  # [Nv, h, w] float
    scatter_idx: jnp.ndarray,  # [Nv, hs, ws] write footprint
    pair_view: jnp.ndarray,  # [Nw]
    pair_f: jnp.ndarray,  # [Nw]
    frames: int,
    total_f: int,
    eq_pixels: int,
) -> jnp.ndarray:
    """On-device twin of :func:`sphere_earlier_masks` — the within-step
    earlier-view coverage (reference denoised_mask,
    i2v_sphere_panorama_pipeline.py:345-365), generated in-program: coverage
    is written with each pair's scatter footprint and read back through the
    native-resolution gather maps. Pure index math — replaces host numpy +
    a tens-of-MB per-step upload. Returns [Nw, frames, h, w, 1]."""
    mh, mw = mask_gather_idx.shape[1:]

    def body(cov, xs):
        v_idx, f0 = xs
        fi = wrap_slice_indices(f0, frames, total_f)
        gi = jnp.minimum(mask_gather_idx[v_idx].reshape(-1), eq_pixels - 1)
        gval = mask_valid[v_idx].reshape(-1)
        m = cov[fi][:, gi] * gval[None, :]
        si = scatter_idx[v_idx].reshape(-1)
        cov = cov.at[fi[:, None], si[None, :]].set(1.0, mode="drop")
        return cov, m

    cov0 = jnp.zeros((total_f, eq_pixels), jnp.float32)
    _, masks = jax.lax.scan(body, cov0, (pair_view, pair_f))
    return masks.reshape(pair_view.shape[0], frames, mh, mw, 1)


# ---------------------------------------------------------------------------
# jitted step
# ---------------------------------------------------------------------------


def _sphere_step_sequential(
    params,
    schedule: DDIMSchedule,
    latent: jnp.ndarray,  # [1, F, eqh, eqw, C]
    denoised_buf: jnp.ndarray,
    static_clean: jnp.ndarray,
    gather_idx: jnp.ndarray,
    scatter_idx: jnp.ndarray,
    valid: jnp.ndarray,
    pair_view: jnp.ndarray,
    pair_f: jnp.ndarray,
    mask_gather_idx: jnp.ndarray,
    mask_valid: jnp.ndarray,
    context: jnp.ndarray,  # [Nw, L, D]
    uncond_context: jnp.ndarray,
    t,
    index,
    renoise_ratio,
    merge_prev_ratio,
    paste_on_static_flag,
    key,
    *,
    model: LatentVideoDiffusion,
    frames: int,
    guidance: float,
    fps: int,
    get_scale: int = 1,
    set_scale: int = 1,
):
    """Reference-exact sequential ordering of one sphere step
    (i2v_sphere_panorama_pipeline.py:279-471): each (frame-window, view)
    pair gathers from the CURRENT pano latent — seeing prior pairs' writes
    — applies the denoised-mask renoise merge, denoises, merge-prev mixes,
    and scatters into BOTH the gather source and the paste target (the
    re-noised static pano when paste_on_static, :245-254,443-451). The
    within-step coverage mask is written with each pair's set-scale
    footprint and read at native view resolution (:341-365,453-462).

    This is the oracle-matching twin of the batched ``last`` mode (which
    gathers all views from the step-start latent); tests/test_loop_parity.py
    drives the reference ``RingPanoramaTensor`` + scheduler against it.
    """
    B, F, EH, EW, C = latent.shape
    h, w = gather_idx.shape[1:]
    mh, mw = mask_gather_idx.shape[1:]
    frame_idx = jnp.full((frames,), index, jnp.int32)

    clean = jnp.broadcast_to(static_clean, (B, F) + static_clean.shape[2:])
    renoised_static = re_noise(
        schedule, clean, 0, index, key=jax.random.fold_in(key, 1)
    )
    # paste target starts from the re-noised static pano (or the latent when
    # paste is off — then tgt and lat receive identical writes)
    tgt0 = jnp.where(paste_on_static_flag, renoised_static, latent)

    lat_flat = latent.reshape(F, EH * EW, C)
    tgt_flat = tgt0.reshape(F, EH * EW, C)
    den_flat = denoised_buf.reshape(F, EH * EW, C)
    cov0 = jnp.zeros((F, EH * EW), jnp.float32)

    def body(carry, xs):
        lat, tgt, den, cov = carry
        v_idx, f0, ctx_k, k = xs
        fi = wrap_slice_indices(f0, frames, F)

        gi = gather_idx[v_idx].reshape(-1)
        win = lat[fi][:, gi, :] * valid[v_idx].reshape(1, -1, 1)
        win = win.reshape(1, frames, h, w, C)
        if get_scale != 1:
            win = resize_video_latent(
                win, h // get_scale, w // get_scale, mode="nearest"
            )
        prev = win

        mgi = jnp.minimum(mask_gather_idx[v_idx].reshape(-1), EH * EW - 1)
        m = (cov[fi][:, mgi] * mask_valid[v_idx].reshape(-1)[None, :])
        m = m.reshape(1, frames, mh, mw, 1)

        noised = re_noise(
            schedule, win, jnp.maximum(index - 1, 0), index,
            key=jax.random.fold_in(key, k + 2),
        )
        win = mix_with_mask(win, noised, m, renoise_ratio)

        if guidance != 1.0:
            x2 = jnp.concatenate([win, win], axis=0)
            cc = jnp.concatenate([ctx_k[None], uncond_context[:1]], axis=0)
            eps = model.apply_unet(x2, jnp.full((2,), t), cc, fps, params=params)
            eps = eps[1:] + guidance * (eps[:1] - eps[1:])
        else:
            eps = model.apply_unet(win, jnp.full((1,), t), ctx_k[None], fps, params=params)
        new, den_w = ddim_step(schedule, win, eps, frame_idx)

        new = mix_with_mask(new, prev, m, merge_prev_ratio)

        if set_scale != 1:
            nh = (h // get_scale) * set_scale
            nw = (w // get_scale) * set_scale
            new = resize_video_latent(new, nh, nw, mode="nearest")
            den_w = resize_video_latent(den_w, nh, nw, mode="nearest")

        si = scatter_idx[v_idx].reshape(-1)
        wn = new.reshape(frames, -1, C)
        wd = den_w.reshape(frames, -1, C)
        lat = lat.at[fi[:, None], si[None, :], :].set(wn, mode="drop")
        tgt = tgt.at[fi[:, None], si[None, :], :].set(wn, mode="drop")
        den = den.at[fi[:, None], si[None, :], :].set(wd, mode="drop")
        cov = cov.at[fi[:, None], si[None, :]].set(1.0, mode="drop")
        return (lat, tgt, den, cov), None

    (lat_flat, tgt_flat, den_flat, _), _ = jax.lax.scan(
        body, (lat_flat, tgt_flat, den_flat, cov0),
        (pair_view, pair_f, context, jnp.arange(pair_view.shape[0])),
    )
    out = jnp.where(paste_on_static_flag, tgt_flat, lat_flat)
    return out.reshape(latent.shape), den_flat.reshape(latent.shape)


def _sphere_step(
    params,
    schedule: DDIMSchedule,
    latent: jnp.ndarray,  # [1, F, eqh, eqw, C]
    denoised_buf: jnp.ndarray,
    static_clean: jnp.ndarray,  # [1, 1, eqh, eqw, C] (zeros if unused)
    gather_idx: jnp.ndarray,  # [Nv, h, w]
    scatter_idx: jnp.ndarray,  # [Nv, h, w]
    valid: jnp.ndarray,  # [Nv, h, w] float
    f_origins: jnp.ndarray,  # [Nf]
    pair_view: jnp.ndarray,  # [Nw] view index per pair
    pair_f: jnp.ndarray,  # [Nw] frame origin per pair
    mask_gather_idx: jnp.ndarray,  # [Nv, h, w] native-res coverage read map
    mask_valid: jnp.ndarray,  # [Nv, h, w] float
    context: jnp.ndarray,  # [Nw, L, D]
    uncond_context: jnp.ndarray,
    t,
    index,
    renoise_ratio,
    merge_prev_ratio,
    paste_on_static_flag,  # traced bool scalar
    key,
    pair_ctx=None,  # [Nw] global view ids into an all-phases context bank
    *,
    model: LatentVideoDiffusion,
    frames: int,
    guidance: float,
    fps: int,
    mode: str,
    unet_microbatch: int = 0,
    mesh=None,
    get_scale: int = 1,
    set_scale: int = 1,
):
    # Per-pair conds resolve INSIDE the program — host-side per-(phase, nf)
    # slicing/tiling would each be a tiny XLA program / transfer whose
    # remote tunnel round trips cost 0.4-25s apiece (see pipelines/i2v.py
    # plan loop). Two forms:
    #  * pair_ctx given: context is the all-phases bank [V_total, L, D];
    #    gather rows by global view id (sampler loop path);
    #  * else: context is the per-view block [Nv, L, D]; tile to the
    #    (frame-window x view) pair count (pair order is view-fastest per
    #    frame block, matching tile) — direct callers/tests.
    if pair_ctx is not None:
        context = context[pair_ctx]
    elif context.shape[0] != pair_view.shape[0]:
        context = jnp.tile(
            context, (pair_view.shape[0] // context.shape[0], 1, 1)
        )

    if mode == "sequential":
        return _sphere_step_sequential(
            params, schedule, latent, denoised_buf, static_clean,
            gather_idx, scatter_idx, valid, pair_view, pair_f,
            mask_gather_idx, mask_valid, context, uncond_context,
            t, index, renoise_ratio, merge_prev_ratio,
            paste_on_static_flag, key,
            model=model, frames=frames, guidance=guidance, fps=fps,
            get_scale=get_scale, set_scale=set_scale,
        )

    B, F, EH, EW, C = latent.shape
    Nw = pair_view.shape[0]
    h, w = gather_idx.shape[1:]
    mh, mw = mask_gather_idx.shape[1:]

    # --- seq ('ring') sharding: the pano latent stays split along W ---------
    # The round-2 flat [F, EH*EW, C] layout forced GSPMD to all-gather the
    # full latent at every reshape (VERDICT r2 #5). Instead the gather /
    # coverage-mask / scatter phases run per W-slab under shard_map with
    # global->slab index remapping; cross-slab reads resolve with one
    # window-batch-sized psum over 'seq' — never a latent-sized collective.
    n_seq = int(dict(mesh.shape).get("seq", 1)) if mesh is not None else 1
    EWl = EW // n_seq

    def _slab_cols(idx_flat, w0, *, sentinel_ok=None):
        """Global flat pano index -> (slab flat index, in-slab mask).
        Entries outside the slab (or already out-of-bounds sentinels) map to
        the OOB-positive sentinel EH*EWl (scatter mode='drop' WRAPS negative
        indices — BENCH_NOTES)."""
        r = idx_flat // EW
        c = idx_flat % EW - w0
        ok = (c >= 0) & (c < EWl)
        if sentinel_ok is not None:
            ok = ok & sentinel_ok
        return jnp.where(ok, r * EWl + jnp.clip(c, 0, EWl - 1), EH * EWl), ok

    def gather_phase(lat5):
        """lat5: [F, EH, EWl, C] local slab -> (partial wins, partial masks);
        cross-slab entries are zero (summed by the caller's psum)."""
        w0 = (jax.lax.axis_index("seq") * EWl) if n_seq > 1 else 0
        flat = lat5.reshape(F, EH * EWl, C)

        def gather_one(v_idx, f0):
            fi = wrap_slice_indices(f0, frames, F)
            gi = gather_idx[v_idx].reshape(-1)
            gil, ok = _slab_cols(gi, w0)
            gil = jnp.minimum(gil, EH * EWl - 1)
            win = flat[fi][:, gil, :]
            win = win * (valid[v_idx].reshape(1, -1, 1) * ok.reshape(1, -1, 1))
            return win.reshape(frames, h, w, C)

        wins = jax.vmap(gather_one)(pair_view, pair_f)  # [Nw, frames, h, w, C]

        # within-step earlier-view coverage (reference denoised_mask,
        # i2v_sphere_panorama_pipeline.py:345-365): written with each pair's
        # scatter footprint, read at native view resolution — slab-local
        cov0 = jnp.zeros((F, EH * EWl), jnp.float32)

        def mbody(cov, xs):
            v_idx, f0 = xs
            fi = wrap_slice_indices(f0, frames, F)
            mgi = mask_gather_idx[v_idx].reshape(-1)
            mgil, mok = _slab_cols(mgi, w0)
            mgil = jnp.minimum(mgil, EH * EWl - 1)
            m = cov[fi][:, mgil] * (mask_valid[v_idx].reshape(-1) * mok)[None, :]
            si = scatter_idx[v_idx].reshape(-1)
            sil, _ = _slab_cols(si, w0, sentinel_ok=si < EH * EW)
            cov = cov.at[fi[:, None], sil[None, :]].set(1.0, mode="drop")
            return cov, m

        _, masks = jax.lax.scan(mbody, cov0, (pair_view, pair_f))
        masks = masks.reshape(Nw, frames, mh, mw, 1)
        if n_seq > 1:
            wins = jax.lax.psum(wins, "seq")
            masks = jax.lax.psum(masks, "seq")
        return wins, masks

    from jax.sharding import PartitionSpec as P

    if n_seq > 1:
        from jax import shard_map

        slab = P(None, None, "seq", None)
        wins, earlier_mask = shard_map(
            gather_phase, mesh=mesh, in_specs=(slab,), out_specs=(P(), P()),
            check_vma=False,
        )(latent[0])
    else:
        wins, earlier_mask = gather_phase(latent[0])

    if get_scale != 1:
        gh, gw = wins.shape[2] // get_scale, wins.shape[3] // get_scale
        wins = resize_video_latent(wins, gh, gw, mode="nearest")
    prev = wins
    # clamp: final step has index-1 == -1 with renoise_ratio 0.0 — discarded
    # by the no-op mix; don't rely on XLA gather clamping (ADVICE r2)
    noised = re_noise(schedule, wins, jnp.maximum(index - 1, 0), index, key=key)
    wins = mix_with_mask(wins, noised, earlier_mask, renoise_ratio)

    frame_idx = jnp.full((frames,), index, jnp.int32)

    from dynamicscaler_tpu.parallel.mesh import constrain_window_batch

    if guidance != 1.0:
        x_all = jnp.concatenate([wins, wins], axis=0)
        uc = jnp.broadcast_to(uncond_context, (Nw,) + uncond_context.shape[1:])
        ctx_all = jnp.concatenate([context, uc], axis=0)
    else:
        x_all, ctx_all = wins, context
    x_all = constrain_window_batch(x_all, mesh)  # view batch over mesh 'data'

    eps = model.apply_unet_microbatched(
        x_all, t, ctx_all, fps, params=params, microbatch=unet_microbatch
    )

    if guidance != 1.0:
        eps = eps[Nw:] + guidance * (eps[:Nw] - eps[Nw:])

    new, den = ddim_step(schedule, wins, eps, frame_idx)

    new = mix_with_mask(new, prev, earlier_mask, merge_prev_ratio)

    if set_scale != 1:
        sh, sw = new.shape[2] * set_scale, new.shape[3] * set_scale
        new = resize_video_latent(new, sh, sw, mode="nearest")
        den = resize_video_latent(den, sh, sw, mode="nearest")

    # scatter target: re-noised static pano (paste_on_static) or the latent
    # (traced select — keeps one program for paste and non-paste steps)
    clean = jnp.broadcast_to(static_clean, (B, F) + static_clean.shape[2:])
    renoised_static = re_noise(
        schedule, clean, 0, index, key=jax.random.fold_in(key, 1)
    )
    target = jnp.where(paste_on_static_flag, renoised_static, latent)

    def scatter_phase(tgt5, den5, new, den):
        """tgt5/den5: [F, EH, EWl, C] local slabs; new/den: the full window
        batch (replicated — the one expected window-batch collective)."""
        w0 = (jax.lax.axis_index("seq") * EWl) if n_seq > 1 else 0
        tgt_flat = tgt5.reshape(F, EH * EWl, C)
        den_flat = den5.reshape(F, EH * EWl, C)

        def slab_si(v_idx):
            si = scatter_idx[v_idx].reshape(-1)
            sil, _ = _slab_cols(si, w0, sentinel_ok=si < EH * EW)
            return sil

        if mode == "average":
            acc = jnp.zeros_like(tgt_flat)
            cnt = jnp.zeros(tgt_flat.shape[:-1] + (1,), tgt_flat.dtype)
            dacc = jnp.zeros_like(tgt_flat)

            def body(carry, xs):
                acc, cnt, dacc = carry
                v_idx, f0, w_new, w_den = xs
                fi = wrap_slice_indices(f0, frames, F)
                sil = slab_si(v_idx)
                wn = w_new.reshape(frames, -1, C)
                wd = w_den.reshape(frames, -1, C)
                acc = acc.at[fi[:, None], sil[None, :], :].add(wn, mode="drop")
                cnt = cnt.at[fi[:, None], sil[None, :], :].add(
                    jnp.ones_like(wn[..., :1]), mode="drop"
                )
                dacc = dacc.at[fi[:, None], sil[None, :], :].add(wd, mode="drop")
                return (acc, cnt, dacc), None

            (acc, cnt, dacc), _ = jax.lax.scan(
                body, (acc, cnt, dacc), (pair_view, pair_f, new, den)
            )
            out_l = normalize_accumulated(acc, cnt, tgt_flat)
            out_d = normalize_accumulated(dacc, cnt, den_flat)
            return (
                out_l.reshape(F, EH, EWl, C),
                out_d.reshape(F, EH, EWl, C),
            )

        def body(carry, xs):
            tgt, dbuf = carry
            v_idx, f0, w_new, w_den = xs
            fi = wrap_slice_indices(f0, frames, F)
            sil = slab_si(v_idx)
            wn = w_new.reshape(frames, -1, C)
            wd = w_den.reshape(frames, -1, C)
            tgt = tgt.at[fi[:, None], sil[None, :], :].set(wn, mode="drop")
            dbuf = dbuf.at[fi[:, None], sil[None, :], :].set(wd, mode="drop")
            return (tgt, dbuf), None

        (tgt_flat, den_flat), _ = jax.lax.scan(
            body, (tgt_flat, den_flat), (pair_view, pair_f, new, den)
        )
        return (
            tgt_flat.reshape(F, EH, EWl, C),
            den_flat.reshape(F, EH, EWl, C),
        )

    if n_seq > 1:
        from jax import shard_map

        out_l, out_d = shard_map(
            scatter_phase, mesh=mesh,
            in_specs=(slab, slab, P(), P()), out_specs=(slab, slab),
            check_vma=False,
        )(target[0], denoised_buf[0], new, den)
    else:
        out_l, out_d = scatter_phase(target[0], denoised_buf[0], new, den)
    return out_l[None], out_d[None]


# ---------------------------------------------------------------------------
# sampler
# ---------------------------------------------------------------------------


def sample_shift_sphere_panorama(
    model: LatentVideoDiffusion,
    prompt: str,
    pano_image: np.ndarray,  # [eq_h, eq_w, 3] in [-1, 1]
    equirect_width: int,
    equirect_height: int,
    phi_theta_dict: Dict[float, Sequence[float]],
    view_fov: float = 120,
    loop_step_theta: int = 10,
    phi_prompt_dict: Optional[Dict[float, str]] = None,
    phi_fov_dict: Optional[Dict[float, float]] = None,
    total_f: Optional[int] = None,
    dock_at_f: bool = False,
    overlap_ratio_list_f: Optional[Sequence[float]] = None,
    loop_step_frame: Optional[int] = None,
    height: int = 320,
    width: int = 512,
    frames: int = 16,
    fps: int = 16,
    guidance_scale: float = 7.5,
    num_inference_steps: int = 48,
    denoise_to_step: Optional[int] = None,
    paste_on_static: bool = True,
    merge_renoised_overlap_latent_ratio: Optional[float] = 1.0,
    merge_prev_denoised_ratio_list: Optional[Sequence[float]] = None,
    use_skip_time: bool = False,
    skip_time_step_idx: Optional[int] = None,
    progressive_skip: bool = False,
    init_sphere_latent: Optional[jnp.ndarray] = None,
    downsample_factor_before_vae_decode: Optional[float] = None,
    view_get_scale_factor: int = 1,
    view_set_scale_factor: int = 1,
    overlap_mode: str = "last",
    mesh=None,
    unet_microbatch: int = 8,
    use_image_cond: Optional[bool] = None,
    key: Optional[jax.Array] = None,
    decode: bool = False,
    params=None,
) -> Tuple[Optional[jnp.ndarray], jnp.ndarray, jnp.ndarray]:
    """Sphere panorama shift-window sampling.

    Returns (video or None, final latent, denoised latent), each
    ``[1, total_f, eq_h/vs, eq_w/vs, C]``.

    ``use_image_cond`` defaults to whether the model has an image encoder
    (i2v); the t2v variant (t2v_sphere_panorama_pipeline.py:24) is the same
    algorithm with text-only conditioning.
    """
    assert key is not None
    assert equirect_width == 2 * equirect_height, "equirect requires W = 2H"
    sched = make_schedule_for_model(model, num_inference_steps)
    vs = model.config.vae.spatial_scale
    lat_h, lat_w = height // vs, width // vs
    eq_lat_h, eq_lat_w = equirect_height // vs, equirect_width // vs
    total_f = total_f or frames
    S = num_inference_steps
    if use_image_cond is None:
        use_image_cond = model.image_encoder is not None

    # Issue the loop's tiny eager programs NOW, while the axon server is
    # still responsive: any fresh compile RPC arriving after this process's
    # program ingests start digesting server-side can stall for the whole
    # digestion window (BENCH_NOTES round-5 session 3: a single
    # jnp.zeros_like before the loop stalled 970s). split/fold_in here are
    # the exact programs the step loop reuses (same key shape); the
    # astype+sum pair is LoopStats._readback's program at the loop's
    # latent shape.
    k_init, k_run, k_noise = jax.random.split(key, 3)
    jax.block_until_ready(jax.random.fold_in(k_run, 0))
    float(
        jnp.sum(
            jnp.zeros(
                (1, total_f, eq_lat_h, eq_lat_w, model.config.unet.in_channels)
            ).astype(jnp.float32)
        )
    )

    # ---- per-phase view maps + conditioning -------------------------------
    phase_views = sphere_phase_views(phi_theta_dict, loop_step_theta, view_fov)
    # gather maps at view_get_scale, scatter maps at view_set_scale
    # (i2v_sphere_panorama_pipeline.py:330-343,422-435: views are projected
    # at a scaled latent resolution and nearest-resized to/from the UNet's
    # native window)
    maps = _phase_view_maps(
        phase_views, view_fov,
        lat_h * view_get_scale_factor, lat_w * view_get_scale_factor,
        eq_lat_h, eq_lat_w, phi_fov_dict,
    )
    native_maps = (
        maps
        if view_get_scale_factor == 1
        else _phase_view_maps(
            phase_views, view_fov, lat_h, lat_w, eq_lat_h, eq_lat_w, phi_fov_dict
        )
    )
    if view_set_scale_factor == view_get_scale_factor:
        set_maps = maps
    else:
        set_maps = _phase_view_maps(
            phase_views, view_fov,
            lat_h * view_set_scale_factor, lat_w * view_set_scale_factor,
            eq_lat_h, eq_lat_w, phi_fov_dict,
        )

    from dynamicscaler_tpu.utils.timing import Marker

    _tm = Marker("sphere")
    _tm.mark("maps")
    # ONE batched text encode + ONE batched image encode over ALL phases'
    # views (a per-phase CLIP call is a distinct-batch program each, and
    # each program's synchronous first-exec load costs 0.4-25s through the
    # axon tunnel — measured 687s for the old ~27-call loop in the bad
    # regime). Per-step per-view contexts are gathered from `ctx_all`
    # INSIDE the step program via `pair_ctx` global view ids.
    text_cache: dict = {}
    phase_gid: Dict[int, np.ndarray] = {}
    all_prompts: list = []
    all_view_specs: list = []
    for phase, views in phase_views.items():
        phase_gid[phase] = np.arange(
            len(all_prompts), len(all_prompts) + len(views), dtype=np.int32
        )
        all_prompts += [
            (phi_prompt_dict.get(phi, prompt) if phi_prompt_dict else prompt)
            for (phi, _) in views
        ]
        all_view_specs += [
            ((phi_fov_dict or {}).get(phi, view_fov), theta, phi)
            for (phi, theta) in views
        ]
    text_embs = encode_texts_cached(model, all_prompts, text_cache)
    if use_image_cond:
        # per-view cond image: perspective crop of the pano image at full
        # view resolution (i2v_sphere_panorama_pipeline.py:367-376)
        svs_img = make_sphere_views(
            all_view_specs, height, width, equirect_height, equirect_width
        )
        crops = []
        for sv in svs_img:
            crop = pano_image.reshape(-1, 3)[sv.gather_idx.reshape(-1).clip(0)]
            crop = crop.reshape(height, width, 3) * sv.valid[..., None]
            crops.append(crop)
        img_embs = model.encode_image_cond(
            jnp.asarray(np.stack(crops)), params=params
        )
        ctx_all = cat_text_image(text_embs, img_embs)  # [V_total, L, D]
    else:
        ctx_all = text_embs

    _tm.mark("phase conditioning (CLIP)", block=ctx_all if _tm.on else None)
    uncond = build_uncond_context(
        model, with_image=use_image_cond, image_hw=(lat_h, lat_w)
    )

    # ---- clean static pano latent (cached once) ---------------------------
    need_static = paste_on_static or use_skip_time
    static_clean = (
        tiled_vae_encode(model, jnp.asarray(pano_image), params=params)
        if need_static
        else jnp.zeros((1, 1, eq_lat_h, eq_lat_w, model.config.unet.in_channels))
    )

    # ---- init latent (k_init/k_run/k_noise split at function head) ---------
    skip = int(skip_time_step_idx or 0)
    if init_sphere_latent is None:
        latent = jax.random.normal(
            k_init, (1, total_f, eq_lat_h, eq_lat_w, model.config.unet.in_channels)
        )
        if use_skip_time:
            clean = jnp.tile(static_clean, (1, total_f, 1, 1, 1))
            if progressive_skip:
                steps_b = np.full((total_f,), S - 1, np.int32)
                for frame_idx, pskip in enumerate(reversed(range(skip))):
                    steps_b[frame_idx] = S - pskip - 1
                noised = re_noise_per_frame(sched, clean, jnp.asarray(steps_b), key=k_noise)
                sel = (np.arange(total_f) < skip)[None, :, None, None, None]
                latent = jnp.where(jnp.asarray(sel), noised, latent)
            else:
                latent = re_noise(sched, clean, 0, S - 1, key=k_noise)
    else:
        latent = jnp.asarray(init_sphere_latent)

    _tm.mark("static encode + init latent", block=(static_clean, latent) if _tm.on else None)

    # ---- step loop ----------------------------------------------------------
    steps_eff = S
    if use_skip_time and not progressive_skip:
        steps_eff -= skip
    if denoise_to_step is not None:
        steps_eff = min(steps_eff, denoise_to_step)

    if overlap_ratio_list_f is None:
        overlap_ratio_list_f = [0.5] * S

    step_partial = partial(
        _sphere_step,
        model=model,
        frames=frames,
        guidance=guidance_scale,
        fps=fps,
        mode=overlap_mode,
        unet_microbatch=unet_microbatch,
        mesh=mesh,
        get_scale=view_get_scale_factor,
        set_scale=view_set_scale_factor,
    )
    if mesh is None:
        # persistent trace cache: a warm process skips re-tracing the big
        # per-phase step programs (utils/progcache.py). In-process reuse
        # (repeat calls, AOT warm) comes from _CachedJit's signature table.
        from dynamicscaler_tpu.utils import progcache

        sk = (
            id(model), frames, guidance_scale, fps, overlap_mode,
            unet_microbatch, view_get_scale_factor, view_set_scale_factor,
        )
        hit = _SPHERE_STEP_CACHE.get(sk)
        if hit is None:
            fn = progcache.cached_jit(
                step_partial,
                name="sphere_step",
                fingerprint=progcache.obj_fingerprint(
                    model.config, frames, guidance_scale, fps, overlap_mode,
                    unet_microbatch, view_get_scale_factor,
                    view_set_scale_factor,
                ),
                # no donation (unlike planar): the incoming latent can alias
                # a caller-held array (init_sphere_latent resume path)
            )
            _SPHERE_STEP_CACHE[sk] = (fn, model)
            hit = _SPHERE_STEP_CACHE[sk]
        step_fn = hit[0]
    else:
        step_fn = jax.jit(step_partial)

    # numpy zeros, not jnp.zeros_like: the step program uploads it on first
    # call; an eager zeros_like here is a fresh tiny compile RPC that can
    # land inside the server's post-ingest digestion window (measured 970s
    # stall, BENCH_NOTES round-5 session 3)
    denoised = np.zeros(latent.shape, latent.dtype)
    # one table readback for the whole loop (a scalar int() per step is a
    # device round trip each — 0.4-12s apiece in the tunnel's bad regime)
    ddim_ts_np = np.asarray(sched.ddim_timesteps)
    _tm.reset_lap()
    LOOP_STATS.start(steps_eff)
    for i in range(steps_eff):
        # with skip the table index keeps counting from the truncated top
        index = (S - (skip if use_skip_time and not progressive_skip else 0)) - 1 - i
        phase = i % loop_step_theta
        f_origins = frame_window_origins(
            i, total_f, frames, overlap_ratio_list_f[i], loop_step_frame, dock_at_f
        )
        views = phase_views[phase]
        Nv = len(views)
        pair_view = np.asarray([v for _ in f_origins for v in range(Nv)], np.int32)
        pair_f = np.asarray([f0 for f0 in f_origins for _ in range(Nv)], np.int32)
        # global view ids into ctx_all; the step program gathers per-pair
        # conds internally (see _sphere_step)
        pair_ctx = np.asarray(
            [g for _ in f_origins for g in phase_gid[phase]], np.int32
        )
        last = i == steps_eff - 1
        use_ren = (merge_renoised_overlap_latent_ratio is not None) and not last
        use_mp = (merge_prev_denoised_ratio_list is not None) and not last
        latent, denoised = step_fn(
            params if params is not None else model.params,
            sched,
            latent,
            denoised,
            static_clean,
            maps[phase]["gather"],
            set_maps[phase]["scatter"],
            maps[phase]["valid"],
            jnp.asarray(f_origins, jnp.int32),
            jnp.asarray(pair_view),
            jnp.asarray(pair_f),
            native_maps[phase]["gather"],
            native_maps[phase]["valid"],
            ctx_all,
            uncond,
            jnp.asarray(int(ddim_ts_np[index]), jnp.int32),
            jnp.asarray(index, jnp.int32),
            jnp.asarray(
                float(merge_renoised_overlap_latent_ratio) if use_ren else 0.0
            ),
            jnp.asarray(
                0.0 if not use_mp else float(merge_prev_denoised_ratio_list[i])
            ),
            jnp.asarray(bool(paste_on_static and not last)),
            jax.random.fold_in(k_run, i),
            jnp.asarray(pair_ctx),
        )
        _tm.lap(f"step {i}/{steps_eff} phase={phase}", block=latent if _tm.on else None)
        if i == 0:
            LOOP_STATS.mark_first(latent)
    LOOP_STATS.finish(latent)

    # ---- decode -------------------------------------------------------------
    out_latent, out_denoised = latent, denoised
    if downsample_factor_before_vae_decode and downsample_factor_before_vae_decode != 1:
        th = int(eq_lat_h // downsample_factor_before_vae_decode)
        tw = int(eq_lat_w // downsample_factor_before_vae_decode)
        out_latent = resize_video_latent(out_latent, th, tw, mode="nearest")
        out_denoised = resize_video_latent(out_denoised, th, tw, mode="nearest")

    video = model.decode_video_chunked(out_denoised, params=params) if decode else None
    return video, out_latent, out_denoised
