"""End-to-end sampling-LOOP numerics parity vs the torch reference under
injected identical noise (SURVEY §7 hard part (c)).

Module-level parity (test_torch_parity.py) does not cover index conventions,
CFG packing, or scale handling across a whole DDIM loop; these tests drive
the actual reference scheduler (`pipeline/scheduler.py:61-110`) and reference
window engine (`utils/shift_window_utils.py:40-207`) against our jitted
samplers with the same noise tensors and converted weights.
"""

import os
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference tree not mounted"
)

if os.path.isdir(REFERENCE) and REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

# utils/shift_window_utils.py imports lvdm.models.ddpm3d (typing only), which
# needs torchvision + pytorch_lightning (absent here). Stub the module so the
# pure-torch window code imports; the stub is never executed.
if "lvdm.models.ddpm3d" not in sys.modules:
    _stub = types.ModuleType("lvdm.models.ddpm3d")
    _stub.LatentVisualDiffusion = object
    _stub.LatentDiffusion = object
    sys.modules["lvdm.models.ddpm3d"] = _stub

from dynamicscaler_tpu.config import ModelConfig, UNetConfig, DiffusionConfig
from dynamicscaler_tpu.models.lvdm import LatentVideoDiffusion
from dynamicscaler_tpu.ops.ddim import make_ddim_schedule
from dynamicscaler_tpu.utils import weights as W
from dynamicscaler_tpu.pipelines import t2v
from dynamicscaler_tpu.pipelines.planar import PlanarShiftWindowEngine, StepPlan

torch.manual_seed(0)

TINY_T2V = dict(
    in_channels=4,
    out_channels=4,
    model_channels=32,
    attention_resolutions=[1, 2],
    num_res_blocks=1,
    channel_mult=[1, 2],
    num_head_channels=16,
    transformer_depth=1,
    context_dim=64,
    use_linear=True,
    use_checkpoint=False,
    temporal_conv=True,
    temporal_attention=True,
    temporal_selfatt_only=True,
    use_relative_position=False,
    use_causal_attention=False,
    temporal_length=4,
    addition_attention=True,
    fps_cond=True,
    use_image_attention=False,
)


class _SchedModelStub:
    """The LatentDiffusion buffers lvdm_DDIM_Scheduler reads
    (pipeline/scheduler.py:13,23-37) — built with the reference's own
    schedule math so the oracle is self-consistent."""

    def __init__(self, timesteps=1000, linear_start=0.00085, linear_end=0.012):
        from lvdm.models.utils_diffusion import make_beta_schedule

        betas = make_beta_schedule(
            "linear", timesteps, linear_start=linear_start, linear_end=linear_end
        )
        acp = np.cumprod(1.0 - betas, axis=0)
        self.num_timesteps = timesteps
        self.betas = torch.tensor(betas)
        self.alphas_cumprod = torch.tensor(acp)
        self.alphas_cumprod_prev = torch.tensor(np.append(1.0, acp[:-1]))
        # i2v config: use_scale with scale_b=0.7, mid_step=400
        # (the pano scheduler records but never applies it in ddim_step)
        self.use_scale = True
        self.scale_arr = torch.tensor(
            np.concatenate(
                [np.linspace(1.0, 0.7, 400), np.full(timesteps, 0.7)]
            )
        )
        self.device = torch.device("cpu")


@pytest.fixture(scope="module")
def bundle():
    """(torch UNet, jax model, jax schedule, torch scheduler) on shared
    converted weights."""
    from lvdm.modules.networks.openaimodel3d import UNetModel
    from pipeline.scheduler import lvdm_DDIM_Scheduler

    m = UNetModel(**TINY_T2V)
    m.eval()
    cfg = ModelConfig(
        unet=UNetConfig(
            model_channels=32,
            num_head_channels=16,
            context_dim=64,
            channel_mult=(1, 2),
            num_res_blocks=1,
            attention_resolutions=(1, 2),
            temporal_length=4,
            use_image_attention=False,
        ),
        diffusion=DiffusionConfig(use_scale=True, scale_b=0.7),
        dtype="float32",
    )
    params = {"unet": W.convert_unet(m.state_dict(), cfg.unet)}
    model = LatentVideoDiffusion(config=cfg, params=params)

    S = 4
    jsched = make_ddim_schedule(
        S, 1000, linear_start=0.00085, linear_end=0.012,
        use_scale=True, scale_a=1.0, scale_b=0.7, mid_step=400,
    )
    tsched = lvdm_DDIM_Scheduler(_SchedModelStub())
    tsched.make_schedule(S, verbose=False)
    return m, model, jsched, tsched


def _torch_cfg_eps(m, lat, t, ctx, uc, g, fps):
    ts = torch.full((lat.shape[0],), int(t), dtype=torch.long)
    with torch.no_grad():
        e_c = m(lat, ts, context=ctx, fps=fps)
        e_u = m(lat, ts, context=uc, fps=fps)
    return e_u + g * (e_c - e_u)


def test_full_loop_noise_injection_parity(bundle):
    """4-step single-window t2v loop: the reference loop
    (pipeline/t2v_normal_pipeline.py:167-201: flip(ddim_timesteps), CFG
    uncond + g*(cond-uncond), ddim_step(indices=[index]*F)) vs our
    `_basic_sample_loop` lax.scan, identical init noise and contexts."""
    m, model, jsched, tsched = bundle
    S, F, H, Wd, g, fps = 4, 4, 8, 8, 7.5, 16

    rng = np.random.default_rng(10)
    x0 = rng.standard_normal((1, 4, F, H, Wd)).astype(np.float32)
    ctx = rng.standard_normal((1, 77, 64)).astype(np.float32)
    uc = rng.standard_normal((1, 77, 64)).astype(np.float32)

    # --- torch oracle loop
    lat = torch.from_numpy(x0)
    timesteps = np.flip(tsched.ddim_timesteps)
    den = None
    for i, t in enumerate(timesteps):
        eps = _torch_cfg_eps(m, lat, t, torch.from_numpy(ctx), torch.from_numpy(uc), g, fps)
        index = S - i - 1
        lat, den = tsched.ddim_step(sample=lat, noise_pred=eps, indices=[index] * F)
    ref_lat, ref_den = lat.numpy(), den.numpy()

    # --- ours (one jitted scan)
    got_lat, got_den = t2v._basic_sample_loop(
        model.params,
        jsched,
        jnp.asarray(x0.transpose(0, 2, 3, 4, 1)),
        jnp.asarray(ctx),
        jnp.asarray(uc),
        model=model,
        guidance_scale=g,
        fps=fps,
    )
    np.testing.assert_allclose(
        np.asarray(got_lat).transpose(0, 4, 1, 2, 3), ref_lat, atol=2e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(got_den).transpose(0, 4, 1, 2, 3), ref_den, atol=2e-3, rtol=1e-3
    )


def test_planar_multiwindow_step_parity(bundle):
    """One planar shift-window DDIM step over 4 overlapping ring windows:
    reference ordering (RingLatent get/set, shift_window_utils.py:48-207 +
    scheduler.ddim_step) vs our engine in `sequential` mode — same weights,
    same latent, no stochastic blending (merge ratios None skips the only
    RNG-bearing path, matching i<total-1 gating at
    i2v_sphere_panorama_pipeline.py:872-881 on the final step)."""
    import jax

    from utils.shift_window_utils import RingLatent

    m, model, jsched, tsched = bundle
    F, g, fps = 4, 7.5, 16
    fs, hs, ws = 4, 8, 8
    TH, TW = 12, 12  # overlapping 2x2 grid with ring wrap
    origins = np.asarray(
        [(0, 0, 0), (0, 0, 6), (0, 6, 0), (0, 6, 6)], np.int32
    )  # wraps around H and W on the far windows
    index = 2
    t = int(tsched.ddim_timesteps[index])

    rng = np.random.default_rng(11)
    x0 = rng.standard_normal((1, 4, F, TH, TW)).astype(np.float32)
    ctx = rng.standard_normal((1, 77, 64)).astype(np.float32)
    uc = rng.standard_normal((1, 77, 64)).astype(np.float32)

    # --- torch oracle: sequential window loop in reference order
    handler = RingLatent(torch.from_numpy(x0))
    for f0, h0, w0 in origins:
        win = handler.get_window_latent(
            pos_left=int(w0), pos_right=int(w0) + ws,
            pos_top=int(h0), pos_down=int(h0) + hs,
            frame_begin=int(f0), frame_end=int(f0) + fs,
        )
        eps = _torch_cfg_eps(m, win, t, torch.from_numpy(ctx), torch.from_numpy(uc), g, fps)
        new, _ = tsched.ddim_step(sample=win, noise_pred=eps, indices=[index] * fs)
        handler.set_window_latent(
            new,
            pos_left=int(w0), pos_right=int(w0) + ws,
            pos_top=int(h0), pos_down=int(h0) + hs,
            frame_begin=int(f0), frame_end=int(f0) + fs,
        )
    ref = handler.torch_latent.numpy()

    # --- ours: engine step in sequential (reference-exact) ordering
    engine = PlanarShiftWindowEngine(
        model, jsched, (fs, hs, ws), guidance_scale=g, fps=fps, overlap_mode="sequential"
    )
    plan = [
        StepPlan(
            t=t,
            index=index,
            origins=origins,
            context=jnp.broadcast_to(jnp.asarray(ctx), (len(origins), 77, 64)),
            earlier_mask=None,
            renoise_ratio=None,
            merge_prev_ratio=None,
        )
    ]
    got, _ = engine.run(
        jnp.asarray(x0.transpose(0, 2, 3, 4, 1)), plan, jnp.asarray(uc), jax.random.PRNGKey(0)
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 4, 1, 2, 3), ref, atol=2e-3, rtol=1e-3
    )


def test_sphere_step_sequential_parity(bundle, monkeypatch):
    """One flagship sphere step in reference ordering (VERDICT r2 #4):
    reference `RingPanoramaLatentProxy` view gather -> denoised-mask
    renoise merge -> CFG UNet -> `lvdm_DDIM_Scheduler.ddim_step` ->
    merge-prev mix -> sequential scatter into BOTH the gather source and
    the paste_on_static target (i2v_sphere_panorama_pipeline.py:245-254,
    320-471) vs `_sphere_step(mode="sequential")` — identical converted
    weights and identical injected re_noise draws (the jax keys' noise is
    replayed into torch.randn_like)."""
    import jax

    from utils.ring_panorama_tensor_utils import RingPanoramaLatentProxy
    from utils.tensor_utils import mix_latents_with_mask

    from dynamicscaler_tpu.ops.sphere import make_sphere_views
    from dynamicscaler_tpu.pipelines.sphere import _sphere_step

    m, model, jsched, tsched = bundle
    F_ = fs = 4
    EH, EW = 8, 16
    hv = wv = 4
    fov = 120.0
    views = [(0.0, 0.0), (0.0, 60.0)]  # (phi, theta) — overlapping pair
    index = 2
    t = int(tsched.ddim_timesteps[index])
    g, fps = 7.5, 16
    renoise_ratio, merge_prev = 1.0, 0.5

    rng = np.random.default_rng(12)
    x0 = rng.standard_normal((1, 4, F_, EH, EW)).astype(np.float32)  # [B,C,F,H,W]
    static = rng.standard_normal((1, 4, 1, EH, EW)).astype(np.float32)
    ctx = rng.standard_normal((2, 77, 64)).astype(np.float32)
    uc = rng.standard_normal((1, 77, 64)).astype(np.float32)

    key = jax.random.PRNGKey(3)
    # replay the exact noise the jitted step will draw (ops/ddim.py re_noise:
    # jax.random.normal(key, shape)) into the torch oracle, in its call
    # order: static paste renoise first, then one renoise per view
    n_static = np.asarray(
        jax.random.normal(jax.random.fold_in(key, 1), (1, F_, EH, EW, 4), jnp.float32)
    )
    n_views = [
        np.asarray(
            jax.random.normal(jax.random.fold_in(key, k + 2), (1, fs, hv, wv, 4), jnp.float32)
        )
        for k in range(len(views))
    ]
    to_t = lambda a: torch.from_numpy(np.ascontiguousarray(a.transpose(0, 4, 1, 2, 3)))
    queue = [to_t(n_static)] + [to_t(n) for n in n_views]
    monkeypatch.setattr(
        torch, "randn_like", lambda x, **kw: queue.pop(0).to(x.dtype)
    )

    # --- torch oracle: reference-ordered sphere step
    lat_h = RingPanoramaLatentProxy(torch.from_numpy(x0.copy()))
    den_h = RingPanoramaLatentProxy(torch.zeros_like(torch.from_numpy(x0)))
    mask_h = RingPanoramaLatentProxy(torch.zeros_like(torch.from_numpy(x0)))
    clear_rep = torch.from_numpy(static).repeat(1, 1, F_, 1, 1)
    noised_rep = tsched.re_noise(x_a=clear_rep, step_a=0, step_b=index)
    tmp_h = RingPanoramaLatentProxy(noised_rep)
    for k, (phi, theta) in enumerate(views):
        view, _ = lat_h.get_view_tensor_no_interpolate(
            fov, theta, phi, wv, hv, frame_begin=0, frame_end=fs
        )
        prev = view.clone()
        mview, _ = mask_h.get_view_tensor_no_interpolate(
            fov, theta, phi, wv, hv, frame_begin=0, frame_end=fs
        )
        noised = tsched.re_noise(x_a=view.clone(), step_a=index - 1, step_b=index)
        view = mix_latents_with_mask(view, noised, mview, renoise_ratio)
        eps = _torch_cfg_eps(
            m, view, t, torch.from_numpy(ctx[k : k + 1]), torch.from_numpy(uc), g, fps
        )
        view, den = tsched.ddim_step(sample=view, noise_pred=eps, indices=[index] * fs)
        view = mix_latents_with_mask(view, prev, mview, merge_prev)
        for h in (lat_h, tmp_h):
            h.set_view_tensor_no_interpolation(
                view, fov, theta, phi, frame_begin=0, frame_end=fs
            )
        den_h.set_view_tensor_no_interpolation(
            den, fov, theta, phi, frame_begin=0, frame_end=fs
        )
        mask_h.set_view_tensor_no_interpolation(
            torch.ones_like(view), fov, theta, phi, frame_begin=0, frame_end=fs
        )
    assert not queue  # every injected draw consumed
    ref_lat = tmp_h.get_equirect_tensor().numpy()
    ref_den = den_h.get_equirect_tensor().numpy()

    # --- ours: one sequential-mode sphere step, same maps, same keys
    svs = make_sphere_views([(fov, th, ph) for (ph, th) in views], hv, wv, EH, EW)
    gather = jnp.asarray(np.stack([v.gather_idx for v in svs]))
    scatter = jnp.asarray(np.stack([v.scatter_idx for v in svs]))
    valid = jnp.asarray(np.stack([v.valid for v in svs]).astype(np.float32))
    got_lat, got_den = _sphere_step(
        model.params,
        jsched,
        jnp.asarray(x0.transpose(0, 2, 3, 4, 1)),
        jnp.zeros((1, F_, EH, EW, 4)),
        jnp.asarray(static.transpose(0, 2, 3, 4, 1)),
        gather,
        scatter,
        valid,
        jnp.asarray([0], jnp.int32),
        jnp.asarray([0, 1], jnp.int32),
        jnp.asarray([0, 0], jnp.int32),
        gather,
        valid,
        jnp.asarray(ctx),
        jnp.asarray(uc),
        jnp.asarray(t, jnp.int32),
        jnp.asarray(index, jnp.int32),
        jnp.asarray(renoise_ratio),
        jnp.asarray(merge_prev),
        jnp.asarray(True),
        key,
        model=model,
        frames=fs,
        guidance=g,
        fps=fps,
        mode="sequential",
    )
    np.testing.assert_allclose(
        np.asarray(got_lat).transpose(0, 4, 1, 2, 3), ref_lat, atol=2e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(got_den).transpose(0, 4, 1, 2, 3), ref_den, atol=2e-3, rtol=1e-3
    )
