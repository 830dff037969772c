"""Single-clip sampling CLI (t2v / i2v / FIFO streaming).

Covers the reference's gradio demo entry points
(scripts/gradio/t2v_test.py, i2v_test.py: one full generation per
invocation) and the single-prompt path of the batch eval, as a plain CLI.

  python -m dynamicscaler_tpu.cli.sample --mode t2v --prompt "a black swan" \
      --ckpt_path t2v.ckpt
  python -m dynamicscaler_tpu.cli.sample --mode i2v --prompt "..." \
      --image input/city_fireworks.png --ckpt_path i2v.ckpt
  python -m dynamicscaler_tpu.cli.sample --mode fifo --prompt "..." \
      --num_frames 128 --ckpt_path t2v.ckpt
  python -m dynamicscaler_tpu.cli.sample --mode freetraj --prompt "a red car" \
      --traj "0:0.3-0.7:0.0-0.4;1:0.3-0.7:0.6-1.0" --ckpt_path t2v.ckpt
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", choices=["t2v", "i2v", "fifo", "freetraj"], default="t2v")
    p.add_argument("--prompt", type=str, required=True)
    p.add_argument("--image", type=str, default="", help="cond image (i2v)")
    p.add_argument("--ckpt_path", type=str, default="")
    p.add_argument("--bpe_path", type=str, default="")
    p.add_argument("--output_dir", type=str, default="./results/sample")
    p.add_argument("--name", type=str, default="")
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--num_frames", type=int, default=64, help="fifo output length")
    p.add_argument("--fps", type=int, default=8)
    p.add_argument("--num_inference_steps", type=int, default=48)
    p.add_argument("--guidance_scale", type=float, default=12.0)
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--dev_tiny", action="store_true")
    p.add_argument(
        "--traj", type=str, default="",
        help="FreeTraj keyframes 'f:h0-h1:w0-w1;...' — f a frame index or "
        "0..1 fraction, box coords fractions of the video extent",
    )
    p.add_argument("--traj_token_ids", type=str, default="",
                   help="comma list of prompt token positions of the target "
                   "word (default 2: first content token)")
    p.add_argument("--traj_thres", type=float, default=600.0,
                   help="spatial trajectory masking applies while t > thres")
    return p.parse_args(argv)


def parse_traj_spec(spec: str):
    """'f:h0-h1:w0-w1;...' -> keyframe rows (f, h0, h1, w0, w1)."""
    rows = []
    for part in spec.split(";"):
        part = part.strip()
        if not part:
            continue
        f, hs, ws = part.split(":")
        h0, h1 = (float(v) for v in hs.split("-"))
        w0, w1 = (float(v) for v in ws.split("-"))
        rows.append((float(f), h0, h1, w0, w1))
    assert rows, f"empty --traj spec {spec!r}"
    return rows


def _enable_cache():
    from dynamicscaler_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()


def main(args):
    _enable_cache()
    import jax
    import jax.numpy as jnp

    from dynamicscaler_tpu.utils.io import load_image, save_video

    t0 = time.time()
    if args.dev_tiny:
        from dynamicscaler_tpu.models.lvdm import LatentVideoDiffusion, tiny_test_config
        from dynamicscaler_tpu.utils.tokenizer import HashTokenizer

        model = LatentVideoDiffusion.init_random(
            tiny_test_config(img_attention=(args.mode == "i2v")),
            jax.random.PRNGKey(args.seed), tokenizer=HashTokenizer(512),
        )
        args.height = args.width = 32
        args.frames, args.num_inference_steps = 4, 4
        args.num_frames = min(args.num_frames, 8)
    else:
        from dynamicscaler_tpu.config import videocrafter2_t2v, videocrafter_i2v
        from dynamicscaler_tpu.models.lvdm import LatentVideoDiffusion
        from dynamicscaler_tpu.utils.checkpoint import load_or_convert
        from dynamicscaler_tpu.utils.tokenizer import load_tokenizer

        config = (
            videocrafter_i2v(dtype=args.dtype)
            if args.mode == "i2v"
            else videocrafter2_t2v(dtype=args.dtype)
        )
        params = load_or_convert(args.ckpt_path, config)
        model = LatentVideoDiffusion(
            config=config, params=params, tokenizer=load_tokenizer(args.bpe_path or None)
        )

    key = jax.random.PRNGKey(args.seed)
    common = dict(
        height=args.height, width=args.width, fps=args.fps,
        guidance_scale=args.guidance_scale, key=key,
    )

    if args.mode == "t2v":
        from dynamicscaler_tpu.pipelines import t2v

        video, _ = t2v.basic_sample(
            model, args.prompt, frames=args.frames,
            num_inference_steps=args.num_inference_steps, **common,
        )
    elif args.mode == "freetraj":
        from dynamicscaler_tpu.pipelines import t2v

        assert args.traj, "--traj keyframe spec required for freetraj mode"
        token_ids = (
            [int(v) for v in args.traj_token_ids.split(",") if v]
            if args.traj_token_ids
            else None
        )
        video, _ = t2v.freetraj_sample(
            model, args.prompt,
            traj_keyframes=parse_traj_spec(args.traj),
            traj_token_ids=token_ids, traj_thres=args.traj_thres,
            frames=args.frames,
            num_inference_steps=args.num_inference_steps, **common,
        )
    elif args.mode == "fifo":
        from dynamicscaler_tpu.pipelines.fifo import fifo_sample

        video, _ = fifo_sample(
            model, args.prompt, num_output_frames=args.num_frames,
            frames=args.frames, **common,
        )
    else:  # i2v: single-window generation == 1x1 integer grid
        from dynamicscaler_tpu.pipelines import i2v

        assert args.image, "--image required for i2v"
        pano = load_image(args.image, args.height, args.width)
        video, _ = i2v.sample_shift_multi_windows_integer(
            model, args.prompt, pano,
            num_windows_w=1, num_windows_h=1, num_windows_f=1,
            loop_step=args.num_inference_steps, frames=args.frames,
            num_inference_steps=args.num_inference_steps, **common,
        )

    name = args.name or ("".join(c if c.isalnum() else "_" for c in args.prompt[:40]))
    out = save_video(np.asarray(video[0]), args.output_dir, name, fps=args.fps)
    print(f"[sample] {args.mode} done in {time.time() - t0:.1f}s -> {out}")


if __name__ == "__main__":
    main(parse_args())
