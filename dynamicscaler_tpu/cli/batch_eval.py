"""Batch text-to-video evaluation over a prompt list.

Equivalent of the reference's batch-eval entry
(scripts/evaluation/inference.py:42-130 + the NCCL DDP prompt-sharding
wrapper, scripts/evaluation/ddp_wrapper.py:8-46): each process takes its
slice of the prompt list. On TPU the "rank" is ``jax.process_index()``
(multi-host DCN data parallelism — the exact role NCCL played for the
reference); within a process, prompts are additionally packed into the
window-batch axis of one jitted program when ``--batch_size > 1``.

Run: ``python -m dynamicscaler_tpu.cli.batch_eval --prompt_file prompts.txt
--ckpt_path model.ckpt`` (``--dev_tiny`` for an asset-free smoke run).
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--prompt_file", type=str, required=True,
                   help="text file, one prompt per line")
    p.add_argument("--mode", type=str, default="t2v", choices=("t2v", "i2v"),
                   help="i2v pairs each prompt with a cond image from "
                        "--cond_input (sorted; inference.py:80-85)")
    p.add_argument("--cond_input", type=str, default="",
                   help="dir of per-prompt cond images (png/jpg), sorted by "
                        "name like the reference's get_filelist")
    p.add_argument("--ckpt_path", type=str, default="")
    p.add_argument("--bpe_path", type=str, default="")
    p.add_argument("--output_dir", type=str, default="./results/batch")
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--fps", type=int, default=8)
    p.add_argument("--num_inference_steps", type=int, default=48)
    p.add_argument("--guidance_scale", type=float, default=12.0)
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--dev_tiny", action="store_true")
    # manual rank override (defaults to jax.process_index / count)
    p.add_argument("--rank", type=int, default=-1)
    p.add_argument("--world_size", type=int, default=-1)
    # coordinated multi-host init (reference: ddp_wrapper.py:8-12 env://)
    from dynamicscaler_tpu.parallel.dist import add_distributed_flags

    add_distributed_flags(p)
    return p.parse_args(argv)


def _enable_cache():
    from dynamicscaler_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()


def main(args):
    from dynamicscaler_tpu.parallel.dist import barrier, initialize_from_args

    coordinated = initialize_from_args(args)  # before any backend touch
    _enable_cache()
    import jax

    from dynamicscaler_tpu.pipelines import i2v, t2v
    from dynamicscaler_tpu.utils.io import save_video

    rank = args.rank if args.rank >= 0 else jax.process_index()
    world = args.world_size if args.world_size > 0 else jax.process_count()
    if coordinated:
        barrier("batch_eval_start")  # all ranks reached init together

    with open(args.prompt_file) as f:
        prompts = [ln.strip() for ln in f if ln.strip()]
    shard = prompts[rank::world]  # reference shards by index slice too
    print(f"[batch_eval] rank {rank}/{world}: {len(shard)}/{len(prompts)} prompts")

    cond_shard = [None] * len(shard)
    if args.mode == "i2v":
        import glob

        # images, plus video files whose FIRST frame conditions the clip
        # (funcs.py:129-167 decord branch; here via imageio when an
        # ffmpeg/pyav backend exists — utils/io.load_first_frame)
        paths = sorted(
            p for ext in ("png", "jpg", "jpeg", "mp4", "avi", "mov", "webm")
            for p in glob.glob(os.path.join(args.cond_input, f"*.{ext}"))
        )
        assert len(paths) == len(prompts), (
            f"cond inputs ({len(paths)}) != prompts ({len(prompts)}) "
            f"(inference.py:82 requires 1:1)"
        )
        cond_shard = paths[rank::world]

    if args.dev_tiny:
        from dynamicscaler_tpu.models.lvdm import LatentVideoDiffusion, tiny_test_config
        from dynamicscaler_tpu.utils.tokenizer import HashTokenizer

        model = LatentVideoDiffusion.init_random(
            tiny_test_config(img_attention=args.mode == "i2v"),
            jax.random.PRNGKey(args.seed),
            tokenizer=HashTokenizer(512),
        )
        args.height = args.width = 32
        args.frames = 4
        args.num_inference_steps = 4
    else:
        from dynamicscaler_tpu.config import videocrafter2_t2v, videocrafter_i2v
        from dynamicscaler_tpu.models.lvdm import LatentVideoDiffusion
        from dynamicscaler_tpu.utils.tokenizer import load_tokenizer
        from dynamicscaler_tpu.utils.weights import load_videocrafter_checkpoint

        config = (
            videocrafter_i2v(dtype=args.dtype)
            if args.mode == "i2v"
            else videocrafter2_t2v(dtype=args.dtype)
        )
        params = load_videocrafter_checkpoint(args.ckpt_path, config)
        model = LatentVideoDiffusion(
            config=config, params=params, tokenizer=load_tokenizer(args.bpe_path or None)
        )

    os.makedirs(args.output_dir, exist_ok=True)
    t0 = time.time()
    for i, prompt in enumerate(shard):
        key = jax.random.fold_in(jax.random.PRNGKey(args.seed), rank * 100003 + i)
        if args.mode == "i2v":
            from dynamicscaler_tpu.utils.io import load_first_frame

            cond = load_first_frame(cond_shard[i], args.height, args.width)
            video, _ = i2v.basic_sample(
                model, prompt, cond,
                height=args.height, width=args.width, frames=args.frames,
                fps=args.fps, guidance_scale=args.guidance_scale,
                num_inference_steps=args.num_inference_steps, key=key,
            )
        else:
            video, _ = t2v.basic_sample(
                model, prompt,
                height=args.height, width=args.width, frames=args.frames,
                fps=args.fps, guidance_scale=args.guidance_scale,
                num_inference_steps=args.num_inference_steps, key=key,
            )
        name = f"r{rank}_{i:04d}_" + "".join(
            c if c.isalnum() else "_" for c in prompt[:40]
        )
        save_video(np.asarray(video[0]), args.output_dir, name, fps=args.fps)
        print(f"[batch_eval] {i + 1}/{len(shard)} '{prompt[:50]}' "
              f"({time.time() - t0:.1f}s elapsed)")
    print(f"[batch_eval] rank {rank} done in {time.time() - t0:.1f}s")
    if coordinated:
        barrier("batch_eval_done")


if __name__ == "__main__":
    main(parse_args())
