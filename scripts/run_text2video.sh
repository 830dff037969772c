#!/usr/bin/env bash
# Batch t2v eval with the reference's default flags
# (reference scripts/run_text2video.sh).
name="base_512_v2"
ckpt="${CKPT:-checkpoints/base_512_v2/model.ckpt}"
prompt_file="${PROMPT_FILE:-prompts/test_prompts.txt}"
res_dir="${RES_DIR:-results}"

python3 -m dynamicscaler_tpu.cli.batch_eval \
  --seed 123 \
  --mode t2v \
  --ckpt_path "$ckpt" \
  --output_dir "$res_dir/$name" \
  --height 320 --width 512 \
  --guidance_scale 12.0 \
  --num_inference_steps 50 \
  --prompt_file "$prompt_file" \
  --fps 28
