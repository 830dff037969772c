#!/usr/bin/env bash
# Batch i2v eval with the reference's default flags
# (reference scripts/run_image2video.sh).
name="i2v_512_test"
ckpt="${CKPT:-checkpoints/i2v_512_v1/model.ckpt}"
prompt_file="${PROMPT_FILE:-prompts/i2v_prompts/test_prompts.txt}"
condimage_dir="${COND_DIR:-prompts/i2v_prompts}"
res_dir="${RES_DIR:-results}"

python3 -m dynamicscaler_tpu.cli.batch_eval \
  --seed 123 \
  --mode i2v \
  --ckpt_path "$ckpt" \
  --output_dir "$res_dir/$name" \
  --height 320 --width 512 \
  --guidance_scale 12.0 \
  --num_inference_steps 50 \
  --prompt_file "$prompt_file" \
  --cond_input "$condimage_dir" \
  --fps 8
