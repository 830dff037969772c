#!/bin/bash
# Round-3 TPU validation checklist (run when the axon tunnel is reachable).
#
# Runs, in order, with per-step timeouts and full logging to
# results/tpu_checklist_<ts>/ so a flaky tunnel can't lose a measurement:
#   1. dev/bench_block.py xfmr   — fusion-ladder per-level slope numbers
#   2. dev/ablate_unet.py        — full-UNet attribution (full/full_nofused/...)
#   3. bench.py                  — headline hot-op JSON
#   4. cli/gen_pano_360 --dev_full_random — full-geometry e2e, writes
#      results/e2e_latest.json (bench.py embeds it)
#   5. bench.py again            — final JSON now with the e2e artifact
#
# Usage: bash dev/tpu_checklist.sh [--skip-e2e]
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
TS=$(date +%Y%m%d_%H%M%S)
OUT=results/tpu_checklist_$TS
mkdir -p "$OUT"
echo "logging to $OUT"

run() { # name timeout cmd...
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%T)) ===" | tee -a "$OUT/summary.log"
  timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "$name rc=$rc ($(date +%T))" | tee -a "$OUT/summary.log"
  tail -5 "$OUT/$name.log" | tee -a "$OUT/summary.log"
  return $rc
}

# quick reachability gate: a tiny matmul + readback must finish in 300s
run probe 600 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
x = jnp.ones((1024,1024), jnp.bfloat16)
print(float(jax.jit(lambda a:(a@a).sum())(x)))
" || echo 'probe slow/failed — continuing anyway (slow-regime tunnel)' | tee -a "$OUT/summary.log"

# headline artifacts first (cold compiles are the wall-clock risk):
run bench1 2400 python bench.py
if [[ "${1:-}" != "--skip-e2e" ]]; then
  run e2e 3600 python -m dynamicscaler_tpu.cli.gen_pano_360 --dev_full_random true
  run bench2 1800 python bench.py
fi
run ablate_full 1800 python dev/ablate_unet.py full full_nofused
run bench_block_xfmr 2400 python dev/bench_block.py xfmr
echo "checklist done — artifacts in $OUT" | tee -a "$OUT/summary.log"
