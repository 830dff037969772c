#!/bin/bash
# Unattended TPU validation checklist (run when the axon tunnel is reachable).
#
# Runs, in order, with per-step timeouts and full logging to
# results/tpu_checklist_<ts>/ so a flaky tunnel can't lose a measurement:
#   1. probe                     — tiny matmul reachability gate
#   2. cli/gen_pano_360 --dev_full_random  (e2e_cold) — full-geometry e2e,
#      populates the HLO program cache; writes results/e2e_latest.json
#   3. cli/gen_pano_360 --dev_full_random  (e2e_warm) — same commit, warm
#      cache; overwrites e2e_latest.json with the warm number (run_type=warm)
#   4. bench.py                  — headline JSON, embeds the warm e2e artifact
#   5. dev/ablate_unet.py        — per-class fused-kernel attribution
#   6. dev/bench_block.py xfmr   — fusion-ladder per-level slope numbers
#
# e2e runs FIRST so BENCH_rN always carries an e2e artifact (round-3 ran
# bench before the e2e finished and shipped "not measured"); bench timeout
# is 3600s because a cold bench compile through the tunnel exceeded 2400s
# in round 3 (rc=124).
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

# quick reachability gate: a tiny matmul + readback must finish in 600s
run probe 600 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
x = jnp.ones((1024,1024), jnp.bfloat16)
print(float(jax.jit(lambda a:(a@a).sum())(x)))
" || echo 'probe slow/failed — continuing anyway (slow-regime tunnel)' | tee -a "$OUT/summary.log"

if [[ "${1:-}" != "--skip-e2e" ]]; then
  # Cold run populates the trace cache + the axon server's program cache
  # at this commit; --repeat_warm then reruns the full pipeline in the SAME
  # process — the resident-process warm number (zero compile/ingest RPCs,
  # immune to the server's per-process ingest digestion, BENCH_NOTES
  # round-5 session 3). The separate process-warm run after the settle
  # gate measures fresh-process warm start (progcache loads + one
  # digestion window, absorbed by the burst prewarm + aot_warm thread).
  run e2e_cold 9000 python -m dynamicscaler_tpu.cli.gen_pano_360 --dev_full_random true --repeat_warm true
  run settle 3700 python dev/settle_gate.py --fast 5
  run e2e_warm 3600 python -m dynamicscaler_tpu.cli.gen_pano_360 --dev_full_random true
fi
run bench 3600 python bench.py
# focused ablation: full + the SoL ceiling (convs_only — gnsilu touches the
# ResBlocks, so the ceiling must be re-measured whenever dispatch changes)
# + k_gnsilu_unet re-checking the demoted unet site. The full 11-variant
# per-class sweep was landed at acee677 (BENCH_NOTES round-4).
run ablate 5400 python dev/ablate_unet.py full full_nofused convs_only k_gnsilu_unet
run bench_vae 1800 python dev/bench_vae.py
run bench_block_xfmr 5400 python dev/bench_block.py xfmr
echo "checklist done — artifacts in $OUT" | tee -a "$OUT/summary.log"
