#!/bin/bash
# A/B the two round-4 levers at bank speed (VERDICT r4 next-round item 4):
# four short joint bank-leg variants from a shared mature store —
# tail weighting on/off x clean-mix SNR curriculum on/off — each followed by
# a reduced held-out grid eval (clean cells + SNR sweep).
#
# Prereq: a store with stages 1-5 final (e.g. run K's stage-5 snapshot,
# stores/runK_s5). Each variant copies it so the joint legs are independent
# but share identical frozen inputs, pool, seed, and bank.
#
# Usage: BASE_STORE=/root/repo/stores/runK_s5 bash scripts/run_ab_levers.sh
set -euo pipefail
cd "$(dirname "$0")/.."

BASE_STORE=${BASE_STORE:-/root/repo/stores/runK_s5}
CORPUS=${CORPUS:-/root/repo/corpora/corpusJ}
EVAL_CORPUS=${EVAL_CORPUS:-/root/repo/corpora/corpusJ_eval}
UPDATES=${UPDATES:-15000}
N=${N:-100}
# Bank resolution is shared by all four variants (the A/B compares the levers
# against each other, not against the flagship's absolute numbers), so a
# coarser grid keeps the per-variant bank build short without biasing the
# comparison. Flagship resolution: BANK_THETA=1024 BANK_T60S=8 BANK_RADII=8.
BANK=(--rir-bank "${BANK_THETA:-256}" --rir-bank-rt60s "${BANK_T60S:-4}" \
      --rir-bank-radii "${BANK_RADII:-4}")
# SMOKE=1: tiny CPU drive of the whole harness (pair with a --smoke-trained
# BASE_STORE, e.g. the run_pipeline --smoke store).
EXTRA=(); [ "${SMOKE:-0}" = 1 ] && EXTRA=(--smoke --platform cpu)

run_variant() {  # name tail_weight snr_clean_prob
  local name=$1 tw=$2 cp=$3 store=${AB_ROOT:-/root/repo/stores}/ab_$1
  echo "=== variant $name (tail-weight $tw, snr-clean-prob $cp) ==="
  [ -d "$store" ] || cp -r "$BASE_STORE" "$store"
  python scripts/train_location.py --store-dir "$store" --on-the-fly \
    --wav-dir "$CORPUS" --joint --predict-radius \
    --rt60-range 0.12 0.75 --radius-range 0.45 1.45 --snr-range 0 30 \
    --snr-clean-prob "$cp" --tail-weight "$tw" "${BANK[@]}" "${EXTRA[@]}" \
    --updates "$UPDATES" --log-every 2000 --seed 11 --resume
  echo "--- $name clean grid ---"
  python scripts/eval_t60_sweep.py --store-dir "$store" --wav-dir "$EVAL_CORPUS" \
    --t60-grid 0.3 0.5 --radius-grid 0.7 1.0 1.3 --n "$N" --seed 4242 "${EXTRA[@]}"
  echo "--- $name SNR sweep ---"
  python scripts/eval_t60_sweep.py --store-dir "$store" --wav-dir "$EVAL_CORPUS" \
    --t60-grid 0.4 --radius-grid 1.0 --snr-grid 30 10 0 --n "$N" --seed 4243 "${EXTRA[@]}"
}

run_variant base 0.0 0.0
run_variant tail 1.0 0.0
run_variant clean 0.0 0.25
run_variant both 1.0 0.25
