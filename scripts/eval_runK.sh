#!/bin/bash
# The run-J/run-K three-grid held-out evaluation protocol, committed durably
# (VERDICT r4 weak #1: the original runJ_eval.sh lived only in /tmp and was
# never executed inside the round).
#
# Three readouts against a trained joint localizer store:
#   1. held-out corpus grid  — corpusJ_eval utterances (unseen speech, seed
#      777) x fresh exact-ISM geometry over a (T60 x R) grid
#   2. SNR sweep             — held-out corpus at T60=0.4 across sensor SNRs
#   3. surrogate domain-shift — same (T60 x R) grid with the in-step
#      surrogate speech (no --wav-dir): speech-domain-shift readout
#
# Success bars (VALIDATION.md run J/K): clean held-out medians <= 0.066 rad
# (2x run E's 0.020-0.033), >0.1 rad fraction <= 3%/cell, 0 dB median <= 0.065.
set -euo pipefail
cd "$(dirname "$0")/.."

STORE=${STORE:-/root/repo/stores/runK}
EVAL_CORPUS=${EVAL_CORPUS:-/root/repo/corpora/corpusJ_eval}
N=${N:-200}

echo "=== grid 1: held-out corpus (T60 x R), n=$N per cell ==="
python scripts/eval_t60_sweep.py --store-dir "$STORE" --wav-dir "$EVAL_CORPUS" \
  --t60-grid 0.2 0.3 0.4 0.5 0.6 --radius-grid 0.7 1.0 1.3 --n "$N" --seed 4242

echo "=== grid 2: held-out corpus SNR sweep at T60=0.4 ==="
python scripts/eval_t60_sweep.py --store-dir "$STORE" --wav-dir "$EVAL_CORPUS" \
  --t60-grid 0.4 --radius-grid 0.7 1.0 1.3 --snr-grid 30 20 10 5 0 \
  --n "$N" --seed 4243

echo "=== grid 3: surrogate speech domain-shift readout (T60 x R) ==="
python scripts/eval_t60_sweep.py --store-dir "$STORE" \
  --t60-grid 0.2 0.3 0.4 0.5 0.6 --radius-grid 0.7 1.0 1.3 --n "$N" --seed 4244
