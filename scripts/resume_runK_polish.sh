#!/bin/bash
# Resume run K's exact polish leg after the 02:21 tunnel outage (VALIDATION.md
# round 5): the bank leg was crash-cut at the 173000-update periodic
# checkpoint, so relaunching WITHOUT the --rir-bank flags resumes from it and
# trains pure exact-synthesis updates — i.e. exactly the recipe's polish leg
# (a restore past bank_updates makes leg 1 a no-op; skipping the bank flags
# also skips the ~10 min bank rebuild). Then runs the committed three-grid
# held-out eval.
set -euo pipefail
cd "$(dirname "$0")/.."

STORE=${STORE:-/root/repo/stores/runK}
CORPUS=${CORPUS:-/root/repo/corpora/corpusJ}
TOTAL_UPDATES=${TOTAL_UPDATES:-223000}   # 173k bank + 50k exact polish

python scripts/train_location.py --store-dir "$STORE" --on-the-fly \
  --wav-dir "$CORPUS" --joint --predict-radius \
  --rt60-range 0.12 0.75 --radius-range 0.45 1.45 \
  --snr-range 0 30 --snr-clean-prob 0.25 --tail-weight 1.0 \
  --updates "$TOTAL_UPDATES" --keep-checkpoints 8 --log-every 2000 \
  --seed 11 --resume

# Eval output goes INSIDE the repo tree (not gitignored stores/) so an
# end-of-round snapshot commits it even if the session ends mid-run.
bash scripts/eval_runK.sh > /root/repo/runK_eval.log 2>&1
python scripts/summarize_sweep.py /root/repo/runK_eval.log || true
echo "eval written to /root/repo/runK_eval.log"
