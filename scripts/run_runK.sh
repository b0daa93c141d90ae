#!/bin/bash
# Run K — the corpus-pool flagship at the validated budget (VERDICT r4 item 1).
#
# Reruns run J's pipeline (VALIDATION.md round 4) from the seeded corpora with
# the joint 2-D polar stage at the run-H-validated budget: 350k bank updates
# (1024 theta x 8 T60 x 8 R) + 50k exact-synthesis polish, one store, fully
# resumable (rerun this script after a preemption; every leg passes --resume
# or skips on existing finals).
#
# Reference role: the real-LibriSpeech training economics of
# /root/reference/scripts/genereate_dataset.py:93-101, served by on-the-fly
# synthesis from a wav corpus instead of an offline .pt dataset.
#
# Corpora are seeded + bit-reproducible:
#   python scripts/make_shifted_corpus.py --out corpora/corpusJ      --n 512 --seed 2024
#   python scripts/make_shifted_corpus.py --out corpora/corpusJ_eval --n 256 --seed 777
set -euo pipefail
cd "$(dirname "$0")/.."

STORE=${STORE:-/root/repo/stores/runK}
CORPUS=${CORPUS:-/root/repo/corpora/corpusJ}
BANK_UPDATES=${BANK_UPDATES:-350000}
TOTAL_UPDATES=${TOTAL_UPDATES:-400000}

COMMON=(--on-the-fly --wav-dir "$CORPUS" \
  --rt60-range 0.12 0.75 --radius-range 0.45 1.45 \
  --snr-range 0 30 --snr-clean-prob 0.25 --seed 11)

# Stages 1-5 (speech / rir / echoed / finetune / frozen location),
# 15k/15k/15k/5k/15k updates at B=16 — run J's exact stage budgets.
python scripts/run_pipeline.py --store-dir "$STORE" "${COMMON[@]}" \
  --resume --log-every 1000

# Stage 6: joint 2-D polar localizer, run-H recipe as one command.
python scripts/train_location.py --store-dir "$STORE" "${COMMON[@]}" \
  --joint --predict-radius --tail-weight 1.0 \
  --rir-bank 1024 --rir-bank-rt60s 8 --rir-bank-radii 8 \
  --bank-pretrain-updates "$BANK_UPDATES" --updates "$TOTAL_UPDATES" \
  --keep-checkpoints 8 --log-every 2000 --resume
