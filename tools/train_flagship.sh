#!/bin/bash
# Chunked flagship training (see --max-per-run in train_flagship.py: the
# axon tunnel client leaks per-dispatch bookkeeping, so each process runs
# a bounded chunk and a fresh process resumes from the checkpoint).
# Usage: PYTHONPATH=/root/.axon_site:. bash tools/train_flagship.sh [steps]
# Env: LMBDA (default 0.025), OUT (default artifacts), CHUNK, POOL.
#   LMBDA=0.013 OUT=artifacts_q65 trains the second operating point that
#   lands near the reference's 0.650 bpp Kodak headline (BASELINE.md:15).
set -u
STEPS=${1:-6000}
CHUNK=${CHUNK:-500}
POOL=${POOL:-/tmp/flagship_pool.npy}
LMBDA=${LMBDA:-0.025}
MODEL=${MODEL:-cnn}      # cnn | ind (scalable flagship)
LAMBDAS=${LAMBDAS:-}     # e.g. "0.0035 0.065" for MODEL=ind
TAIL=${TAIL:-0}          # --tail-penalty weight (latent-range reg)
BATCH=${BATCH:-16}
OUT=${OUT:-artifacts}
LR=${LR:-1e-4}
INIT=${INIT:-}   # warm-start artifact for fine-tune continuations
FREEZE=${FREEZE:-0}  # 1 = entropy-settling tail (--freeze-transforms)
FREEZE_BASE=${FREEZE_BASE:-0}  # 1 = scalable phase A (--freeze-base)
MULTI_DEC=${MULTI_DEC:-0}  # 1 = dual decoders (--multiple-decoder)
# RESUME_START=1 continues an existing partial checkpoint instead of
# starting over (used when re-tuning CHUNK mid-run)
if [ "${RESUME_START:-0}" -eq 1 ]; then
  first=0
else
  rm -f "$OUT/${MODEL}_trained_bf16.partial.npz"
  first=1
fi
while true; do
  if [ $first -eq 1 ]; then RESUME=""; first=0; else RESUME="--resume"; fi
  EXTRA=""
  # warm start applies to the first chunk only; later chunks resume the
  # partial checkpoint, which already carries the fine-tuned params
  if [ -n "$INIT" ] && [ -z "$RESUME" ]; then EXTRA="--init-npz $INIT"; fi
  if [ "$FREEZE" -eq 1 ]; then EXTRA="$EXTRA --freeze-transforms"; fi
  if [ "$FREEZE_BASE" -eq 1 ]; then EXTRA="$EXTRA --freeze-base"; fi
  if [ "$MULTI_DEC" -eq 1 ]; then EXTRA="$EXTRA --multiple-decoder"; fi
  if [ -n "$LAMBDAS" ]; then EXTRA="$EXTRA --lambda-list $LAMBDAS"; fi
  if [ "$TAIL" != "0" ]; then EXTRA="$EXTRA --tail-penalty $TAIL"; fi
  python tools/train_flagship.py --steps "$STEPS" --lmbda "$LMBDA" \
    --model "$MODEL" --batch "$BATCH" --out "$OUT" --lr "$LR" \
    --sync-every 8 --ckpt-every "$CHUNK" --max-per-run "$CHUNK" \
    --pool-cache "$POOL" $RESUME $EXTRA
  rc=$?
  if [ $rc -eq 0 ]; then echo "training complete"; exit 0; fi
  if [ $rc -ne 3 ]; then echo "trainer failed rc=$rc"; exit $rc; fi
done
