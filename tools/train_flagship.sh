#!/bin/bash
# Chunked flagship training (see --max-per-run in train_flagship.py: the
# axon tunnel client leaks per-dispatch bookkeeping, so each process runs
# a bounded chunk and a fresh process resumes from the checkpoint).
# Usage: PYTHONPATH=/root/.axon_site:. bash tools/train_flagship.sh [steps]
set -u
STEPS=${1:-6000}
CHUNK=${CHUNK:-500}
POOL=${POOL:-/tmp/flagship_pool.npy}
# RESUME_START=1 continues an existing partial checkpoint instead of
# starting over (used when re-tuning CHUNK mid-run)
if [ "${RESUME_START:-0}" -eq 1 ]; then
  first=0
else
  rm -f artifacts/cnn_trained_bf16.partial.npz
  first=1
fi
while true; do
  if [ $first -eq 1 ]; then RESUME=""; first=0; else RESUME="--resume"; fi
  python tools/train_flagship.py --steps "$STEPS" --lmbda 0.025 \
    --sync-every 8 --ckpt-every "$CHUNK" --max-per-run "$CHUNK" \
    --pool-cache "$POOL" $RESUME
  rc=$?
  if [ $rc -eq 0 ]; then echo "training complete"; exit 0; fi
  if [ $rc -ne 3 ]; then echo "trainer failed rc=$rc"; exit $rc; fi
done
