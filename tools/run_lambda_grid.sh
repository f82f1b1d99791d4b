#!/bin/bash
# λ-grid fine-tunes for the RD curve (VERDICT r3 next #4): three more
# operating points warm-started from the committed λ=0.013 flagship.
# Run AFTER the TPU is free: PYTHONPATH=/root/.axon_site:. bash tools/run_lambda_grid.sh
set -u
STEPS=${STEPS:-3000}
INIT=${INIT:-artifacts_committed/cnn_q65_bf16.npz}
for LM in 0.0035 0.025; do
  OUTDIR="artifacts_l${LM#0.}"
  if [ -f "$OUTDIR/cnn_trained_bf16.npz" ]; then
    echo "skip λ=$LM (exists)"; continue
  fi
  echo "=== fine-tune λ=$LM -> $OUTDIR ==="
  LMBDA=$LM OUT=$OUTDIR INIT=$INIT CHUNK=${CHUNK:-3000} \
    POOL=/tmp/flagship_pool.npy bash tools/train_flagship.sh "$STEPS" \
    || exit $?
done
echo "grid done"
