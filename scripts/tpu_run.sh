#!/bin/bash
# Launch a training run on a Cloud TPU VM / pod slice — the TPU analog of
# the reference's Slurm generator (scripts/sbatch_run.sh): env-var
# parameterized, logs to a per-run file, resumable via --weight.
#
#   TPU_NAME=my-v5e ZONE=us-west4-a PARAMS=configs/video_based/savi_ldm/savi_ldm_movie_params-res128.py \
#       bash scripts/tpu_run.sh [extra train.py args...]
#
# On a pod slice the same command runs on every worker (--worker=all).
# SLOTDIFFUSION_MULTIHOST=1 is exported so train.py's
# maybe_initialize_distributed() calls jax.distributed.initialize()
# (JAX auto-detects the pod-slice topology from the TPU metadata); each
# host then loads only its process_index shard of every global batch.

set -euo pipefail

PARAMS=${PARAMS:?set PARAMS=<config .py>}
TPU_NAME=${TPU_NAME:-}
ZONE=${ZONE:-}
RUN_NAME=$(basename "${PARAMS%.py}")
LOG_DIR=${LOG_DIR:-logs}
mkdir -p "$LOG_DIR"

CMD="python -u scripts/train.py --params $PARAMS $*"

if [[ -n "$TPU_NAME" ]]; then
    gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone "$ZONE" \
        --worker=all \
        --command "cd $(pwd) && SLOTDIFFUSION_MULTIHOST=1 $CMD" \
        2>&1 | tee "$LOG_DIR/$RUN_NAME.log"
else
    # already on the TPU VM
    $CMD 2>&1 | tee "$LOG_DIR/$RUN_NAME.log"
fi
