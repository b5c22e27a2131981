#!/bin/bash
# Seed-duplication wrapper — the analog of the reference's
# dup_run_sbatch.sh (:27-36): SA/SAVi training is seed-sensitive, so
# launch REPEAT copies of a config with different seeds, each with its own
# config copy and checkpoint dir.
#
#   REPEAT=3 PARAMS=configs/video_based/savi/savi_movie_params-res128.py \
#       bash scripts/dup_run_tpu.sh [extra train.py args...]

set -euo pipefail

PARAMS=${PARAMS:?set PARAMS=<config .py>}
REPEAT=${REPEAT:-3}
BASE=$(basename "${PARAMS%.py}")

for i in $(seq 1 "$REPEAT"); do
    DUP="${PARAMS%.py}-dup${i}.py"
    cp "$PARAMS" "$DUP"
    printf '\nSlotAttentionParams.seed = %d\n' "$i" >> "$DUP"
    PARAMS="$DUP" bash scripts/tpu_run.sh \
        --ckp_path "checkpoint/${BASE}-dup${i}" "$@"
done
