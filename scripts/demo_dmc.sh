#!/bin/bash
# DMC cartpole_balance end-to-end learning run, as resumable segments
# (same segmentation as demo_gridworld.sh — works around this dev box's
# TPU-tunnel host-memory leak; on a real TPU VM a single launch suffices).
#
# Hyperparameter deltas vs the `dmc` preset, with why (results/README.md):
#   gamma 0.99      — danijar DreamerV2 dmc_vision uses discount 0.99; the
#                     preset's inherited 0.999 was never validated by the
#                     reference (it committed no DMC runs) and makes the
#                     critic bootstrap ~10x longer-horizon than the H=15
#                     imagination window supports.
#   batch_size 16   — danijar DreamerV2 dmc_vision batch size; also 2x
#                     faster through this box's 58 MB/s host->device tunnel.
set -eu
RUN_DIR="${1:-runs/dmc_cartpole}"
TARGET_STEPS="${2:-20000}"
SEGMENT="${3:-2500}"
ENV_ID="${ENV_ID:-DMC-cartpole_balance}"   # e.g. ENV_ID=DMC-cartpole_swingup
ACTION_DIM="${ACTION_DIM:-1}"              # e.g. ACTION_DIM=6 for cheetah_run

cur=$(python - "$RUN_DIR" <<'PYEOF'
import sys
from pydreamer_tpu.tracking import load_checkpoint_file
ck = load_checkpoint_file(sys.argv[1] + "/checkpoints/latest.ckpt")
print(ck[1] if ck else 0)
PYEOF
)
echo "=== resuming from step $cur ==="
while [ "$cur" -lt "$TARGET_STEPS" ]; do
  cur=$((cur + SEGMENT))
  if [ "$cur" -gt "$TARGET_STEPS" ]; then cur="$TARGET_STEPS"; fi
  echo "=== segment to step $cur ==="
  timeout "${SEGMENT_TIMEOUT:-5400}" python -m pydreamer_tpu.launch \
    --configs defaults dmc \
    --env_id "$ENV_ID" --action_dim "$ACTION_DIM" \
    --run_dir "$RUN_DIR" \
    --n_steps "$cur" \
    --gamma 0.99 --batch_size 16 \
    --generator_prefill_steps 5000 \
    --generator_log_every 2 \
    --save_interval 200 --log_interval 100 --eval_interval 0 \
    --logbatch_interval 3000 \
    --generator_envs_per_worker 4 \
    --data_workers 2 --limit_step_ratio 64 --max_rss_gb 70 \
    ${EXTRA_FLAGS:-} || true
done
echo "=== dmc demo done at $cur steps ==="
