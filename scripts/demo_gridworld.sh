#!/bin/bash
# GridWorld end-to-end learning demo, run as resumable segments.
#
# Segmentation works around a host-memory leak in THIS dev box's TPU tunnel
# client (device_put staging buffers never freed — see CLAUDE.md); each
# segment restarts the processes and resumes from the checkpoint, which also
# exercises the framework's resume path. On a normal TPU VM a single launch
# suffices.
set -eu
RUN_DIR="${1:-runs/grid_demo}"
TARGET_STEPS="${2:-20000}"
SEGMENT="${3:-2500}"

# Resume from the existing checkpoint's step, if any.
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
  timeout 3600 python -m pydreamer_tpu.launch \
    --configs defaults gridworld \
    --run_dir "$RUN_DIR" \
    --n_steps "$cur" \
    --save_interval 100 --log_interval 50 --eval_interval 0 \
    --data_workers 2 --limit_step_ratio 200 || true
done
echo "=== demo done at $cur steps ==="
