#!/bin/bash
# Harvest the dmc_swingup live run into committed evidence
# (results/dmc_swingup/): CSV with _step, return curve, DMC overlay
# figure, dream GIF. Run AFTER the training run is stopped (or between
# segments); re-runnable.
set -eu
RUN=runs/dmc_swingup
OUT=results/dmc_swingup
mkdir -p "$OUT"

python - <<'PYEOF'
from pydreamer_tpu.analysis import export_csv, plot_curves, make_dream_gif
from pathlib import Path

keys = ["_step", "agent/return", "agent/return_cum", "agent/return_max",
        "agent/episode_length", "agent/env_steps", "train/loss_model",
        "train/policy_value", "train/policy_entropy"]
n = export_csv("runs/dmc_swingup", "results/dmc_swingup/metrics.csv", keys)
print("metrics rows:", n)

plot_curves(["runs/dmc_swingup"], "agent/return_cum",
            "results/dmc_swingup/return_curve.png")
# Overlay: both committed DMC runs on one grad-step axis. The reference
# ships no DMC baseline CSVs (its results/baselines are Atari-only) and
# this image has no egress to fetch danijar's published scores, so the
# overlay uses the repo's own two runs + the task ceiling (~1000).
plot_curves(["runs/dmc_swingup", "runs/dmc_cartpole"], "agent/return_cum",
            "results/dmc_swingup/overlay_dmc_runs.png")

dreams = sorted(Path("runs/dmc_swingup/d2_wm_dream").glob("*.npz"))
if dreams:
    f = make_dream_gif(dreams[-1], "results/dmc_swingup/dream.gif")
    print("gif frames:", f, "from", dreams[-1].name)
PYEOF
ls -la "$OUT"
