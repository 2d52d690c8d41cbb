#!/bin/bash
# Harvest the dmc_swingup live runs into committed evidence
# (results/dmc_swingup/):
#   run 1 (runs/dmc_swingup,  tanh_normal): the collapse evidence
#   run 2 (runs/dmc_swingup3, trunc_normal): the fixed, rising run
# CSVs with _step, return curves, an overlay of all DMC runs, dream GIF.
# Run AFTER the training run is stopped (or between segments); re-runnable.
set -eu
OUT=results/dmc_swingup
mkdir -p "$OUT"

python - <<'PYEOF'
from pydreamer_tpu.analysis import export_csv, plot_curves, make_dream_gif
from pathlib import Path

keys = ["_step", "agent/return", "agent/return_cum", "agent/return_max",
        "agent/episode_length", "agent/env_steps", "train/loss_model",
        "train/policy_value", "train/policy_entropy",
        "agent/policy_value", "agent/policy_entropy", "train/loss_critic"]
n1 = export_csv("runs/dmc_swingup",
                "results/dmc_swingup/run1_tanh_normal_collapse.csv", keys)
n2 = export_csv("runs/dmc_swingup3",
                "results/dmc_swingup/metrics.csv", keys)
print("rows run1:", n1, "run2:", n2)

plot_curves(["runs/dmc_swingup"], "agent/return_cum",
            "results/dmc_swingup/run1_tanh_normal_collapse.png")
plot_curves(["runs/dmc_swingup3"], "agent/return_cum",
            "results/dmc_swingup/return_curve.png")
# Overlay: all committed DMC runs on one grad-step axis. The reference
# ships no DMC baseline CSVs (its results/baselines are Atari-only) and
# this box has no egress to fetch danijar's published scores, so the
# overlay compares the repo's own runs (task ceiling ~1000).
plot_curves(["runs/dmc_swingup3", "runs/dmc_swingup", "runs/dmc_cartpole"],
            "agent/return_cum", "results/dmc_swingup/overlay_dmc_runs.png")

dreams = sorted(Path("runs/dmc_swingup3/d2_wm_dream").glob("*.npz"))
if dreams:
    f = make_dream_gif(dreams[-1], "results/dmc_swingup/dream.gif")
    print("gif frames:", f, "from", dreams[-1].name)
PYEOF
ls -la "$OUT"
