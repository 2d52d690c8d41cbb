#!/bin/bash
# Harvest the dmc_swingup live runs into committed evidence
# (results/dmc_swingup/):
#   run 1 (runs/dmc_swingup,  tanh_normal): the collapse evidence (r4; its
#     live run dir is gone — the committed CSV/PNG are the artifact now,
#     so they are only re-exported if the dir reappears)
#   run 2 (trunc_normal, r5a): reached 10.8k before a mid-round box reset
#     wiped its run dir — preserved statically as
#     results/dmc_swingup/run2_trunc_normal_partial.csv (not re-exported)
#   run 3 (runs/dmc_swingup3, trunc_normal, r5b): the headline evidence
#     run, relaunched from scratch; exported to metrics.csv
# CSVs with _step, return curves, overlays (incl. vs the published
# DreamerV2 baseline), dream GIF.
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
        "agent/policy_value", "agent/policy_entropy", "train/loss_critic",
        "train/data_env_steps"]

run1 = Path("runs/dmc_swingup")
have_run1 = (run1 / "metrics.jsonl").exists()
if have_run1:
    n1 = export_csv(run1, "results/dmc_swingup/run1_tanh_normal_collapse.csv", keys)
    plot_curves([run1], "agent/return_cum",
                "results/dmc_swingup/run1_tanh_normal_collapse.png")
    print("rows run1:", n1)
else:
    print("run1 dir absent; keeping committed run1 artifacts")

n3 = export_csv("runs/dmc_swingup3",
                "results/dmc_swingup/metrics.csv", keys)
print("rows run3:", n3)

plot_curves(["runs/dmc_swingup3"], "agent/return_cum",
            "results/dmc_swingup/return_curve.png")
# Overlay 1: all available DMC run dirs on one grad-step axis (task
# ceiling ~1000). plot_curves skips dirs without metrics.
plot_curves(["runs/dmc_swingup3", "runs/dmc_swingup", "runs/dmc_cartpole"],
            "agent/return_cum", "results/dmc_swingup/overlay_dmc_runs.png")
# Overlay 2 (reference figures.ipynb pattern): the swingup run vs the
# published DreamerV2 dmc_vision curve, on a shared ENV-step axis
# (x = train/data_env_steps interpolated at each agent flush). Baseline
# provenance + accuracy caveats: results/baselines/README.md.
plot_curves(["runs/dmc_swingup3"],
            "agent/return_cum",
            "results/dmc_swingup/overlay_vs_dreamerv2.png",
            baseline_csv="results/baselines/dmc-dreamerv2.csv",
            baseline_env="dmc_cartpole_swingup",
            baseline_label="dreamerv2 (published, transcribed)",
            x_metric="train/data_env_steps")

dreams = sorted(Path("runs/dmc_swingup3/d2_wm_dream").glob("*.npz"))
if dreams:
    f = make_dream_gif(dreams[-1], "results/dmc_swingup/dream.gif")
    print("gif frames:", f, "from", dreams[-1].name)
PYEOF
ls -la "$OUT"
