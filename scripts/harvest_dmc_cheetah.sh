#!/bin/bash
# Harvest the dmc_cheetah_run live run (round 5, second DMC domain —
# VERDICT r4 next-round #7) into committed evidence
# (results/dmc_cheetah_run/): CSV with _step, return curve, overlay vs
# the transcribed published DreamerV2 cheetah_run curve on an env-step
# axis, dream GIF when logbatch artifacts exist.
# Run while the training run is live (re-runnable; export is additive).
set -eu
OUT=results/dmc_cheetah_run
mkdir -p "$OUT"

python - <<'PYEOF'
from pydreamer_tpu.analysis import export_csv, plot_curves, make_dream_gif
from pathlib import Path

keys = ["_step", "agent/return", "agent/return_cum", "agent/return_max",
        "agent/episode_length", "agent/env_steps", "train/loss_model",
        "train/policy_value", "train/policy_entropy",
        "agent/policy_value", "agent/policy_entropy", "train/loss_critic",
        "train/data_env_steps"]

run = Path("runs/dmc_cheetah_run")
n = export_csv(run, "results/dmc_cheetah_run/metrics.csv", keys)
print("rows:", n)

plot_curves([run], "agent/return_cum",
            "results/dmc_cheetah_run/return_curve.png")
# vs the published DreamerV2 cheetah_run curve (transcribed offline,
# provenance: results/baselines/README.md), shared env-step axis.
plot_curves([run], "agent/return_cum",
            "results/dmc_cheetah_run/overlay_vs_dreamerv2.png",
            baseline_csv="results/baselines/dmc-dreamerv2.csv",
            baseline_env="dmc_cheetah_run",
            baseline_label="dreamerv2 (published, transcribed)",
            x_metric="train/data_env_steps")

dreams = sorted(run.glob("d2_wm_dream/*.npz"))
if dreams:
    f = make_dream_gif(dreams[-1], "results/dmc_cheetah_run/dream.gif")
    print("gif frames:", f, "from", dreams[-1].name)
PYEOF
ls -la "$OUT"
