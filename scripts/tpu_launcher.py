#!/usr/bin/env python
"""Sweep launcher for Cloud TPU VMs / pod slices.

TPU-native counterpart of the reference's XManager/Vertex-AI launcher
(reference: scripts/xlauncher.py:50-146): expands a (configs x seeds) sweep
and starts one training job per combination — here as `gcloud compute tpus
tpu-vm` invocations instead of Caip executors. Multi-host slices run the
same command on every worker; `jax.distributed.initialize()` (see
pydreamer_tpu/parallel/multihost.py) wires them into one SPMD learner, and
TF_CONFIG-style role splitting is not needed because generators run on every
host's CPUs feeding per-host replay shards.

Usage:
  python scripts/tpu_launcher.py --name pong \
      --tpu-type v5litepod-8 --zone us-central1-a \
      --configlist "defaults atari" --seeds 3 \
      --gcs gs://my-bucket/runs
Add --dry-run to print the commands without executing.
"""

from __future__ import annotations

import argparse
import shlex
import subprocess
import sys


def build_commands(args) -> list:
    cmds = []
    for configs in args.configlist:
        for seed in range(args.seeds):
            run_name = f"{args.name}-{configs.replace(' ', '-')}-s{seed}"
            train_cmd = (
                f"cd {args.workdir} && "
                f"PYDREAMER_RESUME_ID={run_name} "
                f"python -m pydreamer_tpu.launch --configs {configs} "
                f"--seed {seed} --run_dir {args.gcs}/{run_name} {args.extra}"
            )
            tpu_name = f"pyd-{run_name}"[:60]
            cmds.append([
                "gcloud", "compute", "tpus", "tpu-vm", "ssh", tpu_name,
                f"--zone={args.zone}", "--worker=all",
                "--command", train_cmd,
            ])
    return cmds


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--name", required=True)
    p.add_argument("--tpu-type", default="v5litepod-8")
    p.add_argument("--zone", default="us-central1-a")
    p.add_argument("--configlist", nargs="+", required=True,
                   help='each entry is a space-separated config union, e.g. "defaults atari"')
    p.add_argument("--seeds", type=int, default=1)
    p.add_argument("--gcs", required=True, help="gs:// prefix for run dirs")
    p.add_argument("--workdir", default="~/pydreamer-tpu")
    p.add_argument("--extra", default="", help="extra CLI overrides")
    p.add_argument("--dry-run", action="store_true")
    args = p.parse_args(argv)

    cmds = build_commands(args)
    for cmd in cmds:
        print("$", " ".join(shlex.quote(c) for c in cmd))
        if not args.dry_run:
            subprocess.run(cmd, check=True)
    print(f"{'Would launch' if args.dry_run else 'Launched'} {len(cmds)} jobs")


if __name__ == "__main__":
    main()
