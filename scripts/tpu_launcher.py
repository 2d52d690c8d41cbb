#!/usr/bin/env python
"""Managed sweep launcher for Cloud TPU VMs / pod slices.

TPU-native counterpart of the reference's XManager/Vertex-AI launcher
(reference: scripts/xlauncher.py:50-146, which builds managed JobGroups with
job requirements and sweep metadata). This controller expands a
(configs x seeds) sweep into one job per combination and MANAGES each job's
lifecycle rather than fire-and-forgetting an ssh command:

  * TPU-VM create-or-reuse (describe first; create only when absent)
  * job start under nohup with a per-job log + done/fail marker files
  * status polling: TPU state (READY / PREEMPTED / ...) + marker probes
  * preemption recovery: delete + recreate the VM and relaunch the SAME
    run via PYDREAMER_RESUME_ID — training resumes from the checkpoint in
    the gs:// run dir (framework resume: pydreamer_tpu/tracking.py)
  * teardown of the VMs on completion or failure (--keep-alive to skip)

Multi-host slices run the same command on every worker
(`--worker=all`); `jax.distributed.initialize()` (see
pydreamer_tpu/parallel/multihost.py) wires them into one SPMD learner.

Usage:
  python scripts/tpu_launcher.py --name pong \
      --tpu-type v5litepod-8 --zone us-central1-a \
      --configlist "defaults atari" --seeds 3 \
      --gcs gs://my-bucket/runs
Add --dry-run to print every gcloud invocation without executing.
"""

from __future__ import annotations

import argparse
import shlex
import subprocess
import sys
import time
from dataclasses import dataclass, field
from typing import Callable, List, Optional

DONE_MARKER = "/tmp/pydreamer_job_done"
FAIL_MARKER = "/tmp/pydreamer_job_fail"


@dataclass
class TpuJob:
    """One sweep entry bound to one TPU VM."""

    name: str            # run name == resume id
    tpu_name: str
    configs: str         # space-separated config union
    seed: int
    zone: str
    tpu_type: str
    version: str
    gcs: str
    workdir: str
    extra: str
    spot: bool = False
    state: str = "PENDING"   # PENDING/RUNNING/DONE/FAILED
    restarts: int = 0

    # -- gcloud command builders (pure; unit-tested) ----------------------

    def describe_cmd(self) -> List[str]:
        return ["gcloud", "compute", "tpus", "tpu-vm", "describe",
                self.tpu_name, f"--zone={self.zone}", "--format=value(state)"]

    def create_cmd(self) -> List[str]:
        cmd = ["gcloud", "compute", "tpus", "tpu-vm", "create", self.tpu_name,
               f"--zone={self.zone}", f"--accelerator-type={self.tpu_type}",
               f"--version={self.version}"]
        if self.spot:
            cmd.append("--spot")
        return cmd

    def delete_cmd(self) -> List[str]:
        return ["gcloud", "compute", "tpus", "tpu-vm", "delete", self.tpu_name,
                f"--zone={self.zone}", "--quiet"]

    def train_command(self) -> str:
        # PYDREAMER_RESUME_ID makes any relaunch (preemption, crash-loop)
        # continue the same run: the tracking layer finds the run dir by id
        # and the learner reloads the latest checkpoint.
        inner = (
            f"cd {self.workdir} && "
            f"rm -f {DONE_MARKER} {FAIL_MARKER} && "
            f"(PYDREAMER_RESUME_ID={self.name} "
            f"python -m pydreamer_tpu.launch --configs {self.configs} "
            f"--seed {self.seed} --run_dir {self.gcs}/{self.name} {self.extra} "
            f"&& touch {DONE_MARKER} || touch {FAIL_MARKER}) "
            f">> /tmp/pydreamer_{self.name}.log 2>&1"
        )
        return f"nohup bash -c {shlex.quote(inner)} >/dev/null 2>&1 &"

    def ssh_cmd(self, remote_command: str) -> List[str]:
        return ["gcloud", "compute", "tpus", "tpu-vm", "ssh", self.tpu_name,
                f"--zone={self.zone}", "--worker=all",
                "--command", remote_command]

    def probe_cmd(self) -> List[str]:
        # Prints DONE / FAIL / RUNNING on the first worker.
        probe = (f"if [ -f {DONE_MARKER} ]; then echo DONE; "
                 f"elif [ -f {FAIL_MARKER} ]; then echo FAIL; "
                 f"else echo RUNNING; fi")
        return ["gcloud", "compute", "tpus", "tpu-vm", "ssh", self.tpu_name,
                f"--zone={self.zone}", "--worker=0", "--command", probe]


def build_jobs(args) -> List[TpuJob]:
    jobs = []
    for configs in args.configlist:
        for seed in range(args.seeds):
            run_name = f"{args.name}-{configs.replace(' ', '-')}-s{seed}"
            jobs.append(TpuJob(
                name=run_name,
                tpu_name=f"pyd-{run_name}"[:60].rstrip("-"),
                configs=configs, seed=seed, zone=args.zone,
                tpu_type=args.tpu_type, version=args.version,
                gcs=args.gcs, workdir=args.workdir, extra=args.extra,
                spot=args.spot))
    return jobs


class Controller:
    """Drives the job fleet: create -> launch -> poll -> recover -> teardown.

    ``runner(cmd) -> (returncode, stdout)`` is injectable for tests/dry-run.
    """

    def __init__(self, runner: Optional[Callable] = None, dry_run: bool = False,
                 max_restarts: int = 10):
        self.dry_run = dry_run
        self.max_restarts = max_restarts
        self.runner = runner or self._subprocess_runner

    def _subprocess_runner(self, cmd):
        print("$", " ".join(shlex.quote(c) for c in cmd), flush=True)
        if self.dry_run:
            return 0, ""
        r = subprocess.run(cmd, capture_output=True, text=True)
        return r.returncode, (r.stdout or "").strip()

    # -- lifecycle steps --------------------------------------------------

    def tpu_state(self, job: TpuJob) -> str:
        rc, out = self.runner(job.describe_cmd())
        if rc != 0:
            return "ABSENT"
        return (out.splitlines() or ["UNKNOWN"])[-1].strip() or "UNKNOWN"

    def ensure_tpu(self, job: TpuJob) -> bool:
        state = self.tpu_state(job)
        if state == "READY":
            return True
        if state in ("PREEMPTED", "TERMINATED"):
            self.runner(job.delete_cmd())
            state = "ABSENT"
        if state == "ABSENT":
            rc, _ = self.runner(job.create_cmd())
            return rc == 0 or self.dry_run
        # CREATING / REPAIRING / ...: not usable yet, not an error.
        return False

    def launch(self, job: TpuJob) -> bool:
        rc, _ = self.runner(job.ssh_cmd(job.train_command()))
        if rc == 0 or self.dry_run:
            job.state = "RUNNING"
            return True
        return False

    def poll(self, job: TpuJob) -> str:
        """One poll tick; returns the job state after any recovery action."""
        tpu = self.tpu_state(job)
        if tpu in ("PREEMPTED", "TERMINATED", "ABSENT"):
            # Preemption recovery: fresh VM, same PYDREAMER_RESUME_ID.
            if job.restarts >= self.max_restarts:
                job.state = "FAILED"
                return job.state
            job.restarts += 1
            print(f"[{job.name}] TPU {tpu}; recreating and resuming "
                  f"(restart {job.restarts})", flush=True)
            if self.ensure_tpu(job) and self.launch(job):
                job.state = "RUNNING"
            else:
                job.state = "PENDING"  # try again next tick
            return job.state
        rc, out = self.runner(job.probe_cmd())
        if rc != 0:
            return job.state  # transient ssh failure: keep state
        status = out.splitlines()[-1].strip() if out else "RUNNING"
        if status == "DONE":
            job.state = "DONE"
        elif status == "FAIL":
            job.state = "FAILED"
        return job.state

    def teardown(self, jobs: List[TpuJob]):
        for job in jobs:
            self.runner(job.delete_cmd())

    # -- main loop --------------------------------------------------------

    def run(self, jobs: List[TpuJob], poll_interval: float = 60.0,
            keep_alive: bool = False) -> bool:
        try:
            for job in jobs:
                if self.ensure_tpu(job):
                    self.launch(job)
            if self.dry_run:
                return True
            while any(j.state in ("PENDING", "RUNNING") for j in jobs):
                time.sleep(poll_interval)
                for job in jobs:
                    if job.state == "PENDING":
                        if self.ensure_tpu(job):
                            self.launch(job)
                    elif job.state == "RUNNING":
                        self.poll(job)
                states = {j.name: j.state for j in jobs}
                print(f"[sweep] {states}", flush=True)
            return all(j.state == "DONE" for j in jobs)
        finally:
            if not keep_alive and not self.dry_run:
                self.teardown(jobs)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--name", required=True)
    p.add_argument("--tpu-type", default="v5litepod-8")
    p.add_argument("--version", default="tpu-ubuntu2204-base")
    p.add_argument("--zone", default="us-central1-a")
    p.add_argument("--configlist", nargs="+", required=True,
                   help='each entry is a space-separated config union, e.g. "defaults atari"')
    p.add_argument("--seeds", type=int, default=1)
    p.add_argument("--gcs", required=True, help="gs:// prefix for run dirs")
    p.add_argument("--workdir", default="~/pydreamer-tpu")
    p.add_argument("--extra", default="", help="extra CLI overrides")
    p.add_argument("--spot", action="store_true", help="spot (preemptible) VMs")
    p.add_argument("--keep-alive", action="store_true",
                   help="leave the TPU VMs up after the sweep")
    p.add_argument("--poll-interval", type=float, default=60.0)
    p.add_argument("--max-restarts", type=int, default=10)
    p.add_argument("--dry-run", action="store_true")
    args = p.parse_args(argv)

    jobs = build_jobs(args)
    ctl = Controller(dry_run=args.dry_run, max_restarts=args.max_restarts)
    ok = ctl.run(jobs, poll_interval=args.poll_interval,
                 keep_alive=args.keep_alive)
    print(f"{len(jobs)} jobs finished: "
          f"{[f'{j.name}:{j.state}' for j in jobs]}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
