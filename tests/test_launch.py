"""Launcher tests: multi-node role selection, watchdog, and the full
generator+learner topology end-to-end.

Covers the TF_CONFIG chief/worker role mapping (reference: launch.py:181-210)
and a bounded real launch() run (reference: launch.py:107-178).
"""

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
import pytest

from pydreamer_tpu.launch import (belongs_to_worker, check_subprocesses,
                                  get_worker_info)

REPO_ROOT = Path(__file__).resolve().parent.parent


@pytest.fixture
def clean_tf_config(monkeypatch):
    monkeypatch.delenv("TF_CONFIG", raising=False)
    return monkeypatch


class TestWorkerInfo:
    def test_no_tf_config_means_single_node(self, clean_tf_config):
        assert get_worker_info() == (None, None)
        # Single node runs everything locally.
        assert belongs_to_worker("learner", 0)
        assert belongs_to_worker("generator", 3)

    def test_chief_is_learner(self, clean_tf_config):
        clean_tf_config.setenv("TF_CONFIG", json.dumps({
            "cluster": {"chief": ["c:1"], "worker": ["w0:1", "w1:1"]},
            "task": {"type": "chief", "index": 0},
        }))
        assert get_worker_info() == ("learner", 0)
        assert belongs_to_worker("learner", 0)
        assert not belongs_to_worker("generator", 0)

    def test_worker_is_generator_with_index(self, clean_tf_config):
        clean_tf_config.setenv("TF_CONFIG", json.dumps({
            "cluster": {"chief": ["c:1"], "worker": ["w0:1", "w1:1"]},
            "task": {"type": "worker", "index": 1},
        }))
        assert get_worker_info() == ("generator", 1)
        assert belongs_to_worker("generator", 1)
        assert not belongs_to_worker("generator", 0)
        assert not belongs_to_worker("learner", 0)

    def test_empty_worker_list_means_single_node(self, clean_tf_config):
        # Vertex single-node jobs set TF_CONFIG without workers.
        clean_tf_config.setenv("TF_CONFIG", json.dumps({
            "cluster": {"chief": ["c:1"]},
            "task": {"type": "chief", "index": 0},
        }))
        assert get_worker_info() == (None, None)


def _exit_zero():
    pass


def _exit_nonzero():
    raise SystemExit(3)


class TestWatchdog:
    def _run(self, target):
        ctx = mp.get_context("spawn")
        p = ctx.Process(target=target)
        p.start()
        p.join(timeout=30)
        assert not p.is_alive()
        return p

    def test_clean_exit_removed_from_watch_list(self):
        p = self._run(_exit_zero)
        procs = [p]
        check_subprocesses(procs)
        assert procs == []

    def test_nonzero_exit_raises(self):
        p = self._run(_exit_nonzero)
        with pytest.raises(RuntimeError, match="exitcode"):
            check_subprocesses([p])


@pytest.mark.slow
def test_learner_recycle_on_rss(tmp_path):
    """max_rss_gb: the learner checkpoints and exits with the recycle code;
    the launcher relaunches it and the fresh learner resumes from the
    checkpoint until n_steps. Guards long runs against host-memory creep
    (leaky transfer clients, fragmentation)."""
    run_dir = tmp_path / "run"
    env = dict(os.environ, PYTHONPATH=str(REPO_ROOT))
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "-m", "pydreamer_tpu.launch",
         "--configs", "defaults", "gridworld", "debug",
         "--n_steps", "4", "--generator_prefill_steps", "300",
         "--eval_interval", "0", "--save_interval", "100",
         "--log_interval", "2", "--logbatch_interval", "1000",
         "--max_rss_gb", "0.05",  # always exceeded -> recycle every check
         "--run_dir", str(run_dir)],
        env=env, cwd=str(REPO_ROOT), timeout=600,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    out = proc.stdout
    assert proc.returncode == 0, f"launch failed:\n{out[-4000:]}"
    assert "requesting learner recycle" in out
    assert "Learner requested recycle; relaunching." in out
    assert "Finished 4 grad steps." in out
    from pydreamer_tpu.tracking import load_checkpoint_file
    loaded = load_checkpoint_file(run_dir / "checkpoints" / "latest.ckpt")
    assert loaded is not None and loaded[1] == 4  # resumed across recycles


@pytest.mark.slow
def test_full_topology_launch(tmp_path):
    """The one e2e path users run: `python -m pydreamer_tpu.launch --configs
    defaults gridworld debug`, bounded to a few grad steps. Asserts the full
    process topology worked: generators wrote episodes, the learner wrote
    metrics + a checkpoint, and everything (including the daemon generators
    the reference would leave hanging) exited cleanly."""
    run_dir = tmp_path / "run"
    env = dict(os.environ, PYTHONPATH=str(REPO_ROOT))
    # Don't inherit pytest's 8-virtual-device XLA_FLAGS: this test mimics the
    # real single-machine CLI environment.
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "-m", "pydreamer_tpu.launch",
         "--configs", "defaults", "gridworld", "debug",
         "--n_steps", "4", "--generator_prefill_steps", "300",
         "--eval_interval", "0", "--save_interval", "3",
         "--log_interval", "2", "--logbatch_interval", "1000",
         "--run_dir", str(run_dir)],
        env=env, cwd=str(REPO_ROOT), timeout=600,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    out = proc.stdout
    assert proc.returncode == 0, f"launch failed:\n{out[-4000:]}"

    # Generators collected episodes into the run's replay shard.
    episodes = list((run_dir / "episodes" / "0").glob("*.npz"))
    assert episodes, "generator wrote no episodes"
    # Learner trained: metrics + checkpoint artifacts.
    from pydreamer_tpu.tracking import Run
    metrics = Run(run_dir).read_metrics()
    trained = [m for m in metrics if "train/loss_model" in m]
    assert trained and np.isfinite(trained[-1]["train/loss_model"])
    assert (run_dir / "checkpoints" / "latest.ckpt").exists()
    assert "Learner finished; shutting down generators." in out


class TestTpuLauncher:
    """The managed cloud sweep controller (scripts/tpu_launcher.py) — gcloud
    is faked with an injected runner, so these test the lifecycle logic:
    create-or-reuse, launch, status polling, preemption-resume, teardown
    (reference: scripts/xlauncher.py:50-146 JobGroup management)."""

    def _args(self, **over):
        import argparse
        d = dict(name="exp", tpu_type="v5litepod-8", version="v", zone="z",
                 configlist=["defaults atari"], seeds=2, gcs="gs://b/runs",
                 workdir="~/w", extra="", spot=True)
        d.update(over)
        return argparse.Namespace(**d)

    def _load(self):
        import importlib.util
        from pathlib import Path
        spec = importlib.util.spec_from_file_location(
            "tpu_launcher",
            Path(__file__).resolve().parent.parent / "scripts" / "tpu_launcher.py")
        mod = importlib.util.module_from_spec(spec)
        import sys
        sys.modules[spec.name] = mod  # dataclasses needs the module registered
        spec.loader.exec_module(mod)
        return mod

    def test_sweep_expansion_and_resume_id(self):
        m = self._load()
        jobs = m.build_jobs(self._args())
        assert len(jobs) == 2
        assert jobs[0].name == "exp-defaults-atari-s0"
        cmd = jobs[0].train_command()
        # Relaunches resume the same run: resume id == run name.
        assert "PYDREAMER_RESUME_ID=exp-defaults-atari-s0" in cmd
        assert "--run_dir gs://b/runs/exp-defaults-atari-s0" in cmd
        assert "--seed 0" in cmd
        assert "--spot" in " ".join(jobs[0].create_cmd())

    def test_lifecycle_create_launch_done_teardown(self):
        m = self._load()
        job = m.build_jobs(self._args(seeds=1))[0]
        calls = []

        def runner(cmd):
            calls.append(cmd)
            if "describe" in cmd:
                # Absent at first (create path), READY afterwards.
                return (1, "") if not any("create" in c for c in calls[:-1]) \
                    else (0, "READY")
            if "--command" in cmd and m.DONE_MARKER in cmd[-1] and "nohup" not in cmd[-1]:
                return 0, "DONE"
            return 0, ""

        ctl = m.Controller(runner=runner)
        assert ctl.ensure_tpu(job)
        assert any("create" in c for c in calls[-1])
        assert ctl.launch(job) and job.state == "RUNNING"
        assert ctl.poll(job) == "DONE"
        ctl.teardown([job])
        assert "delete" in calls[-1]

    def test_preemption_recreates_and_resumes(self):
        m = self._load()
        job = m.build_jobs(self._args(seeds=1))[0]
        job.state = "RUNNING"
        vm = {"state": "PREEMPTED"}
        calls = []

        def runner(cmd):
            calls.append(cmd)
            if "describe" in cmd:
                return (1, "") if vm["state"] == "ABSENT" else (0, vm["state"])
            if "delete" in cmd:
                vm["state"] = "ABSENT"
            if "create" in cmd:
                vm["state"] = "READY"
            return 0, ""

        ctl = m.Controller(runner=runner)
        state = ctl.poll(job)
        assert state == "RUNNING" and job.restarts == 1
        flat = ["|".join(c) for c in calls]
        assert any("delete" in f for f in flat)      # preempted VM removed
        assert any("create" in f for f in flat)      # fresh VM
        # Relaunched with the same resume id.
        relaunch = [c for c in calls if "--command" in c and "nohup" in c[-1]]
        assert relaunch and "PYDREAMER_RESUME_ID=" + job.name in relaunch[-1][-1]

    def test_restart_cap_fails_job(self):
        m = self._load()
        job = m.build_jobs(self._args(seeds=1))[0]
        job.state = "RUNNING"
        job.restarts = 2
        ctl = m.Controller(runner=lambda cmd: (0, "PREEMPTED"), max_restarts=2)
        assert ctl.poll(job) == "FAILED"


@pytest.mark.slow
def test_sigterm_reaps_worker_pool(tmp_path):
    """SIGTERM to the launcher must kill the spawned learner + generators:
    the default handler exits without unwinding, leaving orphans that keep
    training and double-writing the run dir (observed live in r3 — an
    orphaned learner ping-ponged checkpoints against its replacement)."""
    import signal
    import time as _t

    import psutil

    run_dir = tmp_path / "run"
    env = dict(os.environ, PYTHONPATH=str(REPO_ROOT))
    env.pop("XLA_FLAGS", None)
    proc = subprocess.Popen(
        [sys.executable, "-m", "pydreamer_tpu.launch",
         "--configs", "defaults", "gridworld", "debug",
         "--n_steps", "100000", "--generator_prefill_steps", "100000",
         "--eval_interval", "0", "--run_dir", str(run_dir)],
        env=env, cwd=str(REPO_ROOT),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    try:
        ps = psutil.Process(proc.pid)
        deadline = _t.time() + 120
        children = []
        while _t.time() < deadline:
            children = ps.children(recursive=True)
            # learner + >=1 generator + mp bookkeeping
            if len([c for c in children if "spawn_main" in " ".join(c.cmdline())]) >= 2:
                break
            _t.sleep(1)
        assert children, "launcher never spawned workers"

        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=60)

        _t.sleep(2)
        survivors = [c for c in children if c.is_running()
                     and c.status() != psutil.STATUS_ZOMBIE]
        assert not survivors, (
            f"orphaned workers survived SIGTERM: "
            f"{[(c.pid, ' '.join(c.cmdline())[:60]) for c in survivors]}")
    finally:
        try:
            for c in psutil.Process(proc.pid).children(recursive=True):
                c.kill()
        except psutil.NoSuchProcess:
            pass
        proc.kill()
