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
