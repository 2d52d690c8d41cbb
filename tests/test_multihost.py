"""Multi-host SPMD learner tests: 2 real jax.distributed CPU processes.

This is the "multi-node without a cluster" stance (SURVEY §4) applied to the
framework's NEW distributed backend (SURVEY §5.8): two coordinator-connected
processes, each with 2 virtual CPU devices, run trainer.run() over a shared
offline dataset and a shared run dir — exercising per-host batch feeding
(jax.make_array_from_process_local_data), strict-order stream/TBTT-state
alignment, collective fetches for logging/checkpointing, and the process-0
write gating (non-main workers poison all Run writers; see
tests/multihost_worker.py).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from pydreamer_tpu.tracking import Run

REPO_ROOT = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _collect(dirpath, steps=150):
    from pydreamer_tpu import generator as gen
    gen.main(env_id="Grid-4x64", save_uri=str(dirpath), worker_id=0,
             policy_main="random", num_steps=steps, env_time_limit=20,
             steps_per_npz=50, log_metrics=False)


def _spawn_workers(data_dir, run_dir, n_steps=None):
    """Run 2 jax.distributed CPU worker processes to completion; returns
    their combined outputs (asserts both exited 0 and reported MHOK)."""
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            PYTHONPATH=str(REPO_ROOT),
        )
        cmd = [sys.executable, str(REPO_ROOT / "tests" / "multihost_worker.py"),
               str(data_dir), str(run_dir)]
        if n_steps is not None:
            cmd.append(str(n_steps))
        procs.append(subprocess.Popen(
            cmd, env=env, cwd=str(REPO_ROOT),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    outs = []
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"
        assert f"MHOK {pid}" in out
    return outs


@pytest.mark.slow
def test_two_process_spmd_training(tmp_path):
    data_dir = tmp_path / "offline_data"
    run_dir = tmp_path / "run"
    _collect(data_dir)

    outs = _spawn_workers(data_dir, run_dir)

    # Process 0 wrote metrics; steps are unique (no duplicate writers).
    metrics = Run(run_dir).read_metrics()
    trained = [m for m in metrics if "train/loss_model" in m]
    assert trained, "no training metrics written"
    assert np.isfinite(trained[-1]["train/loss_model"])
    steps = [m.get("_step") for m in trained]
    assert len(steps) == len(set(steps)), f"duplicate metric steps: {steps}"

    # Checkpoint written (by process 0) and loadable.
    assert (run_dir / "checkpoints" / "latest.ckpt").exists()

    # The logbatch fetch path ran: d2_wm_closed artifacts exist.
    closed = list((run_dir / "d2_wm_closed").glob("*.npz"))
    assert closed, "log_batch_npz (collective fetch path) wrote nothing"


@pytest.mark.slow
def test_two_process_resume_from_checkpoint(tmp_path):
    """Kill-and-relaunch: a 2-process SPMD session trains to step k and
    exits; a fresh 2-process session over the same run dir must restore the
    checkpoint onto the mesh (parallel/mesh.py place_like) and continue from
    k — the one multihost path round 2 left untested
    (reference resume: train.py:114-116)."""
    data_dir = tmp_path / "offline_data"
    run_dir = tmp_path / "run"
    _collect(data_dir)

    # Phase 1: train to step 3 (checkpoint lands at step 2, save_interval=2).
    _spawn_workers(data_dir, run_dir, n_steps=3)
    from pydreamer_tpu.tracking import load_checkpoint_file
    ck = load_checkpoint_file(run_dir / "checkpoints" / "latest.ckpt")
    assert ck is not None
    _, step1 = ck
    assert step1 >= 2

    # Phase 2: fresh processes, same run dir, higher n_steps.
    outs = _spawn_workers(data_dir, run_dir, n_steps=6)
    for pid, out in enumerate(outs):
        assert "Loaded model from checkpoint epoch" in out, (
            f"process {pid} did not resume:\n{out[-2000:]}")

    ck = load_checkpoint_file(run_dir / "checkpoints" / "latest.ckpt")
    state_dict, step2 = ck
    assert step2 == 6, f"resumed run did not continue to n_steps (at {step2})"
    # Restored-and-trained params are finite host arrays.
    leaves = [np.asarray(x) for x in
              __import__("jax").tree_util.tree_leaves(state_dict["params"])]
    assert all(np.isfinite(l).all() for l in leaves)

    # Metric steps stay unique across the two sessions (no double-writes
    # from the relaunch).
    metrics = Run(run_dir).read_metrics()
    trained = [m for m in metrics if "train/loss_model" in m]
    steps = [m.get("_step") for m in trained]
    assert len(steps) == len(set(steps)), f"duplicate metric steps: {steps}"
    assert max(steps) > step1


@pytest.mark.slow
def test_multihost_symbols_are_wired():
    """Guard against the round-1 failure mode: multihost helpers existing but
    never called. The trainer must reference the multihost entry points."""
    src = (REPO_ROOT / "pydreamer_tpu" / "training" / "trainer.py").read_text()
    for sym in ("maybe_initialize_distributed", "is_main_process",
                "local_batch_size", "strict_order"):
        assert sym in src, f"trainer no longer uses {sym}"
    mesh_src = (REPO_ROOT / "pydreamer_tpu" / "parallel" / "mesh.py").read_text()
    assert "host_batch_to_global" in mesh_src
