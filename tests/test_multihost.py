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


@pytest.mark.slow
def test_two_process_spmd_training(tmp_path):
    data_dir = tmp_path / "offline_data"
    run_dir = tmp_path / "run"
    _collect(data_dir)

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
        procs.append(subprocess.Popen(
            [sys.executable, str(REPO_ROOT / "tests" / "multihost_worker.py"),
             str(data_dir), str(run_dir)],
            env=env, cwd=str(REPO_ROOT),
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
def test_multihost_symbols_are_wired():
    """Guard against the round-1 failure mode: multihost helpers existing but
    never called. The trainer must reference the multihost entry points."""
    src = (REPO_ROOT / "pydreamer_tpu" / "training" / "trainer.py").read_text()
    for sym in ("maybe_initialize_distributed", "is_main_process",
                "local_batch_size", "strict_order"):
        assert sym in src, f"trainer no longer uses {sym}"
    mesh_src = (REPO_ROOT / "pydreamer_tpu" / "parallel" / "mesh.py").read_text()
    assert "host_batch_to_global" in mesh_src
