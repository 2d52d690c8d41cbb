"""Tracking unit tests: Run layout, metrics, npz artifacts, checkpoints, resume.

Counterpart of the reference's mlflow glue (reference: pydreamer/tools.py:
49-197); here the contract is filesystem-first (tracking.py).
"""

import json

import numpy as np
import pytest

from pydreamer_tpu.tracking import (Run, init_run, load_checkpoint_file,
                                    save_checkpoint_file)


@pytest.fixture(autouse=True)
def isolate_env(monkeypatch):
    monkeypatch.delenv("PYDREAMER_RUN_DIR", raising=False)
    monkeypatch.delenv("MLFLOW_TRACKING_URI", raising=False)
    return monkeypatch


class TestRun:
    def test_params_and_metrics_roundtrip(self, tmp_path):
        run = Run(tmp_path / "r1")
        run.log_params({"batch_size": 32, "env_id": "Atari-Pong"})
        assert json.loads((run.dir / "params.json").read_text())["batch_size"] == 32

        run.log_metrics({"loss": 1.5, "bad": float("nan"), "inf": float("inf")}, step=7)
        run.log_metrics({"loss": 1.0}, step=8)
        rows = run.read_metrics()
        assert [r["_step"] for r in rows] == [7, 8]
        # nan/inf filtered (reference: train.py nan-filtering before mlflow)
        assert "bad" not in rows[0] and "inf" not in rows[0]
        assert rows[0]["loss"] == 1.5

    def test_npz_artifact_roundtrip(self, tmp_path):
        run = Run(tmp_path / "r1")
        data = {"image": np.random.randint(0, 255, (4, 8, 8, 3), np.uint8),
                "reward": np.ones(4, np.float32)}
        run.log_npz(data, "0000001.npz", subdir="d2_wm_closed")
        out = run.load_npz("0000001.npz", subdir="d2_wm_closed")
        np.testing.assert_array_equal(out["image"], data["image"])
        assert out["reward"].dtype == np.float32

    def test_checkpoint_roundtrip_with_target(self, tmp_path):
        run = Run(tmp_path / "r1")
        state = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
                 "opt": {"count": np.int32(3)}}
        run.save_checkpoint(state, step=42)
        restored, step = run.load_checkpoint(target=state)
        assert step == 42
        np.testing.assert_array_equal(restored["params"]["w"], state["params"]["w"])

    def test_checkpoint_missing_and_corrupt(self, tmp_path):
        assert load_checkpoint_file(tmp_path / "nope.ckpt") is None
        bad = tmp_path / "bad.ckpt"
        bad.write_bytes(b"not msgpack at all")
        assert load_checkpoint_file(bad) is None

    def test_checkpoint_file_is_atomic(self, tmp_path):
        # No .tmp residue after a successful write.
        path = tmp_path / "checkpoints" / "latest.ckpt"
        save_checkpoint_file(path, {"a": np.zeros(2)}, step=1)
        save_checkpoint_file(path, {"a": np.ones(2)}, step=2)
        leftovers = list(path.parent.glob("*.tmp"))
        assert leftovers == []
        state, step = load_checkpoint_file(path)
        assert step == 2


class TestInitRun:
    def test_subprocess_joins_via_env(self, tmp_path, isolate_env):
        parent = init_run(run_dir=str(tmp_path / "parent"))
        # A subprocess calling init_run() with no args lands in the same dir
        # (reference: MLFLOW_RUN_ID env join, tools.py:60-63,92).
        child = init_run()
        assert child.dir == parent.dir

    def test_resume_by_id(self, tmp_path, isolate_env):
        root = tmp_path / "runs"
        first = init_run(root_dir=str(root), resume_id="exp-7")
        isolate_env.delenv("PYDREAMER_RUN_DIR")
        second = init_run(root_dir=str(root), resume_id="exp-7")
        assert second.dir == first.dir

    def test_fresh_runs_are_distinct(self, tmp_path, isolate_env):
        root = str(tmp_path / "runs")
        a = init_run(root_dir=root)
        isolate_env.delenv("PYDREAMER_RUN_DIR")
        b = init_run(root_dir=root)
        assert a.dir != b.dir
