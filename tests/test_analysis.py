"""Analysis tooling tests: CSV export, curves, dream GIFs, tracking."""

import json

import numpy as np
import pytest

from pydreamer_tpu.analysis import (export_csv, learning_curve, load_metrics,
                                    make_dream_gif, plot_curves)
from pydreamer_tpu.tracking import Run, init_run, save_checkpoint_file, \
    load_checkpoint_file


@pytest.fixture
def run_with_metrics(tmp_path):
    run = Run(tmp_path / "run1")
    for step in range(0, 50, 10):
        run.log_metrics({"train/loss_model": 100.0 - step,
                         "agent/return": step * 0.1}, step=step)
    return run


class TestMetrics:
    def test_export_csv(self, run_with_metrics, tmp_path):
        out = tmp_path / "out.csv"
        n = export_csv(run_with_metrics.dir, out)
        assert n == 5
        text = out.read_text()
        assert "train/loss_model" in text.splitlines()[0]

    def test_learning_curve(self, run_with_metrics):
        xs, ys = learning_curve(run_with_metrics.dir, "agent/return")
        assert len(xs) == 5
        np.testing.assert_allclose(ys, [0.0, 1.0, 2.0, 3.0, 4.0])

    def test_plot_curves(self, run_with_metrics, tmp_path):
        out = tmp_path / "curves.png"
        plot_curves([run_with_metrics.dir], "train/loss_model", out)
        assert out.exists() and out.stat().st_size > 0

    def test_nan_metrics_filtered(self, tmp_path):
        run = Run(tmp_path / "r")
        run.log_metrics({"good": 1.0, "bad": float("nan")}, step=1)
        rows = load_metrics(run.dir)
        assert "good" in rows[0] and "bad" not in rows[0]


class TestGif:
    def test_make_dream_gif(self, tmp_path):
        T, H = 6, 16
        image = np.random.randint(0, 255, (1, T, H, H, 3), dtype=np.uint8)
        pred = np.random.randint(0, 255, (1, T, H, H, 3), dtype=np.uint8)
        npz = tmp_path / "dump.npz"
        np.savez(npz, image=image, image_pred=pred)
        out = tmp_path / "dream.gif"
        n = make_dream_gif(npz, out)
        assert n == T
        assert out.exists() and out.stat().st_size > 0


class TestTracking:
    def test_checkpoint_roundtrip(self, tmp_path):
        state = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
                 "nested": {"b": np.ones(4)}}
        path = tmp_path / "ck" / "latest.ckpt"
        save_checkpoint_file(path, state, 42)
        loaded, step = load_checkpoint_file(path)
        assert step == 42
        np.testing.assert_array_equal(loaded["params"]["w"], state["params"]["w"])

    def test_checkpoint_missing(self, tmp_path):
        assert load_checkpoint_file(tmp_path / "nope.ckpt") is None

    def test_run_resume_by_id(self, tmp_path, monkeypatch):
        monkeypatch.delenv("PYDREAMER_RUN_DIR", raising=False)
        r1 = init_run(root_dir=str(tmp_path), resume_id="exp42")
        monkeypatch.delenv("PYDREAMER_RUN_DIR", raising=False)
        r2 = init_run(root_dir=str(tmp_path), resume_id="exp42")
        assert r1.dir == r2.dir  # resumed the same run

    def test_subprocess_joins_via_env(self, tmp_path, monkeypatch):
        monkeypatch.setenv("PYDREAMER_RUN_DIR", str(tmp_path / "parent"))
        r = init_run()
        assert r.dir == tmp_path / "parent"

    def test_npz_artifacts(self, tmp_path, monkeypatch):
        monkeypatch.delenv("PYDREAMER_RUN_DIR", raising=False)
        run = Run(tmp_path / "r")
        data = {"x": np.arange(10)}
        run.log_npz(data, "test.npz", subdir="d2_wm_closed")
        loaded = run.load_npz("test.npz", subdir="d2_wm_closed")
        np.testing.assert_array_equal(loaded["x"], data["x"])
