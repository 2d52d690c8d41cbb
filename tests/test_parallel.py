"""SPMD tests on the 8-device virtual CPU mesh: sharded train step, TP rules,
multi-chip dry run — 'multi-node without a cluster' (SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from tests.util import make_conf, make_batch

from pydreamer_tpu.parallel import (DistributedContext, make_mesh,
                                    param_shardings)


def small_conf(**over):
    return make_conf(
        deter_dim=32, stoch_dim=4, stoch_discrete=4, hidden_dim=32,
        cnn_depth=4, batch_length=4, batch_size=8, imag_horizon=2,
        reward_decoder_layers=1, terminal_decoder_layers=1,
        mesh_data=0, mesh_model=1, **over)


class TestMesh:
    def test_make_mesh_shapes(self):
        mesh = make_mesh(4, 2)
        assert dict(mesh.shape) == {"data": 4, "model": 2}
        mesh = make_mesh(0, 1)
        assert mesh.shape["data"] == 8

    def test_param_sharding_rules(self):
        mesh = make_mesh(4, 2)
        params = {
            "big": jnp.zeros((64, 256)),
            "small": jnp.zeros((16, 16)),
            "vec": jnp.zeros((256,)),
        }
        sh = param_shardings(params, mesh, tp_min_size=256)
        assert sh["big"].spec == P(None, "model")
        assert sh["small"].spec == P()
        assert sh["vec"].spec == P()


class TestShardedTrainStep:
    def test_dp_step_runs_and_matches_single(self):
        """8-way data-parallel step executes and produces finite losses."""
        conf = small_conf()
        from pydreamer_tpu.models.dreamer import Dreamer
        from pydreamer_tpu.training.train_step import TrainStep

        model = Dreamer(conf)
        params = model.init(jax.random.PRNGKey(0))
        trainstep = TrainStep(model, conf)
        opt_state = trainstep.init_optimizer(params)
        batch = {k: jnp.asarray(v) for k, v in make_batch(conf, T=4, B=8).items()}
        state = model.init_state(8)

        ctx = DistributedContext(conf)
        assert ctx.n_data == 8
        p = ctx.place_params(params)
        o = ctx.place_opt_state(opt_state, params)
        b = ctx.place_batch(batch)
        s = ctx.place_state(state)

        p2, o2, s2, metrics, _, _ = trainstep(p, o, b, s, 1, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss_model"]))
        # params stay replicated after the update
        leaf = jax.tree_util.tree_leaves(p2)[0]
        assert leaf.sharding.is_fully_replicated

    def test_dryrun_multichip_entrypoint(self):
        import sys
        sys.path.insert(0, ".")
        from __graft_entry__ import dryrun_multichip
        dryrun_multichip(8)


def test_trainer_spmd_end_to_end(tmp_path, monkeypatch):
    """Full learner loop on the 8-device virtual mesh: collect -> 2 sharded
    gradient steps -> checkpoint. The trainer auto-activates SPMD."""
    monkeypatch.setenv("PYDREAMER_RUN_DIR", str(tmp_path / "run"))
    run_dir = tmp_path / "run"

    from pydreamer_tpu import generator as gen
    gen.main(env_id="Grid-4x64", save_uri=str(run_dir / "episodes" / "0"),
             worker_id=0, policy_main="random", num_steps=150,
             env_time_limit=20, steps_per_npz=50, log_metrics=False)

    conf = small_conf(
        env_id="Grid-4x64", action_dim=4, env_time_limit=20,
        n_steps=2, n_env_steps=10**9, log_interval=1, logbatch_interval=1000,
        save_interval=2, eval_interval=0, data_workers=0,
        generator_workers=1, generator_workers_train=0, generator_workers_eval=0,
        generator_prefill_steps=100, generator_prefill_policy="random",
        buffer_size=10**6, buffer_size_offline=0, reset_interval=0,
        allow_mid_reset=True, env_action_repeat=1, env_no_terminal=False,
        offline_data_dir=None, offline_prefill_dir=None, offline_eval_dir=None,
        offline_test_dir=None, limit_step_ratio=0, env_id_eval=None,
        test_batches=2, test_batch_size=2, test_save_size=1,
        eval_batches=2, eval_samples=1, eval_batch_size=2, eval_save_size=1,
        verbose=False, enable_profiler=False, run_dir=None, seed=0,
        model="dreamer", image_key="image")

    from pydreamer_tpu.training import trainer
    trainer.run(conf, run_dir=str(run_dir))

    from pydreamer_tpu.tracking import Run
    run_ = Run(run_dir)
    assert run_.checkpoint_path.exists()
    rows = run_.read_metrics()
    trained = [m for m in rows if "train/loss_model" in m]
    assert trained and np.isfinite(trained[-1]["train/loss_model"])
