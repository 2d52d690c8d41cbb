"""Subprocess entry for tests/test_multihost.py.

Runs ONE of N jax.distributed CPU processes of the SPMD learner
(trainer.run) against a shared offline dataset + run dir. Non-main
processes poison every Run write method first, so any regression of the
process-0 gating (metrics / checkpoints / npz / text written by a non-main
process) crashes this worker and fails the parent test.

Usage: python tests/multihost_worker.py <data_dir> <run_dir> [n_steps]
       n_steps > the checkpointed step makes a relaunch resume the run
       (tests the checkpoint -> mesh place_like path).
Env:   JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID set by
       the parent test; XLA_FLAGS forces 2 local CPU devices per process.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    data_dir, run_dir = sys.argv[1], sys.argv[2]
    n_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    pid = int(os.environ["JAX_PROCESS_ID"])

    import jax
    jax.config.update("jax_platforms", "cpu")

    from pydreamer_tpu import tracking

    if pid != 0:
        def _boom(self, *a, **k):
            raise AssertionError(
                "process-0 gating regressed: non-main process wrote to the run")
        tracking.Run.log_metrics = _boom
        tracking.Run.save_checkpoint = _boom
        tracking.Run.log_npz = _boom
        tracking.Run.log_text = _boom

    from tests.util import make_conf
    conf = make_conf(
        # 2 processes x 2 virtual CPU devices = ('data': 4) mesh; global
        # batch 4 -> 2 per host -> 1 per device.
        batch_size=4, batch_length=8, mesh_data=0, mesh_model=1,
        deter_dim=32, stoch_dim=4, stoch_discrete=4, hidden_dim=32,
        cnn_depth=4, imag_horizon=3,
        reward_decoder_layers=1, terminal_decoder_layers=1,
        n_steps=n_steps, n_env_steps=10**9, log_interval=2, logbatch_interval=3,
        save_interval=2, eval_interval=3, data_workers=2,
        generator_workers=0, generator_workers_train=0, generator_workers_eval=0,
        generator_prefill_steps=0, generator_prefill_policy="random",
        buffer_size=10**6, buffer_size_offline=10**6, reset_interval=0,
        allow_mid_reset=True, env_action_repeat=1, env_no_terminal=False,
        offline_data_dir=data_dir, offline_prefill_dir=None,
        offline_eval_dir=data_dir, offline_test_dir=data_dir,
        limit_step_ratio=0, env_id=None, env_id_eval=None,
        test_batches=2, test_batch_size=2, test_save_size=1,
        eval_batches=2, eval_samples=1, eval_batch_size=2, eval_save_size=1,
        verbose=False, enable_profiler=False, run_dir=run_dir, seed=0,
        keep_state=True, scan_unroll=1,
    )

    from pydreamer_tpu.training import trainer
    trainer.run(conf, run_dir=run_dir)

    assert jax.process_count() == int(os.environ["JAX_NUM_PROCESSES"])
    print(f"MHOK {pid}", flush=True)


if __name__ == "__main__":
    main()
