"""Orchestration: spawn N generator processes + 1 learner, watchdog them.

Counterpart of the reference launcher (reference: launch.py:16-210):
  * parse ``--configs a b c`` + per-key overrides (conf.py)
  * detect a distributed role from TF_CONFIG (chief -> learner,
    worker[i] -> generator i); non-main workers wait for the main worker to
    create the run before joining (launch.py:45-47, tools.py:66-81)
  * spawn train+eval generators (split_fraction=0.05), optional train-only /
    eval-only generator pools, and the learner as multiprocessing Processes
  * watchdog: poll every second, fail fast if any child dies nonzero
    (launch.py:114-120,168-178)

TPU resource split: generator subprocesses get JAX_PLATFORMS=cpu so only the
learner process touches the TPU; env stepping + single-step inference are
host CPU work anyway.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time
from typing import List, Optional, Tuple

from .conf import parse_args
from .tools import configure_logging, logger, print_once
from .tracking import init_run

__all__ = ["launch", "launch_learner", "launch_generator",
           "belongs_to_worker", "get_worker_info"]


def _generator_entry(kwargs):
    # Generators must not grab the TPU; inference runs fine on host CPU.
    # Env var AND config update: some TPU images force-register the TPU
    # platform from sitecustomize regardless of JAX_PLATFORMS.
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    from . import generator
    generator.main(**kwargs)


# Learner exit code meaning "relaunch me" (clean self-recycle after hitting
# conf.max_rss_gb — see training/trainer.py). Distinct from 0 (done) and
# error codes (fail the job).
RECYCLE_EXIT_CODE = 42


def _learner_entry(conf, run_dir):
    import sys
    from .training import trainer
    if trainer.run(conf, run_dir=run_dir) == "recycle":
        sys.exit(RECYCLE_EXIT_CODE)


def launch(argv: Optional[List[str]] = None, config_dir: str = "./config"):
    configure_logging("[launcher]")
    conf = parse_args(argv, config_dir=config_dir)

    worker_type, worker_index = get_worker_info()
    is_main_worker = worker_type is None or worker_type == "learner"
    run_ = init_run(run_dir=conf.get("run_dir"),
                    resume_id=os.environ.get("PYDREAMER_RESUME_ID"),
                    wait_for_resume=not is_main_worker)
    run_.log_params(conf.to_dict())
    artifact_dir = run_.dir

    ctx = mp.get_context("spawn")  # JAX is not fork-safe
    subprocesses: List[mp.Process] = []

    # SIGTERM must reap the worker pool: the default handler exits without
    # unwinding, so the finally-kill below never runs and the spawned
    # learner/generators survive as orphans double-writing the run dir
    # (observed live: an orphaned learner kept training and ping-ponging
    # checkpoints against its replacement). Raising SystemExit routes the
    # signal through the try/finally.
    import signal

    def _terminate(signum, frame):
        raise SystemExit(128 + signum)

    signal.signal(signal.SIGTERM, _terminate)

    # Train+eval generators.
    for i in range(conf.generator_workers):
        if belongs_to_worker("generator", i):
            logger.info("Launching train+eval generator %d", i)
            subprocesses.append(launch_generator(
                ctx, conf.env_id, conf,
                save_uri=str(artifact_dir / "episodes" / str(i)),
                save_uri2=str(artifact_dir / "episodes_eval" / str(i)),
                num_steps=conf.n_env_steps // conf.env_action_repeat // conf.generator_workers,
                limit_step_ratio=conf.limit_step_ratio / conf.generator_workers,
                worker_id=i,
                policy_main="network",
                policy_prefill=conf.generator_prefill_policy,
                num_steps_prefill=conf.generator_prefill_steps // conf.generator_workers,
                split_fraction=0.05,
            ))

    # Train-only generators.
    for i in range(conf.generator_workers_train):
        if belongs_to_worker("generator_train", i):
            logger.info("Launching train generator %d", i)
            subprocesses.append(launch_generator(
                ctx, conf.env_id, conf,
                save_uri=str(artifact_dir / "episodes" / str(i)),
                num_steps=conf.n_env_steps // conf.env_action_repeat // max(conf.generator_workers_train, 1),
                limit_step_ratio=conf.limit_step_ratio / max(conf.generator_workers_train, 1),
                worker_id=i,
                policy_main="network",
                policy_prefill=conf.generator_prefill_policy,
                num_steps_prefill=conf.generator_prefill_steps // max(conf.generator_workers_train, 1),
            ))

    # Eval-only generators.
    for i in range(conf.generator_workers_eval):
        if belongs_to_worker("generator_eval", i):
            logger.info("Launching eval generator %d", i)
            subprocesses.append(launch_generator(
                ctx, conf.get("env_id_eval") or conf.env_id, conf,
                save_uri=str(artifact_dir / "episodes_eval" / str(i)),
                worker_id=conf.generator_workers + i,
                policy_main="network",
                metrics_prefix="agent_eval",
            ))

    # Learner.
    learner_proc = None
    if belongs_to_worker("learner", 0):
        logger.info("Launching learner")
        learner_proc = ctx.Process(target=_learner_entry, daemon=False,
                                   args=(conf, str(artifact_dir)))
        learner_proc.start()
        subprocesses.append(learner_proc)

    try:
        while subprocesses:
            # Learner self-recycle (max_rss_gb): relaunch it; it resumes
            # from its own checkpoint while the generators keep running.
            if (learner_proc is not None and not learner_proc.is_alive()
                    and learner_proc.exitcode == RECYCLE_EXIT_CODE):
                subprocesses.remove(learner_proc)
                logger.info("Learner requested recycle; relaunching.")
                learner_proc = ctx.Process(target=_learner_entry, daemon=False,
                                           args=(conf, str(artifact_dir)))
                learner_proc.start()
                subprocesses.append(learner_proc)
            check_subprocesses(subprocesses)
            # When the learner completes cleanly there is nothing left to
            # train; shut the generator pool down too (the reference hangs
            # here waiting on infinite generators).
            if learner_proc is not None and learner_proc not in subprocesses:
                logger.info("Learner finished; shutting down generators.")
                break
            time.sleep(1)
    finally:
        for p in subprocesses:
            p.kill()


def launch_generator(ctx, env_id, conf, save_uri, save_uri2=None,
                     policy_main="network", policy_prefill="random",
                     worker_id=0, num_steps=int(1e9), num_steps_prefill=0,
                     limit_step_ratio=0.0, split_fraction=0.0,
                     metrics_prefix="agent", log_metrics=True) -> mp.Process:
    p = ctx.Process(
        target=_generator_entry, daemon=True,
        args=(dict(
            env_id=env_id,
            save_uri=save_uri,
            save_uri2=save_uri2,
            env_time_limit=conf.env_time_limit,
            env_action_repeat=conf.env_action_repeat,
            env_no_terminal=conf.env_no_terminal,
            limit_step_ratio=limit_step_ratio,
            policy_main=policy_main,
            policy_prefill=policy_prefill,
            num_steps=num_steps,
            num_steps_prefill=num_steps_prefill,
            worker_id=worker_id,
            model_conf=conf,
            log_metrics=log_metrics,
            split_fraction=split_fraction,
            metrics_prefix=metrics_prefix,
            metrics_gamma=conf.gamma,
            log_every=conf.get("generator_log_every", 10),
            envs_per_worker=conf.get("generator_envs_per_worker", 1),
        ),))
    p.start()
    return p


def launch_learner(conf, run_dir: Optional[str] = None) -> mp.Process:
    ctx = mp.get_context("spawn")
    p = ctx.Process(target=_learner_entry, daemon=False, args=(conf, run_dir))
    p.start()
    return p


def check_subprocesses(subprocesses: List[mp.Process]):
    finished = []
    for p in subprocesses:
        if not p.is_alive():
            if p.exitcode == 0:
                finished.append(p)
                logger.info("Process %d finished", p.pid)
            else:
                raise RuntimeError(
                    f"Process {p.pid} died with exitcode {p.exitcode}")
    for p in finished:
        subprocesses.remove(p)


def belongs_to_worker(work_type: str, work_index: int) -> bool:
    """Which subprocesses start on this node (reference: launch.py:181-190)."""
    worker_type, worker_index = get_worker_info()
    return ((worker_type is None or worker_type == work_type) and
            (worker_index is None or worker_index == work_index))


def get_worker_info() -> Tuple[Optional[str], Optional[int]]:
    """TF_CONFIG cluster role -> (worker_type, worker_index)
    (reference: launch.py:193-210)."""
    worker_type = None
    worker_index = None
    if "TF_CONFIG" in os.environ:
        tf_config = json.loads(os.environ["TF_CONFIG"])
        print_once("TF_CONFIG is set:", tf_config)
        if tf_config["cluster"].get("worker"):
            worker_type = {
                "chief": "learner",
                "worker": "generator",
            }[str(tf_config["task"]["type"])]
            worker_index = int(tf_config["task"]["index"])
            print_once("Distributed run detected, current worker is:",
                       f"{worker_type} ({worker_index})")
    return worker_type, worker_index


if __name__ == "__main__":
    launch()
