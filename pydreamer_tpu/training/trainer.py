"""Learner runtime: the infinite gradient-step loop.

Counterpart of the reference learner (reference: train.py:24-303):
prefill-wait, per-worker TBTT state carry, fused train step, metric
aggregation with mean+max windows, periodic npz batch dumps, periodic
checkpoint save (the policy-distribution channel), periodic eval, stop at
n_steps / n_env_steps.

TPU-specific design:
  * the gradient step is ONE jitted call (training/train_step.py); the host
    loop only feeds batches and drains metrics
  * metrics come back as device scalars; they are fetched asynchronously
    (jax.device_get on the previous step's metrics while the current step
    runs) so the host never blocks the device
  * input pipeline: thread workers + device prefetch (data/prefetch.py)
    replace DataLoader workers + pin_memory
"""

from __future__ import annotations

import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..conf import Conf
from ..data import (ParallelLoader, Preprocessor, SequentialDataset,
                    make_repository, prefetch_iterator)
from ..models.baselines import WorldModelProbe
from ..models.dreamer import Dreamer
from ..tools import Timer, configure_logging, logger, print_once, timers_summary
from ..tracking import Run, init_run
from .train_step import TrainStep

__all__ = ["run", "evaluate", "prepare_batch_npz", "make_model", "to_list"]


def to_list(s):
    return s if isinstance(s, list) else [s]


def make_model(conf):
    """Model factory (reference: train.py:104-107)."""
    if conf.model == "dreamer":
        return Dreamer(conf)
    return WorldModelProbe(conf)


def run(conf: Conf, run_dir: Optional[str] = None, max_steps: Optional[int] = None):
    """Train until n_steps / n_env_steps (reference: train.py:24)."""
    configure_logging(prefix="[TRAIN]")
    if conf.get("platform"):
        # debug preset runs the learner on host CPU (reference `device: cpu`)
        jax.config.update("jax_platforms", str(conf.platform))
    from ..parallel.multihost import (is_main_process, local_batch_size,
                                      maybe_initialize_distributed)
    # NB: distributed init MUST precede the cache helper — its backend
    # probe (jax.default_backend) initializes XLA, and jax.distributed
    # refuses to initialize afterwards.
    maybe_initialize_distributed()
    from ..tools import enable_persistent_compilation_cache
    cache_dir = enable_persistent_compilation_cache(conf.get("jax_cache_dir"))
    if cache_dir:
        logger.info("JAX compilation cache: %s", cache_dir)
    multihost = jax.process_count() > 1
    main_process = is_main_process()
    if multihost:
        # Multi-host SPMD: every host runs this same function; run_dir must
        # be shared storage (the reference's artifact-store contract).
        logger.info("Multi-host learner: process %d/%d",
                    jax.process_index(), jax.process_count())
    run_ = init_run(run_dir=run_dir)
    artifact_dir = run_.dir

    def global_sum(x) -> int:
        """Sum a host-local count over all learner processes (collective —
        every process must reach this call at the same point)."""
        if not multihost:
            return int(x)
        from jax.experimental import multihost_utils
        return int(np.sum(multihost_utils.process_allgather(np.asarray(x))))

    # Data directories (reference: train.py:34-60).
    if conf.offline_data_dir:
        online_data = False
        input_dirs = to_list(conf.offline_data_dir)
    else:
        online_data = True
        input_dirs = [
            str(artifact_dir / "episodes" / str(i))
            for i in range(max(conf.generator_workers_train, conf.generator_workers))
        ]
    if conf.offline_prefill_dir:
        input_dirs.extend(to_list(conf.offline_prefill_dir))
    if conf.offline_eval_dir:
        eval_dirs = to_list(conf.offline_eval_dir)
    else:
        eval_dirs = [
            str(artifact_dir / "episodes_eval" / str(i))
            for i in range(max(conf.generator_workers_eval, conf.generator_workers))
        ]
    test_dirs = to_list(conf.offline_test_dir) if conf.offline_test_dir else eval_dirs

    # Wait for prefill (reference: train.py:62-82). Each host waits for its
    # OWN replay shard (its local generators feed it); the stop decision
    # below is on the globally summed count so all hosts agree.
    if online_data:
        prefill_target = conf.generator_prefill_steps // (
            jax.process_count() if multihost else 1)
        last_logged_steps = -1
        while True:
            repo = make_repository(input_dirs)
            _, steps_now, _ = repo.count_steps()
            # Log the prefill counter only when it changes — a long prefill
            # polls every 10 s and must not write hundreds of duplicate
            # step-0 rows into the metrics stream.
            if main_process and steps_now != last_logged_steps:
                run_.log_metrics(
                    {"train/data_steps": steps_now,
                     "train/data_env_steps": steps_now * conf.env_action_repeat},
                    step=0)
                last_logged_steps = steps_now
            if steps_now < prefill_target:
                logger.debug("Waiting for prefill: %d/%d steps...",
                             steps_now, prefill_target)
                time.sleep(10)
            else:
                logger.info("Done prefilling: %d/%d steps.",
                            steps_now, prefill_target)
                break
        if global_sum(steps_now) * conf.env_action_repeat >= conf.n_env_steps:
            logger.info("Finished %d env steps.", conf.n_env_steps)
            return

    preprocess = Preprocessor.from_conf(conf)

    # SPMD: with >1 visible device, shard batches over the 'data' mesh axis
    # and replicate (+tensor-shard) params; GSPMD partitions the train step.
    # Multi-host ALWAYS goes through the mesh (the global batch cannot be
    # built otherwise).
    ctx = None
    if multihost or (jax.device_count() > 1 and conf.get("mesh_data", 0) != 1):
        from ..parallel import DistributedContext
        ctx = DistributedContext(conf)
        assert conf.batch_size % ctx.n_data == 0, \
            f"batch_size {conf.batch_size} not divisible by data mesh {ctx.n_data}"

    # Model + optimizer. One jitted init = one XLA compile instead of
    # hundreds of eager ops (matters on TPU images where compiles go through
    # a remote service). Under a mesh, init is a global SPMD computation so
    # params are born with their shardings (works with 1 or N processes).
    model = make_model(conf)
    trainstep = TrainStep(model, conf)
    # numpy key: host values are implicitly replicated across processes; a
    # committed local-device key would be an invalid multi-host jit input.
    init_key = np.asarray(jax.random.PRNGKey(conf.get("seed", 0)))
    if ctx is not None:
        params = ctx.init_params(model.init, init_key)
        opt_state = trainstep.init_optimizer(params, ctx)
    else:
        params = jax.jit(model.init)(init_key)
        opt_state = trainstep.init_optimizer(params)
    if main_process:
        run_.log_text(_describe_params(params), "architecture.txt")

    def fetch_all(tree):
        """Device->host for logging/checkpointing. Under multi-host this is
        a collective (all-gather of sharded leaves): EVERY process calls it,
        then only process 0 writes."""
        if ctx is not None and multihost:
            return ctx.fetch(tree)
        return tree

    # Resume (reference: train.py:114-116).
    steps = 0
    ckpt = run_.load_checkpoint(target={"params": params, "opt_state": opt_state})
    if ckpt is not None:
        state_dict, steps = ckpt
        if ctx is not None:
            # Restored leaves are host numpy; put them back on the mesh with
            # the shardings the fresh init produced.
            params = ctx.place_like(state_dict["params"], params)
            opt_state = ctx.place_like(state_dict["opt_state"], opt_state)
        else:
            params, opt_state = state_dict["params"], state_dict["opt_state"]
        logger.info("Loaded model from checkpoint epoch %d", steps)

    # Input pipeline: N worker threads, each an independent TBTT stream.
    # Multi-host: each host streams B/n_processes slots from its local replay
    # shard; stream ids must align with the same global step on every host
    # (strict_order) so per-stream TBTT state shards stay consistent.
    local_b = local_batch_size(conf.batch_size) if multihost else conf.batch_size

    def make_stream(worker_id: int):
        data = SequentialDataset(
            make_repository(input_dirs), conf.batch_length, local_b,
            skip_first=True,
            reload_interval=120 if online_data else 0,
            buffer_size=conf.buffer_size if online_data else conf.buffer_size_offline,
            reset_interval=conf.reset_interval,
            allow_mid_reset=conf.allow_mid_reset,
            seed=(conf.get("seed", 0) * 1000 + worker_id
                  + jax.process_index() * 7919))
        return preprocess(iter(data))

    loader = ParallelLoader(make_stream, num_workers=conf.data_workers,
                            strict_order=multihost)
    data_iter = prefetch_iterator(
        iter(loader), size=2, transform=_make_input_transform(ctx, multihost))

    states: Dict[int, object] = {}  # TBTT state per data worker (train.py:168-178)
    rng = np.asarray(jax.random.PRNGKey(conf.get("seed", 0) + 1))
    metrics_agg = defaultdict(list)
    metrics_max = defaultdict(list)
    last_time = time.time()
    last_steps = steps
    prev_metrics = None  # async metric fetch: drain step i-1 while i runs

    n_steps = min(conf.n_steps, max_steps) if max_steps else conf.n_steps
    # Profiler window: trace steps [11, 13] after warmup (reference schedule
    # wait=10/warmup=10/active=1, train.py:468-476; XLA traces are heavier so
    # one short window is enough).
    profile_window = (11, 13) if conf.get("enable_profiler", False) else None

    while True:
        if profile_window and steps + 1 == profile_window[0]:
            jax.profiler.start_trace(str(artifact_dir / "profiling"))
        if profile_window and steps + 1 == profile_window[1]:
            jax.profiler.stop_trace()
            logger.info("Saved profiler trace to %s", artifact_dir / "profiling")
            profile_window = None
        with Timer("total"):
            steps += 1
            will_log_batch = steps % conf.logbatch_interval == 1
            will_image_pred = (
                will_log_batch or
                steps % conf.log_interval >= int(conf.log_interval * 0.9))

            with Timer("data"):
                batch, wid, data_stats = next(data_iter)
                # Fail fast with a config-level message instead of a flax
                # param-shape error minutes later inside the jit trace
                # (live failure: `--configs dmc` pins action_dim=12 for
                # quadruped; cartpole data has 1-dim actions).
                if "action" in batch and batch["action"].shape[-1] != conf.action_dim:
                    raise ValueError(
                        f"conf.action_dim={conf.action_dim} but the replay "
                        f"data has action dim {batch['action'].shape[-1]} — "
                        f"pass --action_dim matching the env "
                        f"(env_id={conf.get('env_id')})")

            with Timer("step"):
                state = states.get(wid)
                if state is None:
                    if ctx is not None:
                        state = ctx.init_tbtt_state(
                            lambda: model.init_state(conf.batch_size * conf.iwae_samples))
                    else:
                        state = model.init_state(conf.batch_size * conf.iwae_samples)
                # rng is passed as-is every step; the jitted step fold_ins the
                # step index on-device (no host-side split in the hot loop).
                params, opt_state, new_state, metrics, tensors, dream_tensors = \
                    trainstep(params, opt_state, batch, state, steps, rng,
                              do_image_pred=will_image_pred,
                              do_dream_tensors=will_log_batch)
                if conf.keep_state:
                    states[wid] = new_state

            with Timer("other"):
                # Drain last step's metrics (device->host) — one step behind,
                # so the fetch overlaps this step's device work.
                if prev_metrics is not None:
                    _aggregate_metrics(prev_metrics, metrics_agg, metrics_max)
                # Data stats were computed host-side in the input transform
                # (this host's local shard under multi-host).
                for k, v in data_stats.items():
                    if k.endswith("_max"):
                        metrics_max[k[:-4]].append(v)
                    else:
                        metrics_agg[k].append(v)
                prev_metrics = metrics

                if will_log_batch or dream_tensors:
                    # Under multi-host, fetch is a collective -> every
                    # process joins; only process 0 writes.
                    fetched = fetch_all({"batch": batch, "tensors": tensors,
                                         "dream": dream_tensors})
                    if main_process and will_log_batch:
                        log_batch_npz(run_, fetched["batch"], fetched["tensors"],
                                      f"{steps:07}.npz", subdir="d2_wm_closed")
                    if main_process and dream_tensors:
                        log_batch_npz(run_, fetched["batch"], fetched["dream"],
                                      f"{steps:07}.npz", subdir="d2_wm_dream")

                # Buffer size recount + env-step stop (train.py:225-231).
                # Counts are summed over hosts so the stop decision is
                # unanimous (a lone host returning would deadlock the rest).
                if online_data and steps % conf.logbatch_interval == 0:
                    _, steps_local, _ = make_repository(input_dirs).count_steps()
                    steps_now = global_sum(steps_local)
                    metrics_agg["data_steps"].append(steps_now)
                    metrics_agg["data_env_steps"].append(steps_now * conf.env_action_repeat)
                    if steps_now * conf.env_action_repeat >= conf.n_env_steps:
                        logger.info("Finished %d env steps.", conf.n_env_steps)
                        loader.close()
                        return

                if steps % conf.log_interval == 0:
                    out = {f"train/{k}": float(np.mean(v)) for k, v in metrics_agg.items()}
                    out.update({f"train/{k}_max": float(np.max(v))
                                for k, v in metrics_max.items()})
                    out["train/steps"] = steps
                    t = time.time()
                    out["train/fps"] = (steps - last_steps) / max(t - last_time, 1e-6)
                    last_time, last_steps = t, steps
                    out.update({f"train/{k}": v for k, v in timers_summary().items()})
                    logger.info(
                        "[%06d]  loss_model: %.3f  loss_critic: %.3f  "
                        "policy_value: %.3f  policy_entropy: %.3f  fps: %.3f",
                        steps, out.get("train/loss_model", 0),
                        out.get("train/loss_critic", 0),
                        out.get("train/policy_value", 0),
                        out.get("train/policy_entropy", 0), out["train/fps"])
                    if main_process and steps > conf.log_interval:
                        # first window skews the axes (reference: train.py:255)
                        run_.log_metrics(out, step=steps)
                    metrics_agg = defaultdict(list)
                    metrics_max = defaultdict(list)

                if steps % conf.save_interval == 0:
                    ckpt_data = fetch_all({"params": params, "opt_state": opt_state})
                    if main_process:
                        run_.save_checkpoint(ckpt_data, steps)
                        logger.info("Saved model checkpoint %d", steps)

                if steps >= n_steps:
                    logger.info("Finished %d grad steps.", n_steps)
                    ckpt_data = fetch_all({"params": params, "opt_state": opt_state})
                    if main_process:
                        run_.save_checkpoint(ckpt_data, steps)
                    loader.close()
                    return

                # Leak-aware self-recycle: when host RSS crosses max_rss_gb,
                # checkpoint and exit cleanly so the launcher restarts a
                # fresh learner that resumes (launch.py). Guards against
                # host-memory creep on long runs — e.g. remote-TPU client
                # libraries that retain a copy of every host->device
                # transfer (measured on this image: ~1 batch leaked/step;
                # see PERF.md "host memory" note).
                if (conf.get("max_rss_gb", 0)
                        and steps % conf.log_interval == 0):
                    import resource
                    rss_gb = resource.getrusage(
                        resource.RUSAGE_SELF).ru_maxrss / 1048576
                    if rss_gb > conf.max_rss_gb:
                        logger.warning(
                            "RSS %.1f GB > max_rss_gb %.1f: checkpointing "
                            "and requesting learner recycle.",
                            rss_gb, conf.max_rss_gb)
                        ckpt_data = fetch_all({"params": params,
                                               "opt_state": opt_state})
                        if main_process:
                            run_.save_checkpoint(ckpt_data, steps)
                        loader.close()
                        return "recycle"

            with Timer("eval"):
                if conf.eval_interval and steps % conf.eval_interval == 0:
                    # Multi-host: eval runs on process 0 only, on a host
                    # copy of the (replicated) params; the fetch itself is a
                    # collective so all processes join it first.
                    eval_params = fetch_all(params) if multihost else params
                    try:
                        if main_process:
                            _run_eval(conf, model, eval_params, preprocess,
                                      test_dirs, eval_dirs, run_, steps)
                    except Exception as e:
                        # Benign when no eval data has been generated yet.
                        logger.warning("Evaluation failed: %r", e)


def _run_eval(conf, model, params, preprocess, test_dirs, eval_dirs, run_, steps):
    """The two eval modes (reference: train.py:274-285): 'test' = train-like
    with state resets; 'eval' = state kept, multisampling-capable."""
    data_test = SequentialDataset(
        make_repository(test_dirs), conf.batch_length,
        conf.test_batch_size, skip_first=False,
        reset_interval=conf.reset_interval)
    evaluate("test", steps, model, params,
             preprocess(iter(data_test)), run_,
             conf.test_batches, conf.iwae_samples,
             conf.keep_state, conf.test_save_size, conf)
    data_eval = SequentialDataset(
        make_repository(eval_dirs), conf.batch_length,
        conf.eval_batch_size, skip_first=False)
    evaluate("eval", steps, model, params,
             preprocess(iter(data_eval)), run_,
             conf.eval_batches, conf.eval_samples,
             True, conf.eval_save_size, conf)


def _get_eval_step(model, eval_samples: int):
    """Memoized jitted eval step — a fresh lambda per evaluate() call would
    bust jax's compilation cache and recompile on every eval. The cache lives
    on the model instance (not a global keyed by id(model), which could hand
    a stale compiled step to a different model after id reuse)."""
    cache = model.__dict__.setdefault("_eval_step_cache", {})
    if eval_samples not in cache:
        cache[eval_samples] = jax.jit(
            lambda p, o, s, k, ol, ip: model.training_step(
                p, o, s, k, iwae_samples=eval_samples,
                do_open_loop=ol, do_image_pred=ip),
            static_argnums=(4, 5))
    return cache[eval_samples]


def evaluate(prefix: str, steps: int, model, params,
             data_iterator: Iterator, run_: Run,
             eval_batches: int, eval_samples: int, keep_state: bool,
             save_size: int, conf):
    """Open/closed-loop eval protocol (reference: train.py:306-408)."""
    start_time = time.time()
    metrics_eval = defaultdict(list)
    state = None
    tensors = None
    npz_datas = []
    n_finished_episodes = np.zeros(1)
    do_output_tensors = True
    rng = jax.random.PRNGKey(steps)

    eval_step = _get_eval_step(model, eval_samples)

    for i_batch in range(eval_batches):
        batch = next(data_iterator)
        obs = {k: jnp.asarray(v) for k, v in batch.items()}
        T, B = obs["action"].shape[:2]
        if i_batch == 0:
            logger.info("Evaluation (%s): batches: %d, size(T,B,I): (%d,%d,%d)",
                        prefix, eval_batches, T, B, eval_samples)
            n_finished_episodes = np.zeros(B)

        reset_episodes = np.asarray(obs["reset"]).any(axis=0)  # (B,)
        n_reset_episodes = int(reset_episodes.sum())
        n_continued = int((~reset_episodes).sum())
        if i_batch > 0:
            n_finished_episodes += reset_episodes

        # Last-batch probe logprob for episodes that just ended.
        if n_reset_episodes > 0 and tensors is not None and "loss_map" in tensors:
            lm = np.asarray(tensors["loss_map"]).mean(axis=0)
            metrics_eval["logprob_map_last"].append(
                float((lm * reset_episodes).sum() / reset_episodes.sum()))

        # Open loop on continued episodes (train.py:351-372).
        if n_continued > 0 and state is not None:
            rng, key = jax.random.split(rng)
            _, _, _, tensors_im, _ = eval_step(params, obs, state, key, True, True)
            if np.random.rand() < 0.10:
                r = float(np.asarray(obs["reward"]).sum())
                log_batch_npz(run_, batch, tensors_im,
                              f"{steps:07}_{i_batch}_r{r:.0f}.npz",
                              subdir=f"d2_wm_open_{prefix}")
            mask = (~reset_episodes).astype(np.float32)
            mask = np.where(mask > 0, mask, np.nan)
            import warnings
            for key_name, logprobs in tensors_im.items():
                if key_name.startswith("logprob_"):
                    lps = np.asarray(logprobs)[:5] * mask
                    with warnings.catch_warnings():
                        # all-NaN slices are expected (reference: train.py:368)
                        warnings.simplefilter("ignore", RuntimeWarning)
                        lp = np.nanmean(lps)
                    if not np.isnan(lp):
                        metrics_eval[f"{key_name}_open"].append(float(lp))

        # Closed loop (train.py:374-389).
        if state is None or not keep_state:
            state = model.init_state(B * eval_samples)
        rng, key = jax.random.split(rng)
        _, state, loss_metrics, tensors, _ = eval_step(params, obs, state, key, False, True)
        for k, v in loss_metrics.items():
            v = float(np.asarray(v))
            if not np.isnan(v):
                metrics_eval[k].append(v)

        if do_output_tensors:
            npz_datas.append(prepare_batch_npz({**batch, **jax.device_get(tensors)},
                                               take_b=save_size))
        if n_finished_episodes[0] > 0:
            do_output_tensors = False

    out = {f"{prefix}/{k}": float(np.mean(v)) for k, v in metrics_eval.items()}
    run_.log_metrics(out, step=steps)

    if npz_datas:
        npz_data = {k: np.concatenate([d[k] for d in npz_datas], 1) for k in npz_datas[0]}
        print_once(f"Saving batch d2_wm_closed_{prefix}:",
                   {k: tuple(v.shape) for k, v in npz_data.items()})
        r = float(npz_data["reward"][0].sum())
        run_.log_npz(npz_data, f"{steps:07}_r{r:.0f}.npz", subdir=f"d2_wm_closed_{prefix}")
    logger.info("Evaluation (%s): done in %.0f sec, recorded %d episodes",
                prefix, time.time() - start_time, int(n_finished_episodes.sum()))


def _make_input_transform(ctx, multihost: bool):
    """Prefetch transform: compute host-side data stats on the (local) numpy
    batch, then shard it for the step. Yields (batch, wid, stats) — the hot
    loop must not touch batch values (under multi-host they are global
    arrays whose remote shards are not addressable)."""
    inner = ctx.batch_transform(multihost) if ctx is not None else None

    def tf(item):
        batch, wid = item
        stats = {
            "data_reward": float(np.mean(batch["reward"])),
            "data_reward_max": float(np.max(batch["reward"])),
            "data_reset": float(np.mean(batch["reset"])),
            "data_terminal": float(np.mean(batch["terminal"])),
        }
        if inner is not None:
            batch, wid = inner((batch, wid))
        return batch, wid, stats

    return tf


def _aggregate_metrics(metrics, metrics_agg, metrics_max):
    host = jax.device_get(metrics)
    for k, v in host.items():
        v = float(np.asarray(v))
        if not np.isnan(v):
            metrics_agg[k].append(v)
        if k.startswith("grad_norm") and np.isfinite(v):
            metrics_max[k].append(v)


def log_batch_npz(run_: Run, batch, tensors, filename: str, subdir: str):
    data = {**batch, **jax.device_get(tensors)}
    print_once(f"Saving batch {subdir} (input):",
               {k: tuple(np.asarray(v).shape) for k, v in data.items()})
    data = prepare_batch_npz(data)
    run_.log_npz(data, filename, subdir=subdir)


def prepare_batch_npz(data: Dict[str, np.ndarray], take_b: int = 999):
    """Un-preprocess tensors for npz inspection (reference: train.py:423-465).

    float images -> uint8, one-hot -> argmax, categorical logits -> softmax;
    output is (B,T,...) batch-major.
    """
    import scipy.special

    def unpreprocess(key: str, val) -> np.ndarray:
        x = np.asarray(val)
        if take_b < x.shape[1]:
            x = x[:, :take_b]
        if x.dtype in (np.float16, np.float64) or str(x.dtype) == "bfloat16":
            x = x.astype(np.float32)

        if x.ndim == 5:  # image (T,B,H,W,C)
            assert (key.startswith("image") or key.startswith("map")), \
                f"Unexpected 3D tensor: {key}: {x.shape}, {x.dtype}"
            if x.dtype == np.uint8:
                pass  # already display-ready
            elif x.shape[-1] in (1, 3):
                x = ((x + 0.5) * 255.0).clip(0, 255).astype("uint8")
            elif np.allclose(x.sum(axis=-1), 1.0) and np.allclose(x.max(axis=-1), 1.0):
                x = x.argmax(axis=-1)
            else:
                x = scipy.special.softmax(x, axis=-1)
        return x.swapaxes(0, 1)  # (T,B,*) => (B,T,*)

    return {k: unpreprocess(k, v) for k, v in data.items()}


def _describe_params(params) -> str:
    lines = ["Model parameters:"]
    total = 0
    for key, sub in params.items():
        n = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(sub))
        total += n
        lines.append(f"  {key:<15}: {n:,} parameters")
    lines.insert(1, f"  {'TOTAL':<15}: {total:,} parameters")
    return "\n".join(lines)


