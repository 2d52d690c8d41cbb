"""Actor runtime: episode collection workers.

Counterpart of the reference generator (reference: generator.py:27-331):
  * roll a policy in an env; prefill policy switches to the network policy
    at ``num_steps_prefill`` (generator.py:98-101)
  * the network policy polls the learner's checkpoint every
    ``model_reload_interval`` seconds — the checkpoint IS the policy
    distribution channel (generator.py:105-117)
  * ``limit_step_ratio`` rate-limits data collection vs learner progress
    (generator.py:118-121)
  * per-episode agent metrics incl. discounted return, logged against
    model_step so actor curves align with learner curves (generator.py:167-216)
  * episodes are accumulated to >= ``steps_per_npz`` steps, chunked, and
    saved to the train or eval repository with ``split_fraction`` probability
    (generator.py:218-257)

TPU note: single-step inference is jitted once (shapes are static: T=1, B=1)
and runs on whatever device the generator process sees — CPU by default
(JAX_PLATFORMS=cpu is set by the launcher for generator subprocesses so they
never contend for the TPU with the learner).
"""

from __future__ import annotations

import os
import time
from collections import defaultdict
from typing import Dict, Optional, Tuple

import numpy as np

from .data import make_repository
from .data.preprocessing import Preprocessor
from .tools import (LogColorFormatter, configure_logging, discount,
                    logger, print_once)
from .tracking import init_run, load_checkpoint_file

__all__ = ["main", "create_policy", "RandomPolicy", "NetworkPolicy",
           "chunk_episode_data"]


def main(env_id: str = "Grid-8",
         save_uri: Optional[str] = None,
         save_uri2: Optional[str] = None,
         worker_id: int = 0,
         policy_main: str = "random",
         policy_prefill: str = "random",
         num_steps: int = int(1e6),
         num_steps_prefill: int = 0,
         env_no_terminal: bool = False,
         env_time_limit: int = 0,
         env_action_repeat: int = 1,
         limit_step_ratio: float = 0.0,
         steps_per_npz: int = 1000,
         model_reload_interval: float = 120,
         model_conf=None,
         envs_per_worker: int = 1,
         log_metrics: bool = True,
         split_fraction: float = 0.0,
         metrics_prefix: str = "agent",
         metrics_gamma: float = 0.99,
         log_every: int = 10):

    configure_logging(prefix=f"[GEN {worker_id}]", color=LogColorFormatter.GREEN)
    from .tools import enable_persistent_compilation_cache
    # Active only when this process sees a TPU backend (standalone generator
    # runs); under launch.py generators are pinned to CPU, where the helper
    # deliberately no-ops and policy jit compiles locally in a few seconds.
    enable_persistent_compilation_cache()
    run_ = init_run()
    logger.info("Generator %d started: env=%s, n_steps=%s, n_prefill=%s, "
                "split_fraction=%s, save_uri=%s",
                worker_id, env_id, f"{num_steps:,}", f"{num_steps_prefill:,}",
                split_fraction, save_uri)

    if not save_uri:
        save_uri = str(run_.artifact_dir(f"episodes/{worker_id}"))
    if not save_uri2:
        assert split_fraction == 0.0, "Specify two save destinations, if splitting"

    repository = make_repository(save_uri)
    repository2 = make_repository(save_uri2) if save_uri2 else repository
    nfiles, steps_saved, episodes = repository.count_steps()
    logger.info("Found existing %d files, %d episodes, %d steps in %r",
                nfiles, episodes, steps_saved, repository)

    from .envs import create_env
    env = create_env(env_id, env_no_terminal, env_time_limit,
                     env_action_repeat, worker_id)

    envs_per_worker = max(1, int(envs_per_worker))
    if num_steps_prefill:
        logger.info("Prefill policy: %s", policy_prefill)
        policy = create_policy(policy_prefill, env, model_conf,
                               n_envs=envs_per_worker)
        is_prefill_policy = True
    else:
        logger.info("Policy: %s", policy_main)
        policy = create_policy(policy_main, env, model_conf,
                               n_envs=envs_per_worker)
        is_prefill_policy = False

    datas = []
    datas_episodes = 0
    last_model_load = 0.0
    model_step = 0
    metrics_agg = defaultdict(list)
    all_returns = []
    steps = 0

    def finish_episode(data, metrics, epsteps, fps):
        """Per-episode bookkeeping shared by the sequential and vectorized
        loops: policy columns, agent metrics, npz chunk accumulation."""
        nonlocal episodes, steps_saved, datas, datas_episodes, metrics_agg
        episodes += 1
        if "policy_value" in metrics:
            # A mid-episode policy switch (prefill -> network in the
            # vectorized loop) leaves in-flight slots with policy metrics
            # only from the switch tick on. Pad the head with NaN so every
            # npz column has the same length as `reward` — otherwise
            # SequentialDataset's uniform windowing would slice ragged
            # arrays and crash the data workers.
            pv, pe, ap = (list(metrics[k]) for k in
                          ("policy_value", "policy_entropy", "action_prob"))
            # Pad per column (advisor r4): if the metric lists ever
            # diverge in length, a shared pad would silently misalign the
            # npz columns instead of keeping each one epsteps+1 long.
            def pad_for(col):
                return [np.nan] * max(0, epsteps - len(col))
            data["policy_value"] = np.array(pad_for(pv) + pv + [np.nan])
            data["policy_entropy"] = np.array(pad_for(pe) + pe + [np.nan])
            data["action_prob"] = np.array([np.nan] + pad_for(ap) + ap)
        else:
            # Placeholders so all batches share the same key set.
            for k in ("policy_value", "policy_entropy", "action_prob"):
                data[k] = np.full(data["reward"].shape, np.nan)

        print_once("Episode data sample:", {k: v.shape for k, v in data.items()})
        logger.info("Episode recorded:  steps: %d,  reward: %.1f,  terminal: %.0f,"
                    "  total steps: %d,  episodes: %d,  saved steps (train): %d,"
                    "  fps: %.0f",
                    epsteps, data["reward"].sum(), data["terminal"].sum(),
                    steps, episodes, steps_saved, fps)

        if log_metrics:
            mets = {f"{metrics_prefix}/{k}": float(np.mean(v)) for k, v in metrics.items()}
            all_returns.append(float(data["reward"].sum()))
            mets.update({
                f"{metrics_prefix}/episode_length": epsteps,
                f"{metrics_prefix}/fps": fps,
                f"{metrics_prefix}/steps": steps,
                f"{metrics_prefix}/steps_saved": steps_saved,
                f"{metrics_prefix}/env_steps": steps * env_action_repeat,
                f"{metrics_prefix}/episodes": episodes,
                f"{metrics_prefix}/return": all_returns[-1],
                f"{metrics_prefix}/return_cum": float(np.mean(all_returns[-100:])),
            })

            # Discounted return with bootstrapped tail on truncation
            # (generator.py:181-188).
            rewards_v = data["reward"].astype(np.float64).copy()
            if not data["terminal"][-1]:
                rewards_v[-1] += rewards_v.mean() / (1.0 - metrics_gamma)
            mets[f"{metrics_prefix}/return_discounted"] = float(
                discount(rewards_v, gamma=metrics_gamma).mean())

            if data["terminal"][-1] and not np.isnan(data["policy_value"][-2]):
                # Should be ~0: value[last] should equal reward[last].
                mets[f"{metrics_prefix}/policy_value_terminal"] = float(
                    data["policy_value"][-2] - data["reward"][-1])

            if "goals_visage" in data:
                seen = data["goals_visage"] < 1e5
                mets[f"{metrics_prefix}/goals_seen_avg"] = float(seen.sum(-1).mean())
                mets[f"{metrics_prefix}/goals_seen_last"] = float(seen[-1].sum())
                mets[f"{metrics_prefix}/goals_seenage"] = float(
                    (data["goals_visage"] * seen).sum() / max(seen.sum(), 1))

            for k, v in mets.items():
                if not np.isnan(v):
                    metrics_agg[k].append(v)
            if len(metrics_agg.get(f"{metrics_prefix}/return", [])) >= log_every:
                agg_max = {k: float(np.max(v)) for k, v in metrics_agg.items()}
                agg = {k: float(np.mean(v)) for k, v in metrics_agg.items()}
                agg[f"{metrics_prefix}/return_max"] = agg_max[f"{metrics_prefix}/return"]
                run_.log_metrics(agg, step=model_step)
                metrics_agg = defaultdict(list)

        # Accumulate and save npz chunks.
        datas.append(data)
        datas_episodes = len(datas)
        datas_steps = sum(len(d["reset"]) - 1 for d in datas)
        if datas_steps >= steps_per_npz:
            data = {k: np.concatenate([b[k] for b in datas], axis=0) for k in datas[0]}
            datas = []
            print_once("Collected data sample:", {k: v.shape for k, v in data.items()})

            if datas_steps >= 2 * steps_per_npz:
                chunks = chunk_episode_data(data, steps_per_npz)
            else:
                chunks = [data]

            repo = repository if (np.random.rand() > split_fraction) else repository2
            for i, chunk in enumerate(chunks):
                if "image" in chunk and chunk["image"].ndim == 4:
                    # THWC => HWCT transposes like-colored planes together
                    # for much better zlib compression (generator.py:246-249).
                    chunk["image_t"] = chunk["image"].transpose(1, 2, 3, 0)
                    del chunk["image"]
                repo.save_data(chunk, episodes - datas_episodes, episodes - 1, i)
            if repo is repository:
                # Only train-repo steps count for prefill / rate limiting.
                steps_saved += datas_steps

    def maybe_switch_policy(policy, is_prefill_policy):
        if is_prefill_policy and steps_saved >= num_steps_prefill:
            logger.info("Switching to main policy: %s", policy_main)
            return create_policy(policy_main, env, model_conf,
                                 n_envs=envs_per_worker), False
        return policy, is_prefill_policy

    def maybe_reload_and_ratelimit(policy):
        """Checkpoint poll (the policy channel) + limit_step_ratio wait.
        Returns True if the caller should skip this iteration (rate limit)."""
        nonlocal last_model_load, model_step
        if not isinstance(policy, (NetworkPolicy, VectorNetworkPolicy)):
            return False
        if time.time() - last_model_load > model_reload_interval:
            while True:
                loaded = load_checkpoint_file(run_.checkpoint_path)
                if loaded is not None:
                    state_dict, model_step = loaded
                    policy.set_params(state_dict["params"])
                    logger.info("Generator loaded model checkpoint %d", model_step)
                    last_model_load = time.time()
                    break
                logger.debug("Generator model checkpoint not found, waiting...")
                time.sleep(10)
        if limit_step_ratio and steps_saved >= model_step * limit_step_ratio:
            time.sleep(1)
            return True
        return False

    if envs_per_worker <= 1:
        while steps_saved < num_steps:
            policy, is_prefill_policy = maybe_switch_policy(policy, is_prefill_policy)
            if maybe_reload_and_ratelimit(policy):
                continue

            # Unroll one episode.
            epsteps = 0
            timer = time.time()
            obs = env.reset()
            done = False
            metrics = defaultdict(list)
            while not done:
                action, mets = policy(obs)
                obs, reward, done, inf = env.step(action)
                steps += 1
                epsteps += 1
                for k, v in mets.items():
                    metrics[k].append(v)

            finish_episode(inf["episode"], metrics, epsteps,
                           fps=epsteps / (time.time() - timer + 1e-6))
    else:
        # Vectorized stepping: N env instances advance in lockstep through
        # ONE batched policy call per tick (T=1, B=N jitted inference) —
        # amortizes the per-call jit/infer overhead that dominates
        # single-step acting on small hosts (VERDICT r2: agent-throughput).
        # Episodes end (and reset) independently per slot; the RSSM state
        # slot is zeroed by the reset flag the wrapper puts in the obs.
        from .envs import create_env as _create_env
        # Sibling seeds live in a band disjoint from base-env seeds (which
        # are small worker ids) and from other workers' sibling bands, so no
        # two env instances anywhere share a seed stream.
        envs = [env] + [
            _create_env(env_id, env_no_terminal, env_time_limit,
                        env_action_repeat, 1_000_000 + worker_id * 1000 + i)
            for i in range(1, envs_per_worker)]
        obs_list = [e.reset() for e in envs]
        ep_metrics = [defaultdict(list) for _ in envs]
        ep_steps = [0] * envs_per_worker
        ep_timer = [time.time()] * envs_per_worker
        while steps_saved < num_steps:
            policy, is_prefill_policy = maybe_switch_policy(policy, is_prefill_policy)
            if maybe_reload_and_ratelimit(policy):
                continue

            if isinstance(policy, VectorNetworkPolicy):
                actions, vmets = policy(obs_list)   # vmets: {k: (N,)}
                per_mets = [{k: float(v[i]) for k, v in vmets.items()}
                            for i in range(envs_per_worker)]
            else:
                # Non-batched policies (random/scripted/NetworkPolicy) are
                # stepped per slot; their per-env metrics are kept so the
                # vectorized path logs the same agent metrics as the
                # sequential path.
                per = [policy(o) for o in obs_list]
                actions = [a for a, _ in per]
                per_mets = [m for _, m in per]

            for i, e in enumerate(envs):
                obs_i, reward, done, inf = e.step(actions[i])
                steps += 1
                ep_steps[i] += 1
                for k, v in per_mets[i].items():
                    ep_metrics[i][k].append(float(v))
                if done:
                    finish_episode(
                        inf["episode"], ep_metrics[i], ep_steps[i],
                        fps=ep_steps[i] / (time.time() - ep_timer[i] + 1e-6))
                    obs_i = e.reset()
                    ep_metrics[i] = defaultdict(list)
                    ep_steps[i] = 0
                    ep_timer[i] = time.time()
                obs_list[i] = obs_i

    logger.info("Generator done.")


def chunk_episode_data(data: Dict[str, np.ndarray], min_steps: int):
    """Split concatenated episodes into chunks of [min_steps, 2*min_steps)."""
    n = len(data["reset"])
    chunks = []
    i = 0
    while i < n:
        j = min(i + min_steps, n)
        if n - j < min_steps:
            j = n
        chunks.append({k: v[i:j] for k, v in data.items()})
        i = j
    return chunks


def create_policy(policy_type: str, env, model_conf, n_envs: int = 1):
    """(reference: generator.py:262-300; n_envs>1 selects the batched
    network policy for the vectorized generator loop.)"""
    if policy_type == "network":
        conf = model_conf
        from .models.dreamer import Dreamer
        assert conf.model == "dreamer", conf.model
        model = Dreamer(conf)
        preprocess = Preprocessor.from_conf(conf)
        if n_envs > 1:
            return VectorNetworkPolicy(model, preprocess, n_envs)
        return NetworkPolicy(model, preprocess)

    if policy_type == "random":
        return RandomPolicy(env.action_space)

    if policy_type == "minigrid_wander":
        from .envs.minigrid import MinigridWanderPolicy
        return MinigridWanderPolicy()

    if policy_type == "maze_bouncing_ball":
        from .envs.miniworld import MazeBouncingBallPolicy
        return MazeBouncingBallPolicy()

    if policy_type in ("maze_dijkstra", "goal_dijkstra"):
        from .envs.miniworld import MazeDijkstraPolicy
        step_size = env.params.params["forward_step"].default / env.room_size
        turn_size = env.params.params["turn_step"].default
        if policy_type == "maze_dijkstra":
            return MazeDijkstraPolicy(step_size, turn_size)
        return MazeDijkstraPolicy(step_size, turn_size,
                                  goal_strategy="goal_direction", random_prob=0)

    raise ValueError(policy_type)


class RandomPolicy:
    def __init__(self, action_space):
        self.action_space = action_space

    def __call__(self, obs) -> Tuple[np.ndarray, dict]:
        return self.action_space.sample(), {}


def _cli():
    """Standalone generator CLI (reference: generator.py:334-345)."""
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--env_id", type=str, required=True)
    p.add_argument("--policy_main", type=str, default="random")
    p.add_argument("--save_uri", type=str, default=None)
    p.add_argument("--num_steps", type=int, default=1_000_000)
    p.add_argument("--worker_id", type=int, default=0)
    p.add_argument("--env_time_limit", type=int, default=0)
    p.add_argument("--env_action_repeat", type=int, default=1)
    p.add_argument("--steps_per_npz", type=int, default=1000)
    args = p.parse_args()
    main(**vars(args))


class NetworkPolicy:
    """Jitted single-step Dreamer inference with TBTT state carry."""

    def __init__(self, model, preprocess: Preprocessor):
        import jax
        self.model = model
        self.preprocess = preprocess
        self.params = None
        self.state = model.init_state(1)
        self.rng = jax.random.PRNGKey(int.from_bytes(os.urandom(4), "little"))
        self._infer = jax.jit(model.inference)

    def set_params(self, params):
        self.params = params

    def __call__(self, obs) -> Tuple[np.ndarray, dict]:
        import jax
        assert self.params is not None, "NetworkPolicy used before checkpoint load"
        batch = self.preprocess.apply(obs, expandTB=True)
        self.rng, key = jax.random.split(self.rng)
        action, new_state, metrics = self._infer(self.params, batch, self.state, key)
        self.state = new_state
        # inference metrics are per-slot (B,) arrays; B == 1 here.
        mets = {k: float(np.asarray(v).item())
                for k, v in jax.device_get(metrics).items()}
        # (T=1, B=1, A) => (A,). Index, don't squeeze(): a full squeeze would
        # also drop A when A == 1 (1-dim continuous envs like DMC cartpole)
        # and break the env wrappers' action-shape contract.
        action = np.asarray(action)[0, 0]
        return action, mets


class VectorNetworkPolicy:
    """Batched Dreamer inference over N env instances: ONE jitted
    (T=1, B=N) step per tick instead of N single-slot calls.

    TPU-idiomatic answer to the reference's per-env python inference
    (reference: generator.py:303-331 + the `vectorenv` preset): the RSSM
    posterior step and actor MLP batch over the env axis, so per-call
    dispatch overhead is paid once per tick. Per-slot TBTT state lives in
    the (N, ...) state arrays; a slot is zeroed when its obs carries
    reset=True (same mechanism the learner's scan uses).
    """

    def __init__(self, model, preprocess: Preprocessor, n_envs: int):
        import jax
        self.model = model
        self.preprocess = preprocess
        self.n_envs = n_envs
        self.params = None
        self.state = model.init_state(n_envs)
        self.rng = jax.random.PRNGKey(int.from_bytes(os.urandom(4), "little"))
        self._infer = jax.jit(model.inference)

    def set_params(self, params):
        self.params = params

    def __call__(self, obs_list) -> Tuple[np.ndarray, Dict[str, np.ndarray]]:
        import jax
        assert self.params is not None, "VectorNetworkPolicy used before checkpoint load"
        assert len(obs_list) == self.n_envs
        # Stack N obs dicts -> (N, ...), add T axis -> (1, N, ...).
        stacked = {k: np.stack([o[k] for o in obs_list])[np.newaxis]
                   for k in obs_list[0]}
        batch = self.preprocess.apply(stacked)
        self.rng, key = jax.random.split(self.rng)
        action, new_state, metrics = self._infer(self.params, batch, self.state, key)
        self.state = new_state
        mets = {k: np.asarray(v) for k, v in jax.device_get(metrics).items()}
        return np.asarray(action)[0], mets   # (N, A), {k: (N,)}


if __name__ == "__main__":
    _cli()
