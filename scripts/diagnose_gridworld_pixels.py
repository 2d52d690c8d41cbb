"""Tune the pixel policy-improvement CI gate (tests/test_learning.py).

Runs the offline GridWorld-pixels training loop with periodic live-rollout
evaluation so the gate's step budget and hyperparameters can be chosen from
evidence instead of guesses.

    python scripts/diagnose_gridworld_pixels.py --steps 1000 --eval_every 200
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from tests.util import make_conf  # noqa: E402

from pydreamer_tpu import generator as gen  # noqa: E402
from pydreamer_tpu.data import (ParallelLoader, Preprocessor,  # noqa: E402
                                SequentialDataset, make_repository)
from pydreamer_tpu.envs import create_env  # noqa: E402
from pydreamer_tpu.generator import NetworkPolicy  # noqa: E402
from pydreamer_tpu.models.dreamer import Dreamer  # noqa: E402
from pydreamer_tpu.training.train_step import TrainStep  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--eval_every", type=int, default=200)
    p.add_argument("--grid", type=int, default=3)
    p.add_argument("--time_limit", type=int, default=12)
    p.add_argument("--entropy", type=float, default=1e-3)
    p.add_argument("--gamma", type=float, default=0.9)
    p.add_argument("--imag_horizon", type=int, default=8)
    p.add_argument("--data_steps", type=int, default=1200)
    p.add_argument("--online_every", type=int, default=0,
                   help=">0: collect 1 episode with the current policy every N grad steps")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    env_id = f"Grid-{args.grid}x64"
    conf = make_conf(
        env_id=env_id, action_dim=4, env_time_limit=args.time_limit,
        deter_dim=64, stoch_dim=8, stoch_discrete=8, hidden_dim=64,
        cnn_depth=8, batch_length=10, batch_size=8,
        imag_horizon=args.imag_horizon,
        gamma=args.gamma, lambda_gae=0.95, entropy=args.entropy,
        target_interval=50, reward_decoder_layers=1,
        terminal_decoder_layers=1,
        model="dreamer", keep_state=True, scan_unroll=1)

    import tempfile
    data_dir = str(Path(tempfile.mkdtemp(prefix="diag_px_")) / "episodes")
    gen.main(env_id=env_id, save_uri=data_dir, worker_id=0,
             policy_main="random", num_steps=args.data_steps,
             env_time_limit=args.time_limit, steps_per_npz=300,
             log_metrics=False)

    model = Dreamer(conf)
    params = jax.jit(model.init)(jax.random.PRNGKey(args.seed))
    trainstep = TrainStep(model, conf, donate=False)
    opt_state = trainstep.init_optimizer(params)
    preprocess = Preprocessor.from_conf(conf)
    dataset = SequentialDataset(
        make_repository(data_dir), conf.batch_length, conf.batch_size,
        skip_first=True, reload_interval=5 if args.online_every else 0,
        buffer_size=500_000, reset_interval=0, seed=args.seed)
    data_iter = iter(ParallelLoader(lambda wid: preprocess(iter(dataset)),
                                    num_workers=0))

    repo = make_repository(data_dir)
    online_env = create_env(env_id, False, args.time_limit, 1, 50 + args.seed)
    online_policy = NetworkPolicy(model, Preprocessor.from_conf(conf))
    ep_counter = [10_000]

    def collect_online(params):
        online_policy.set_params(params)
        online_policy.state = model.init_state(1)
        obs = online_env.reset()
        done = False
        while not done:
            action, _ = online_policy(obs)
            obs, _r, done, info = online_env.step(action)
        data = info["episode"]
        for k in ("policy_value", "policy_entropy", "action_prob"):
            data[k] = np.full(data["reward"].shape, np.nan)
        repo.save_data(data, ep_counter[0], ep_counter[0])
        ep_counter[0] += 1
        return float(data["reward"].sum())

    def live_returns(params, episodes, seed):
        env = create_env(env_id, False, args.time_limit, 1, seed)
        policy = NetworkPolicy(model, Preprocessor.from_conf(conf))
        policy.set_params(params)
        out = []
        for _ in range(episodes):
            policy.state = model.init_state(1)
            obs = env.reset()
            done, total = False, 0.0
            while not done:
                action, _ = policy(obs)
                obs, reward, done, _ = env.step(action)
                total += reward
            out.append(total)
        return float(np.mean(out))

    print(f"step     0 return {live_returns(params, 30, 7):6.2f}", flush=True)
    state = model.init_state(conf.batch_size * conf.iwae_samples)
    rng = jax.random.PRNGKey(args.seed)
    i = 0
    while i < args.steps:
        for _ in range(args.eval_every):
            i += 1
            batch, _wid = next(data_iter)
            params, opt_state, state, metrics, _, _ = trainstep(
                params, opt_state, batch, state, i, rng)
            if args.online_every and i % args.online_every == 0:
                collect_online(params)
        m = {k: float(v) for k, v in jax.device_get(metrics).items()}
        ret = live_returns(params, 30, 100 + i)
        print(f"step {i:5d} return {ret:6.2f} ent {m['policy_entropy']:6.3f} "
              f"val {m['policy_value_im']:6.2f} l_wm {m['loss_model']:7.2f} "
              f"rew_im {m['policy_reward']:6.3f}", flush=True)


if __name__ == "__main__":
    main()
