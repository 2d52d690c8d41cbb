"""Continuous-control stability diagnostic (CPU, minutes).

Reproduces the live actor-learner loop in-process on the PointEnv canary
(envs/fake.py) with DMC-like hyperparameters (tanh_normal actor, dynamics
gradients) so the DMC-cartpole collapse (results/README.md) can be
root-caused by A/B-ing one suspect at a time:

    python scripts/diagnose_continuous.py --gamma 0.999 --steps 3000
    python scripts/diagnose_continuous.py --gamma 0.99  --steps 3000
    python scripts/diagnose_continuous.py --entropy 1e-3 ...
    python scripts/diagnose_continuous.py --actor_grad reinforce ...

Prints one CSV row per window: grad step, mean return of freshly collected
episodes, policy entropy/value, per-group grad norms, losses.
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

ENV_ID = "Point-2x32"


def collect_episodes(env, policy, model, n: int, repository, ep_counter):
    """Roll n episodes with the current policy, save as one npz chunk."""
    datas, returns = [], []
    for _ in range(n):
        policy.state = model.init_state(1)
        obs = env.reset()
        done, total = False, 0.0
        while not done:
            action, _ = policy(obs)
            obs, reward, done, info = env.step(action)
            total += reward
        data = info["episode"]
        for k in ("policy_value", "policy_entropy", "action_prob"):
            data[k] = np.full(data["reward"].shape, np.nan)
        datas.append(data)
        returns.append(total)
    chunk = {k: np.concatenate([d[k] for d in datas], 0) for k in datas[0]}
    repository.save_data(chunk, ep_counter, ep_counter + n - 1)
    return float(np.mean(returns))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--gamma", type=float, default=0.999)
    p.add_argument("--entropy", type=float, default=1e-4)
    p.add_argument("--target_interval", type=int, default=100)
    p.add_argument("--actor_grad", type=str, default="dynamics")
    p.add_argument("--actor_dist", type=str, default="tanh_normal")
    p.add_argument("--adam_lr_actor", type=float, default=1e-4)
    p.add_argument("--adam_lr_critic", type=float, default=1e-4)
    p.add_argument("--grad_clip_ac", type=float, default=200.0)
    p.add_argument("--imag_horizon", type=int, default=15)
    p.add_argument("--train_every", type=int, default=8,
                   help="grad steps per collected episode (lower = more data)")
    p.add_argument("--window", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default="")
    args = p.parse_args()

    import tempfile
    tmp = tempfile.mkdtemp(prefix="diag_cont_")
    data_dir = str(Path(tmp) / "episodes")

    conf = make_conf(
        image_key=None, image_encoder=None, image_decoder=None,
        vecobs_size=4, action_dim=2,
        deter_dim=64, stoch_dim=8, stoch_discrete=8, hidden_dim=64,
        reward_decoder_layers=2, terminal_decoder_layers=2,
        batch_length=16, batch_size=16, imag_horizon=args.imag_horizon,
        gamma=args.gamma, lambda_gae=0.95, entropy=args.entropy,
        target_interval=args.target_interval,
        actor_grad=args.actor_grad, actor_dist=args.actor_dist,
        adam_lr_actor=args.adam_lr_actor, adam_lr_critic=args.adam_lr_critic,
        grad_clip_ac=args.grad_clip_ac,
        model="dreamer", keep_state=False, scan_unroll=1,
    )

    # Prefill with random policy.
    gen.main(env_id=ENV_ID, save_uri=data_dir, worker_id=0,
             policy_main="random", num_steps=2000, steps_per_npz=500,
             log_metrics=False)

    model = Dreamer(conf)
    params = jax.jit(model.init)(jax.random.PRNGKey(args.seed))
    trainstep = TrainStep(model, conf, donate=False)
    opt_state = trainstep.init_optimizer(params)

    preprocess = Preprocessor.from_conf(conf)
    dataset = SequentialDataset(
        make_repository(data_dir), conf.batch_length, conf.batch_size,
        skip_first=True, reload_interval=5, buffer_size=200_000,
        reset_interval=0, seed=args.seed)
    data_iter = iter(ParallelLoader(lambda wid: preprocess(iter(dataset)),
                                    num_workers=0))

    env = create_env(ENV_ID, no_terminal=False, env_time_limit=0,
                     env_action_repeat=1, worker_id=100 + args.seed)
    policy = NetworkPolicy(model, preprocess)
    repository = make_repository(data_dir)
    ep_counter = 1000

    state = model.init_state(conf.batch_size * conf.iwae_samples)
    rng = jax.random.PRNGKey(args.seed)
    rows = []
    agg = {}
    ret = float("nan")
    epoch = 0
    for i in range(1, args.steps + 1):
        batch, _wid = next(data_iter)
        params, opt_state, state, metrics, _, _ = trainstep(
            params, opt_state, batch, state, i, rng)
        if i % args.train_every == 0:
            policy.set_params(params)
            ret = collect_episodes(env, policy, model, 1, repository, ep_counter)
            ep_counter += 1
            agg.setdefault("return", []).append(ret)
        for k in ("loss_model", "loss_actor", "loss_critic", "policy_entropy",
                  "policy_value", "policy_value_im", "policy_reward",
                  "grad_norm", "grad_norm_actor", "grad_norm_critic"):
            if k in metrics:
                agg.setdefault(k, []).append(float(metrics[k]))
        if i % args.window == 0:
            row = {k: float(np.mean(v)) for k, v in agg.items()}
            row["step"] = i
            rows.append(row)
            print(f"step {i:5d} return {row.get('return', float('nan')):6.2f} "
                  f"ent {row['policy_entropy']:7.3f} "
                  f"val_im {row['policy_value_im']:8.2f} "
                  f"rew_im {row['policy_reward']:6.3f} "
                  f"|g_a| {row['grad_norm_actor']:8.2f} "
                  f"|g_c| {row['grad_norm_critic']:9.2f} "
                  f"l_wm {row['loss_model']:8.2f}", flush=True)
            agg = {}

    if args.out:
        import json
        Path(args.out).write_text("\n".join(
            __import__("json").dumps(r) for r in rows))
    # Final verdict line for quick grepping.
    last = rows[-1].get("return", float("nan"))
    peak = max(r.get("return", float("nan")) for r in rows)
    print(f"FINAL return={last:.2f} peak={peak:.2f} "
          f"(random ~12.5, optimal ~29 for {ENV_ID})")


if __name__ == "__main__":
    main()
