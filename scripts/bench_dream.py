#!/usr/bin/env python
"""Micro-benchmark of the imagination (dream) scan — the r2 profile's #1
target (PERF.md: 3.55 ms/step, 13% of the train step).

Benches the isolated dream rollout at the flagship shape under each RNG
implementation, and the full train step for end-to-end attribution:

  python scripts/bench_dream.py                 # TPU
  python scripts/bench_dream.py --steps 30
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def timeit(fn, steps, sync):
    fn()  # compile
    sync()
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn()
    sync_out = sync(out)
    dt = (time.perf_counter() - t0) / steps
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _make_conf
    from pydreamer_tpu.models.dreamer import Dreamer

    results = {}
    for rng_impl in ("threefry", "rbg"):
        conf = _make_conf(tiny=args.tiny).replace(dream_rng=rng_impl)
        model = Dreamer(conf)
        params = jax.jit(model.init)(jax.random.PRNGKey(0))
        M = conf.batch_size * conf.batch_length * conf.iwae_samples
        H = conf.imag_horizon
        state = model.init_state(M)
        key = jax.random.PRNGKey(1)

        dream = jax.jit(lambda p, s, k: model.dream(p, s, H, False, k))
        feats, actions, rewards, terminals = dream(params, state, key)

        def run():
            return dream(params, state, key)

        def sync(out=None):
            if out is None:
                out = (feats,)
            return float(jnp.sum(out[0][-1]))

        dt = timeit(run, args.steps, sync)
        results[f"dream_ms_{rng_impl}"] = round(dt * 1e3, 3)
        print(json.dumps({"metric": f"dream_rollout_ms[{rng_impl}]",
                          "value": round(dt * 1e3, 3), "unit": "ms",
                          "M": M, "H": H}), flush=True)

    base = results["dream_ms_threefry"]
    results["rbg_speedup"] = round(base / results["dream_ms_rbg"], 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
