#!/usr/bin/env python
"""Interleaved A/B of two train-step configurations on the flagship step.

Both programs stay resident and alternate 50-step windows (A B A B ...),
so slow drift in background load cancels out of the comparison — the
sequential sweep (bench_step_impl.py) conflates policy effects with
whatever the concurrent training run was doing during its window.

Spec: ``conv:deconv[:key=val,key=val...]`` — the optional third segment
overrides arbitrary Conf keys (values parsed as python literals when
possible), so non-conv knobs A/B with the same tool:

    python scripts/bench_step_ab.py --a xla:xla --b s2d:subpixel,xla,subpixel,xla
    python scripts/bench_step_ab.py --a auto:auto --b auto:auto:gae_impl=unrolled
    python scripts/bench_step_ab.py --a auto:auto --b auto:auto:donate_state=True
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def build(conv, deconv, overrides=None):
    import ast

    import jax
    from __graft_entry__ import _make_batch, _make_conf
    from pydreamer_tpu.models.dreamer import Dreamer
    from pydreamer_tpu.training.train_step import TrainStep

    conf = _make_conf(tiny=False).replace(conv_impl=conv,
                                          conv_transpose_impl=deconv)
    for kv in (overrides or "").split(","):
        if not kv:
            continue
        k, v = kv.split("=", 1)
        try:
            v = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            pass  # keep as string (e.g. gae_impl=unrolled)
        conf = conf.replace(**{k: v})
    model = Dreamer(conf)
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    trainstep = TrainStep(model, conf)
    opt_state = trainstep.init_optimizer(params)
    batch = _make_batch(conf)
    state = model.init_state(conf.batch_size * conf.iwae_samples)
    rng = jax.random.PRNGKey(1)
    fn = trainstep.jitted(False, False)
    carry = dict(params=params, opt_state=opt_state, state=state)

    def window(n, i0):
        t0 = time.perf_counter()
        for i in range(i0, i0 + n):
            carry["params"], carry["opt_state"], carry["state"], m, *_ = fn(
                carry["params"], carry["opt_state"], batch, carry["state"],
                i, rng)
        assert np.isfinite(float(m["loss_model"]))
        return n / (time.perf_counter() - t0)

    return window


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", default="xla:xla")
    ap.add_argument("--b", default="auto:auto")
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--n", type=int, default=50)
    args = ap.parse_args()

    from pydreamer_tpu.tools import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    wins = {}
    for label, spec in (("a", args.a), ("b", args.b)):
        parts = spec.split(":", 2)
        conv, deconv = parts[0], parts[1]
        wins[label] = build(conv, deconv, parts[2] if len(parts) > 2 else "")
        wins[label](10, 0)  # compile + warm
    rates = {"a": [], "b": []}
    for r in range(args.rounds):
        for label in ("a", "b"):
            rates[label].append(wins[label](args.n, 10 + r * args.n))
    out = {
        "a": args.a, "b": args.b,
        "a_steps_per_sec": [round(x, 3) for x in rates["a"]],
        "b_steps_per_sec": [round(x, 3) for x in rates["b"]],
        "a_median": round(float(np.median(rates["a"])), 3),
        "b_median": round(float(np.median(rates["b"])), 3),
    }
    out["b_vs_a"] = round(out["b_median"] / out["a_median"], 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
