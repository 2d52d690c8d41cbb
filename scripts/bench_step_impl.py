#!/usr/bin/env python
"""End-to-end A/B of conv lowerings on the flagship train step.

The per-layer microbenches (bench_conv.py) are noisy at 1-3 ms/call under
host contention; the fused train step amortizes dispatch, so THIS is the
decider for the auto policies in models/{encoders,decoders}.py:

    python scripts/bench_step_impl.py --conv xla --deconv xla
    python scripts/bench_step_impl.py --conv s2d --deconv subpixel,fused,fused,xla

Prints one JSON line per invocation with grad-steps/s (bench.py timing
idiom: pipelined steps closed by a float() fetch).
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--conv", default="auto")
    ap.add_argument("--deconv", default="auto")
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--n", type=int, default=50)
    args = ap.parse_args()

    import jax
    from pydreamer_tpu.tools import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    from __graft_entry__ import _make_batch, _make_conf
    from pydreamer_tpu.models.dreamer import Dreamer
    from pydreamer_tpu.training.train_step import TrainStep

    conf = _make_conf(tiny=False).replace(conv_impl=args.conv,
                                          conv_transpose_impl=args.deconv)
    model = Dreamer(conf)
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    trainstep = TrainStep(model, conf)
    opt_state = trainstep.init_optimizer(params)
    batch = _make_batch(conf)
    state = model.init_state(conf.batch_size * conf.iwae_samples)
    rng = jax.random.PRNGKey(1)
    step_fn = trainstep.jitted(False, False)

    def run_window(n, i0):
        nonlocal params, opt_state, state
        t0 = time.perf_counter()
        for i in range(i0, i0 + n):
            params, opt_state, state, metrics, *_ = step_fn(
                params, opt_state, batch, state, i, rng)
        loss = float(metrics["loss_model"])
        return n / (time.perf_counter() - t0), loss

    run_window(10, 0)  # compile + warm
    rates = []
    loss = None
    for w in range(args.windows):
        sps, loss = run_window(args.n, 10 + w * args.n)
        rates.append(sps)
    assert np.isfinite(loss)
    print(json.dumps({
        "conv": args.conv, "deconv": args.deconv,
        "steps_per_sec_best": round(max(rates), 3),
        "steps_per_sec_all": [round(r, 3) for r in rates],
        "loss": round(loss, 3),
    }))


if __name__ == "__main__":
    main()
