"""Benchmark: Dreamer/Atari gradient steps per second on one TPU chip.

Measures the full fused train step (forward + backward + optimizer update)
on the flagship Atari configuration (T=48, B=32, deter=1024 — the reference's
committed defaults+atari config) and reports steps/sec against the
reference's published 1.4 grad-steps/sec on a T4 (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

BASELINE_STEPS_PER_SEC = 1.4  # reference on NVIDIA T4 (BASELINE.md)


def main():
    import jax

    from pydreamer_tpu.tools import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()  # reuse compiles across invocations

    from __graft_entry__ import _make_batch, _make_conf
    from pydreamer_tpu.models.dreamer import Dreamer
    from pydreamer_tpu.training.train_step import TrainStep

    conf = _make_conf(tiny=False)
    model = Dreamer(conf)
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    trainstep = TrainStep(model, conf)
    opt_state = trainstep.init_optimizer(params)
    batch = _make_batch(conf)
    state = model.init_state(conf.batch_size * conf.iwae_samples)
    rng = jax.random.PRNGKey(1)

    step_fn = trainstep.jitted(False, False)

    def run_window(n, i0):
        """n pipelined steps, closed by a host fetch of the final loss
        (float() forces a full device sync — block_until_ready on remote
        backends can return before the dependency chain finishes)."""
        nonlocal params, opt_state, state
        t0 = time.perf_counter()
        for i in range(i0, i0 + n):
            # rng passed as-is: the step fold_ins i on-device (zero host RNG work)
            params, opt_state, state, metrics, *_ = step_fn(
                params, opt_state, batch, state, i, rng)
        loss = float(metrics["loss_model"])
        return n / (time.perf_counter() - t0), loss

    # Warmup: compile + shake out any re-fetch of the executable.
    run_window(10, 0)
    # Two timed windows; report the steady-state (best) one.
    sps1, loss = run_window(50, 10)
    sps2, loss = run_window(50, 60)
    steps_per_sec = max(sps1, sps2)
    assert np.isfinite(loss), f"non-finite loss {loss}"
    print(json.dumps({
        "metric": "grad_steps_per_sec",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
