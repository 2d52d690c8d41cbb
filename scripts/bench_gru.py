"""On-chip benchmark: GRU cell variants inside the full train step.

Measures the flagship-config (T=48, B=32, deter=1024) fused train step for
each RSSM cell type, answering VERDICT's "make the Pallas kernel earn its
place": is `gru_pallas_dv2` (fused Pallas late-reset cell) faster than the
XLA lowering of the same math (`gru_layernorm_dv2`), and than the parity
default (`gru`, single fused-GEMM cell)?

Usage: python scripts/bench_gru.py [--quick]
Prints one JSON line per variant. Results recorded in PERF.md.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

VARIANTS = ("gru", "gru_layernorm_dv2", "gru_pallas_dv2")


def bench_variant(gru_type: str, quick: bool) -> dict:
    import jax

    from __graft_entry__ import _make_batch, _make_conf
    from pydreamer_tpu.models.dreamer import Dreamer
    from pydreamer_tpu.training.train_step import TrainStep

    conf = _make_conf(tiny=False).replace(gru_type=gru_type)
    model = Dreamer(conf)
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    trainstep = TrainStep(model, conf)
    opt_state = trainstep.init_optimizer(params)
    batch = _make_batch(conf)
    state = model.init_state(conf.batch_size * conf.iwae_samples)
    rng = np.asarray(jax.random.PRNGKey(1))
    step_fn = trainstep.jitted(False, False)

    def window(n, i0):
        nonlocal params, opt_state, state
        t0 = time.perf_counter()
        m = None
        for i in range(i0, i0 + n):
            params, opt_state, state, m, *_ = step_fn(
                params, opt_state, batch, state, np.int32(i), rng)
        loss = float(m["loss_model"])  # full sync
        return n / (time.perf_counter() - t0), loss

    n = 20 if quick else 50
    window(10, 0)  # compile + warmup
    sps1, loss = window(n, 10)
    sps2, loss = window(n, 10 + n)
    return {"gru_type": gru_type, "steps_per_sec": round(max(sps1, sps2), 3),
            "ms_per_step": round(1000.0 / max(sps1, sps2), 2),
            "loss_model": round(loss, 3)}


def main():
    quick = "--quick" in sys.argv
    for v in VARIANTS:
        try:
            print(json.dumps(bench_variant(v, quick)), flush=True)
        except Exception as e:
            print(json.dumps({"gru_type": v, "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
