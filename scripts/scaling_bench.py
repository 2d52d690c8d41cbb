#!/usr/bin/env python
"""Data-parallel scaling benchmark harness.

Runs the fused train step over ('data', 'model') meshes of increasing size
with the per-replica batch held constant (weak scaling) and reports steps/s
and parallel efficiency. On a real pod slice this measures ICI gradient
psum overhead; with --cpu it validates the harness on virtual host devices.

Usage:
  python scripts/scaling_bench.py                 # real TPU devices
  python scripts/scaling_bench.py --cpu --devices 8   # virtual CPU mesh
  python scripts/scaling_bench.py --per_replica_batch 16 --steps 30

NOTE: with --cpu the N virtual devices share the host's physical cores, so
the efficiency numbers measure only that the sharded step runs — real
scaling must be measured on real chips.
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def gspmd_overhead(args):
    """On the real chip: the SAME flagship step, plain jit vs jitted through
    a 1-device ('data',) mesh — the GSPMD path must cost ~nothing.
    Fills SCALING.json's real_chip_gspmd_overhead section."""
    import jax

    from pydreamer_tpu.tools import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    from __graft_entry__ import _make_conf, _make_batch
    from pydreamer_tpu.models.dreamer import Dreamer
    from pydreamer_tpu.parallel import DistributedContext
    from pydreamer_tpu.training.train_step import TrainStep

    out = {}
    for mode in ("plain", "gspmd_1dev"):
        conf = _make_conf(tiny=args.tiny or False)
        if mode == "gspmd_1dev":
            conf = conf.replace(mesh_data=1, mesh_model=1)
        model = Dreamer(conf)
        params = jax.jit(model.init)(jax.random.PRNGKey(0))
        ts = TrainStep(model, conf)
        opt = ts.init_optimizer(params)
        batch = _make_batch(conf)
        state = model.init_state(conf.batch_size * conf.iwae_samples)
        if mode == "gspmd_1dev":
            ctx = DistributedContext(conf, devices=jax.devices()[:1])
            params = ctx.place_params(params)
            opt = ctx.place_opt_state(opt, params)
            batch = ctx.place_batch(batch)
            state = ctx.place_state(state)
        rng = jax.random.PRNGKey(1)
        fn = ts.jitted(False, False)
        for i in range(5):
            params, opt, state, m, *_ = fn(params, opt, batch, state, i, rng)
        float(m["loss_model"])
        t0 = time.perf_counter()
        for i in range(args.steps):
            params, opt, state, m, *_ = fn(params, opt, batch, state, 10 + i, rng)
        float(m["loss_model"])
        sps = args.steps / (time.perf_counter() - t0)
        out[mode] = round(sps, 3)
        print(json.dumps({"mode": mode, "steps_per_sec": out[mode]}), flush=True)
    out["gspmd_overhead_pct"] = round(
        100 * (1 - out["gspmd_1dev"] / out["plain"]), 2)
    print(json.dumps(out))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true", help="virtual CPU devices")
    p.add_argument("--devices", type=int, default=8, help="for --cpu")
    p.add_argument("--per_replica_batch", type=int, default=4)
    p.add_argument("--batch_length", type=int, default=8)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--tiny", action="store_true", default=None,
                   help="tiny model (default on cpu)")
    p.add_argument("--gspmd-overhead", action="store_true",
                   help="real-chip plain-vs-1-device-mesh comparison")
    args = p.parse_args()

    if getattr(args, "gspmd_overhead"):
        return gspmd_overhead(args)

    import os
    if args.cpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   f" --xla_force_host_platform_device_count={args.devices}")
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    tiny = args.tiny if args.tiny is not None else args.cpu

    from __graft_entry__ import _make_conf, _make_batch
    from pydreamer_tpu.models.dreamer import Dreamer
    from pydreamer_tpu.parallel import DistributedContext
    from pydreamer_tpu.training.train_step import TrainStep

    n_total = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_total]
    results = []
    base_sps = None
    for n in sizes:
        conf = _make_conf(tiny=tiny).replace(
            mesh_data=n, mesh_model=1,
            batch_size=args.per_replica_batch * n,
            batch_length=args.batch_length)
        model = Dreamer(conf)
        params = jax.jit(model.init)(jax.random.PRNGKey(0))
        ts = TrainStep(model, conf)
        opt = ts.init_optimizer(params)
        ctx = DistributedContext(conf, devices=jax.devices()[:n])
        params = ctx.place_params(params)
        opt = ctx.place_opt_state(opt, params)
        batch = ctx.place_batch(_make_batch(conf))
        state = ctx.place_state(model.init_state(conf.batch_size))
        rng = jax.random.PRNGKey(1)
        fn = ts.jitted(False, False)
        for i in range(3):  # compile + warmup
            params, opt, _, m, *_ = fn(params, opt, batch, state, i, rng)
        float(m["loss_model"])
        t0 = time.perf_counter()
        for i in range(args.steps):
            params, opt, _, m, *_ = fn(params, opt, batch, state, i, rng)
        float(m["loss_model"])
        sps = args.steps / (time.perf_counter() - t0)
        if base_sps is None:
            base_sps = sps
        eff = sps / base_sps  # weak scaling: ideal = 1.0 at every size
        results.append({"n_devices": n, "global_batch": conf.batch_size,
                        "steps_per_sec": round(sps, 3),
                        "env_frames_per_sec": round(sps * conf.batch_size * conf.batch_length, 1),
                        "weak_scaling_efficiency": round(eff, 3)})
        print(json.dumps(results[-1]), flush=True)

    print(json.dumps({"metric": "weak_scaling_efficiency",
                      "value": results[-1]["weak_scaling_efficiency"],
                      "unit": "ratio", "sizes": sizes}))


if __name__ == "__main__":
    main()
