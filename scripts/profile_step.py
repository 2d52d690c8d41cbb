#!/usr/bin/env python
"""Profile the flagship train step and print a per-op device-time table.

Captures a jax.profiler trace around a few warm steps, then aggregates the
device events (TensorFlow trace-event format) by HLO op, attributing the
sequential scans (`while.*`) separately — the layout of PERF.md's
"where the step time goes" table, regenerated in one command:

    python scripts/profile_step.py [--steps 5] [--top 25]
"""

import argparse
import collections
import glob
import gzip
import json
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def load_trace_events(trace_dir: str):
    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    events = []
    for p in paths:
        with gzip.open(p, "rt") as f:
            t = json.load(f)
        events.extend(t.get("traceEvents", []))
    return events


def device_pids(events):
    """pids whose process names look like TPU/device lanes (not host threads)."""
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    return {pid for pid, n in names.items()
            if any(k in n.lower() for k in ("tpu", "device", "xla", "/device"))
            and "host" not in n.lower()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--keep", action="store_true", help="keep the trace dir")
    args = ap.parse_args()

    import jax

    from pydreamer_tpu.tools import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    from __graft_entry__ import _make_batch, _make_conf
    from pydreamer_tpu.models.dreamer import Dreamer
    from pydreamer_tpu.training.train_step import TrainStep

    conf = _make_conf(tiny=args.tiny)
    model = Dreamer(conf)
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    ts = TrainStep(model, conf)
    opt_state = ts.init_optimizer(params)
    batch = _make_batch(conf)
    state = model.init_state(conf.batch_size * conf.iwae_samples)
    rng = jax.random.PRNGKey(1)
    fn = ts.jitted(False, False)

    import numpy as np
    for i in range(5):   # compile + warm
        params, opt_state, state, m, *_ = fn(params, opt_state, batch, state,
                                             np.int32(i), np.asarray(rng))
    float(m["loss_model"])

    trace_dir = tempfile.mkdtemp(prefix="profile_step_")
    jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    for i in range(args.steps):
        params, opt_state, state, m, *_ = fn(params, opt_state, batch, state,
                                             np.int32(100 + i), np.asarray(rng))
    float(m["loss_model"])
    wall = (time.perf_counter() - t0) / args.steps
    jax.profiler.stop_trace()

    events = load_trace_events(trace_dir)
    pids = device_pids(events)
    agg = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in pids:
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        base = name.split(".")[0] if name.startswith("while") else \
            name.split("(")[0][:60]
        if name.startswith("while"):
            base = name  # keep scan identity (while.16 etc.)
        agg[base] += dur
        total += dur

    n = args.steps
    print(f"# wall {wall*1e3:.2f} ms/step; device events total "
          f"{total/n:.2f} ms/step over {n} steps")
    print(f"{'ms/step':>9}  {'%':>5}  op")
    for name, ms in agg.most_common(args.top):
        print(f"{ms/n:9.3f}  {100*ms/max(total,1e-9):5.1f}  {name}")
    if args.keep:
        print(f"# trace: {trace_dir}")


if __name__ == "__main__":
    main()
