#!/usr/bin/env python
"""Plot learning curves for runs, optionally vs a baseline CSV
(reference: results/atari/figures.ipynb)."""
import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pydreamer_tpu.analysis import plot_curves

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("run_dirs", nargs="+")
    p.add_argument("--metric", default="agent/return")
    p.add_argument("--out", default="curves.png")
    p.add_argument("--baseline_csv", default=None)
    p.add_argument("--smooth", type=int, default=1)
    args = p.parse_args()
    plot_curves(args.run_dirs, args.metric, args.out, args.baseline_csv, args.smooth)
    print(f"Wrote {args.out}")
