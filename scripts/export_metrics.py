#!/usr/bin/env python
"""Export a run's metrics.jsonl to CSV (reference: results/atari/mlflow_export.ipynb)."""
import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pydreamer_tpu.analysis import export_csv

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("run_dir")
    p.add_argument("out_csv")
    p.add_argument("--keys", nargs="*", default=None)
    args = p.parse_args()
    n = export_csv(args.run_dir, args.out_csv, args.keys)
    print(f"Wrote {n} rows to {args.out_csv}")
