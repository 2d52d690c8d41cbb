#!/usr/bin/env python
"""Turn a d2_wm_dream / d2_wm_closed npz batch dump into an animated GIF
(reference: results/atari/makegif.ipynb)."""
import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pydreamer_tpu.analysis import make_dream_gif

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("npz_path")
    p.add_argument("out_gif")
    p.add_argument("--batch_index", type=int, default=0)
    p.add_argument("--fps", type=int, default=8)
    args = p.parse_args()
    n = make_dream_gif(args.npz_path, args.out_gif, args.batch_index, args.fps)
    print(f"Wrote {n} frames to {args.out_gif}")
