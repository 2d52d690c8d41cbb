"""Results & analysis tooling: metrics export, learning curves, dream GIFs.

Counterpart of the reference's results/ tooling (reference: results/atari/
mlflow_export.ipynb, figures.ipynb, makegif.ipynb — SURVEY §2.29), as
importable functions + CLI scripts (scripts/export_metrics.py etc.) instead
of notebooks.
"""

from __future__ import annotations

import csv
import json
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Union

import numpy as np

__all__ = ["load_metrics", "export_csv", "learning_curve", "plot_curves",
           "make_dream_gif"]


def load_metrics(run_dir: Union[str, Path]) -> List[Dict[str, float]]:
    """Read a run's metrics.jsonl into a list of row dicts."""
    path = Path(run_dir) / "metrics.jsonl"
    rows = []
    if not path.exists():
        return rows
    with open(path) as f:
        for line in f:
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    return rows


def export_csv(run_dir: Union[str, Path], out_path: Union[str, Path],
               keys: Optional[Sequence[str]] = None) -> int:
    """metrics.jsonl -> wide CSV (one column per metric). Returns row count."""
    rows = load_metrics(run_dir)
    if not rows:
        return 0
    if keys is None:
        keys = sorted({k for r in rows for k in r})
        keys = ["_step"] + [k for k in keys if k != "_step"]
    with open(out_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(keys), extrasaction="ignore")
        w.writeheader()
        for r in rows:
            w.writerow(r)
    return len(rows)


def learning_curve(run_dir: Union[str, Path], metric: str = "agent/return",
                   x_metric: str = "_step"):
    """-> (steps, values) arrays for one metric.

    x_metric other than '_step' (e.g. 'train/data_env_steps' for an
    env-step axis comparable to published baselines): the x value is
    interpolated over the rows that carry it, since agent- and
    train-metric flushes land on different rows."""
    rows = load_metrics(run_dir)
    xs, ys = [], []
    for r in rows:
        if metric in r:
            xs.append(r.get("_step", 0))
            ys.append(r[metric])
    xs, ys = np.asarray(xs, np.float64), np.asarray(ys)
    if x_metric != "_step" and len(xs):
        bx = [(r.get("_step", 0), r[x_metric]) for r in rows if x_metric in r]
        if bx:
            bs, bv = map(np.asarray, zip(*bx))
            xs = np.interp(xs, bs.astype(np.float64), bv.astype(np.float64))
    return xs, ys


def plot_curves(run_dirs: Sequence[Union[str, Path]], metric: str,
                out_path: Union[str, Path], baseline_csv: Optional[str] = None,
                smooth: int = 1, x_metric: str = "_step",
                baseline_env: Optional[str] = None,
                baseline_label: str = "baseline"):
    """Learning curves for N runs (+ optional baseline CSV) -> PNG.

    The baseline CSV follows the reference's committed format: columns
    ``env, method, run, env_steps, return``
    (results/baselines/atari-dreamerv2.csv); ``baseline_env`` filters to
    one task when the CSV holds several. Pass
    ``x_metric='train/data_env_steps'`` to put the runs on the same
    env-step axis as the baseline.
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 4.5))
    for rd in run_dirs:
        xs, ys = learning_curve(rd, metric, x_metric=x_metric)
        if len(ys) == 0:
            continue
        if smooth > 1 and len(ys) >= smooth:
            ys = np.convolve(ys, np.ones(smooth) / smooth, mode="valid")
            xs = xs[len(xs) - len(ys):]
        ax.plot(xs, ys, label=Path(rd).name)
    if baseline_csv:
        import csv as _csv
        bx, by = [], []
        with open(baseline_csv) as f:
            for row in _csv.DictReader(f):
                if baseline_env and row.get("env") not in (None, baseline_env):
                    continue
                bx.append(float(row.get("env_steps", row.get("step", 0))))
                by.append(float(row.get("return", row.get("value", 0))))
        ax.plot(bx, by, "k--", label=baseline_label, alpha=0.6)
    ax.set_xlabel("env steps" if x_metric != "_step" else "step")
    ax.set_ylabel(metric)
    ax.legend()
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


def make_dream_gif(npz_path: Union[str, Path], out_path: Union[str, Path],
                   batch_index: int = 0, fps: int = 8,
                   side_by_side: bool = True) -> int:
    """d2_wm_dream / d2_wm_closed npz -> animated GIF.

    Stacks ground-truth `image` next to `image_pred` per frame (the
    reference's makegif.ipynb). Returns the number of frames written.
    """
    from PIL import Image

    with np.load(npz_path) as npz:
        data = {k: npz[k] for k in npz.files}
    # npz dumps are (B,T,...) batch-major (prepare_batch_npz)
    image = data["image"][batch_index]        # (T,H,W,C) uint8
    pred = data.get("image_pred")
    frames = []
    for t in range(image.shape[0]):
        img = image[t]
        if img.ndim == 2:  # categorical -> grayscale
            img = (img * (255 // max(img.max(), 1))).astype(np.uint8)
            img = np.stack([img] * 3, -1)
        if pred is not None and side_by_side:
            p = pred[batch_index][t]
            if p.ndim == 2:
                p = (p * (255 // max(int(p.max()), 1))).astype(np.uint8)
                p = np.stack([p] * 3, -1)
            elif p.dtype != np.uint8:
                p = ((p + 0.5) * 255.0).clip(0, 255).astype(np.uint8) \
                    if p.max() <= 1.0 else p.astype(np.uint8)
            img = np.concatenate([img, p], axis=1)
        frames.append(Image.fromarray(img))
    if frames:
        frames[0].save(out_path, save_all=True, append_images=frames[1:],
                       duration=int(1000 / fps), loop=0)
    return len(frames)
