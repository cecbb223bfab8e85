#!/usr/bin/env python
"""Plot training/eval metric curves from MetricLogger JSONL logs.

Counterpart of the reference's loss-curve plotting script
(reference: nerf_rpn/scripts/plot_curve.py:1-50 — a hard-coded AP-vs-data
line plot; this reads the real metric logs every driver writes via
`--log_dir` instead). One PNG per metric key (or a single overlay with
--overlay), multiple runs compared on the same axes.

Usage:
  python scripts/plot_metrics.py runs/a/metrics_*.jsonl \
      [runs/b/metrics_*.jsonl ...] --out plots/ [--keys loss psnr] \
      [--smooth 0.9] [--overlay]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def load_jsonl(path):
    """[{step, metric: value, ...}] -> {metric: ([steps], [values])}."""
    series = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            step = rec.get("step", len(series))
            for k, v in rec.items():
                if k == "step" or not isinstance(v, (int, float)):
                    continue
                series.setdefault(k, ([], []))
                series[k][0].append(step)
                series[k][1].append(float(v))
    return series


def ema(values, alpha):
    """Exponential smoothing (TensorBoard-style)."""
    if not alpha:
        return values
    out, acc = [], None
    for v in values:
        acc = v if acc is None else alpha * acc + (1 - alpha) * v
        out.append(acc)
    return out


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Plot metric curves from MetricLogger jsonl logs")
    p.add_argument("logs", nargs="+",
                   help="jsonl paths or globs; each becomes one labeled run")
    p.add_argument("--out", default="plots",
                   help="output dir (one PNG per metric)")
    p.add_argument("--keys", nargs="*", default=None,
                   help="metric keys to plot (default: all numeric keys)")
    p.add_argument("--smooth", default=0.0, type=float,
                   help="EMA smoothing factor in [0, 1)")
    p.add_argument("--overlay", action="store_true",
                   help="all metrics on one figure (grid of subplots)")
    p.add_argument("--logy", action="store_true", help="log-scale y axis")
    args = p.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    paths = []
    for pattern in args.logs:
        hits = sorted(glob.glob(pattern))
        if not hits and os.path.exists(pattern):
            hits = [pattern]
        paths.extend(hits)
    if not paths:
        print(f"no logs match {args.logs}", file=sys.stderr)
        return 1

    runs = {}
    for path in paths:
        label = os.path.splitext(os.path.basename(path))[0]
        if label in runs:  # same filename in two dirs -> disambiguate
            label = os.path.join(
                os.path.basename(os.path.dirname(path)), label)
        runs[label] = load_jsonl(path)

    all_keys = sorted({k for s in runs.values() for k in s})
    keys = [k for k in (args.keys or all_keys) if k in all_keys]
    if not keys:
        print(f"no requested keys in logs; available: {all_keys}",
              file=sys.stderr)
        return 1

    os.makedirs(args.out, exist_ok=True)
    written = []
    if args.overlay:
        n = len(keys)
        ncols = min(3, n)
        nrows = (n + ncols - 1) // ncols
        fig, axes = plt.subplots(nrows, ncols,
                                 figsize=(5 * ncols, 3.5 * nrows),
                                 squeeze=False)
        for i, key in enumerate(keys):
            ax = axes[i // ncols][i % ncols]
            _plot_key(ax, runs, key, args.smooth, args.logy)
        for j in range(len(keys), nrows * ncols):
            axes[j // ncols][j % ncols].set_axis_off()
        fig.tight_layout()
        path = os.path.join(args.out, "metrics.png")
        fig.savefig(path, dpi=120)
        plt.close(fig)
        written.append(path)
    else:
        for key in keys:
            fig, ax = plt.subplots(figsize=(6, 4))
            _plot_key(ax, runs, key, args.smooth, args.logy)
            fig.tight_layout()
            path = os.path.join(args.out, f"{key.replace('/', '_')}.png")
            fig.savefig(path, dpi=120)
            plt.close(fig)
            written.append(path)

    for w in written:
        print(f"wrote {w}")
    return 0


def _plot_key(ax, runs, key, smooth, logy):
    for label, series in runs.items():
        if key not in series:
            continue
        steps, values = series[key]
        ax.plot(steps, ema(values, smooth), linewidth=1.5, label=label)
        if smooth:  # raw curve as a faint backdrop
            ax.plot(steps, values, linewidth=0.6, alpha=0.25,
                    color=ax.lines[-1].get_color())
    ax.set_xlabel("step")
    ax.set_ylabel(key)
    ax.set_title(key)
    if logy:
        ax.set_yscale("log")
    ax.grid(alpha=0.3)
    if len(runs) > 1:
        ax.legend(fontsize=8)


if __name__ == "__main__":
    sys.exit(main())
