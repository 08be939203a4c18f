#!/usr/bin/env python
"""Render a rollout-vs-ground-truth panel figure from a results directory.

Produces ``rollout_panel.png``: three rows (PN prediction, ground truth,
|difference|) at a handful of timesteps, plus the per-step relative-L2 curve —
the visual counterpart of the reference's per-step ``imshow`` dumps
(main_pn.py:303-321, 453-460), but with the comparison the reference never
renders.

Works on any results dir written by validate_pn.py (rollout_frames.npy +
fd_gt_frames.npy) or validate_ns.py (rollout_w.npy + gt_w.npy).

Example:
  python scripts/plot_rollout.py results_burgers_dt01
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("results_dir")
    p.add_argument("--steps", type=int, nargs="*", default=None,
                   help="timesteps to show (default: 6 evenly spaced)")
    p.add_argument("--channel", type=int, default=0,
                   help="field channel for multi-channel problems (wave)")
    p.add_argument("--out", default=None,
                   help="output path (default: <dir>/rollout_panel.png)")
    args = p.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    d = args.results_dir
    if os.path.exists(os.path.join(d, "rollout_w.npy")):       # NS layout
        pred = np.load(os.path.join(d, "rollout_w.npy"))
        gt = np.load(os.path.join(d, "gt_w.npy"))
        signed = True
        field = "vorticity"
    else:
        pred = np.load(os.path.join(d, "rollout_frames.npy"))
        gt = np.load(os.path.join(d, "fd_gt_frames.npy"))
        if pred.ndim == 4:                                      # (T, c, r, r)
            pred = pred[:, args.channel]
        if gt.ndim == 4:
            gt = gt[:, args.channel]
        signed = bool(np.min(gt) < -0.05 * np.max(np.abs(gt)))
        field = "u"
    n = min(pred.shape[0], gt.shape[0])
    pred, gt = pred[:n], gt[:n]
    steps = args.steps or [int(round(i * (n - 1) / 5)) for i in range(6)]
    steps = [s for s in steps if s < n]
    if not steps:
        print(f"requested steps all out of range (0..{n - 1}); "
              f"using evenly spaced defaults")
        steps = [int(round(i * (n - 1) / 5)) for i in range(6)]

    summary = {}
    spath = os.path.join(d, "summary.json")
    if os.path.exists(spath):
        with open(spath) as f:
            summary = json.load(f)
    rel = summary.get("per_step_rel_norm")

    vmax = float(np.max(np.abs(gt)))
    if signed:
        fkw = dict(cmap="RdBu_r", vmin=-vmax, vmax=vmax)  # diverging, neutral 0
    else:
        fkw = dict(cmap="Blues", vmin=0.0, vmax=vmax)     # single-hue sequential
    ncol = len(steps)
    fig, axes = plt.subplots(3, ncol, figsize=(1.9 * ncol, 6.4),
                             constrained_layout=True)
    if ncol == 1:
        axes = axes.reshape(3, 1)
    emax = float(np.max(np.abs(pred[steps] - gt[steps])))
    for j, s in enumerate(steps):
        im0 = axes[0, j].imshow(pred[s], **fkw)
        axes[1, j].imshow(gt[s], **fkw)
        im2 = axes[2, j].imshow(np.abs(pred[s] - gt[s]), cmap="Oranges",
                                vmin=0.0, vmax=emax)
        axes[0, j].set_title(f"step {s}", fontsize=10)
        for i in range(3):
            axes[i, j].set_xticks([])
            axes[i, j].set_yticks([])
    axes[0, 0].set_ylabel("PN rollout", fontsize=10)
    axes[1, 0].set_ylabel("ground truth", fontsize=10)
    axes[2, 0].set_ylabel("|difference|", fontsize=10)
    fig.colorbar(im0, ax=axes[:2, -1], shrink=0.8, label=field)
    fig.colorbar(im2, ax=axes[2, -1], shrink=0.8, label="abs err")
    title = f"{summary.get('problem', os.path.basename(d))}"
    if rel:
        title += f" — mean rel-L2 {summary.get('mean_rel_norm', float('nan')):.3f}"
    fig.suptitle(title)
    out = args.out or os.path.join(d, "rollout_panel.png")
    fig.savefig(out, dpi=130)
    plt.close(fig)
    print(f"wrote {out}")

    if rel:
        fig = plt.figure(figsize=(5.2, 3.2), constrained_layout=True)
        ax = fig.add_subplot()
        ax.plot(rel, lw=2, color="#3b6fb6")
        extra = summary.get("per_step_rel_norm_psi")
        if extra:
            ax.plot(extra, lw=2, color="#b6713b", label="psi channel")
            ax.plot([], [], lw=2, color="#3b6fb6", label="phi channel")
            ax.legend(frameon=False)
        ax.set_xlabel("rollout step")
        ax.set_ylabel("relative L2 vs ground truth")
        ax.spines[["top", "right"]].set_visible(False)
        ax.grid(alpha=0.25, lw=0.5)
        curve = args.out or os.path.join(d, "rollout_rel_norm.png")
        curve = curve.replace("rollout_panel", "rollout_rel_norm") \
            if "rollout_panel" in curve else os.path.join(
                d, "rollout_rel_norm.png")
        fig.savefig(curve, dpi=130)
        plt.close(fig)
        print(f"wrote {curve}")


if __name__ == "__main__":
    main()
