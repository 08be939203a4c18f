#!/usr/bin/env python
"""Render rollout-vs-ground-truth figures for a results directory.

Produces ``rollout_panel.png`` (three rows: PN prediction, ground truth,
|difference|, at a handful of timesteps) and ``rollout_rel_norm.png`` (the
per-step relative-L2 curve) — the visual counterpart of the reference's
per-step ``imshow`` dumps (main_pn.py:303-321, 453-460), but with the
comparison the reference never renders.  validate_pn.py / validate_ns.py
call the same renderer automatically; this CLI re-renders on demand.

Example:
  python scripts/plot_rollout.py results_burgers_dt01 --steps 0 10 25 50
"""

import argparse
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
    args = p.parse_args()

    from pigs_tpu.utils.plotting import render_rollout_artifacts
    written = render_rollout_artifacts(args.results_dir,
                                       channel=args.channel,
                                       steps=args.steps)
    for w in written:
        print(f"wrote {w}")
    if not written:
        print(f"no rollout artifacts found in {args.results_dir}")


if __name__ == "__main__":
    main()
