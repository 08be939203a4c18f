#!/usr/bin/env python
"""PN dynamics-network training CLI (the reference's main_pn.py driver).

Examples:
  python scripts/train_pn.py --problem test --epochs 500 --out results_model_pn
  python scripts/train_pn.py --problem burgers --resume --out results_model_pn
  python scripts/train_pn.py --problem navier_stokes --ns-data ns_data.npz ...
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--problem", default="test",
                   choices=["diffusion", "poisson", "burgers", "wave",
                            "navier_stokes", "test"])
    p.add_argument("--rule", default="trapezoid",
                   choices=["trapezoid", "forward", "backward"])
    p.add_argument("--nx", type=int, default=20)
    p.add_argument("--ny", type=int, default=20)
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--capacity", type=int, default=None)
    p.add_argument("--epochs", type=int, default=5000)
    p.add_argument("--n-samples", type=int, default=1024)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--ema-decay", type=float, default=None,
                   help="if set, keep an EMA of the params and roll out with it")
    p.add_argument("--epochs-per-dispatch", type=int, default=1,
                   help="batch N whole epochs into one device dispatch "
                        "(bit-identical result; big win on high-latency "
                        "links; best dividing save_step)")
    p.add_argument("--noise-std", type=float, default=0.0,
                   help="robustness noise on interior u per training step")
    p.add_argument("--adaptive-sampling", type=float, default=0.0,
                   help="fraction of collocation points drawn by |grad u| "
                        "importance sampling (0.0 = reference uniform)")
    p.add_argument("--width-mult", type=int, default=1,
                   help="network width multiplier (1 = reference sizes)")
    p.add_argument("--dt", type=float, default=1.0,
                   help="timestep size (reference hardcodes 1.0)")
    p.add_argument("--lr-min", type=float, default=None,
                   help="cosine-decay the base lr to this value")
    p.add_argument("--loss-weight-floor", type=float, default=0.0,
                   help="floor on the per-step loss weight")
    p.add_argument("--train-timesteps", type=int, default=30,
                   help="curriculum horizon (reference: 30)")
    p.add_argument("--out", default="results_model_pn")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--ns-data", default=None,
                   help=".npz with stored NS initializations + frames")
    p.add_argument("--rollout-steps", type=int, default=50)
    p.add_argument("--rollout-res", type=int, default=64)
    p.add_argument("--gt", default=None,
                   help=".npy ground-truth trajectory for rollout metrics")
    args = p.parse_args()

    from pigs_tpu.models.model import ModelConfig
    from pigs_tpu.pde import IntegrationRule, Problem
    from pigs_tpu.train.pn import (NSDataset, TrainConfig, rollout,
                                   rollout_metrics, train)
    from pigs_tpu.utils.plotting import save_field_frames

    cfg = ModelConfig.create(
        Problem[args.problem.upper()], IntegrationRule[args.rule.upper()],
        nx=args.nx, ny=args.ny, scale=args.scale, capacity=args.capacity,
        width_mult=args.width_mult)
    tcfg = TrainConfig(n_epochs=args.epochs, n_samples=args.n_samples,
                       lr=args.lr, seed=args.seed, dt=args.dt,
                       lr_min=args.lr_min,
                       train_timesteps=args.train_timesteps,
                       loss_weight_floor=args.loss_weight_floor,
                       ema_decay=args.ema_decay, noise_std=args.noise_std,
                       adaptive_sampling=args.adaptive_sampling,
                       epochs_per_dispatch=args.epochs_per_dispatch)

    os.makedirs(args.out, exist_ok=True)
    ns_data = NSDataset.load(args.ns_data) if args.ns_data else None

    network, params, opt_state, losses, ema_params = train(
        cfg, tcfg, checkpoint_dir=os.path.join(args.out, "checkpoints"),
        resume=args.resume, ns_data=ns_data)
    if ema_params is not None:
        params = ema_params  # roll out with the EMA shadow

    if losses:
        # Training-loss curve (main_pn.py:266-270).
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig = plt.figure()
        plt.plot(losses)
        plt.yscale("log")
        plt.xlabel(f"epoch / {TrainConfig().log_step}")
        plt.ylabel("total loss")
        fig.savefig(os.path.join(args.out, "training_loss.png"))
        plt.close(fig)

    frames, evo_time = rollout(cfg, network, params,
                               n_steps=args.rollout_steps,
                               res=args.rollout_res)
    save_field_frames(frames, args.out)
    summary = {"final_loss": losses[-1] if losses else None,
               "evo_time_s": evo_time,
               "rollout_steps": args.rollout_steps}
    if args.gt:
        import numpy as np
        summary.update(rollout_metrics(frames[:, 0], np.load(args.gt)))
    print("Time (evo):", evo_time)
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
