#!/usr/bin/env python
"""Direct (no-MLP) PDE solve CLI (the reference's test_no_mlp*.py drivers).

Examples:
  python scripts/solve_no_mlp.py --problem burgers --d 1 --timesteps 13
  python scripts/solve_no_mlp.py --problem wave --d 2 --timesteps 20
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--problem", default="burgers",
                   choices=["diffusion", "burgers", "wave"])
    p.add_argument("--d", type=int, default=1, choices=[1, 2])
    p.add_argument("--scale", type=float, default=2.5)
    p.add_argument("--n-init", type=int, default=25)
    p.add_argument("--capacity", type=int, default=1024)
    p.add_argument("--timesteps", type=int, default=13)
    p.add_argument("--dt", type=float, default=None)
    p.add_argument("--max-iters", type=int, default=5000)
    p.add_argument("--densify-every", type=int, default=0,
                   help="densify every N blocks (0 = off)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None)
    p.add_argument("--render-res", type=int, default=200)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pigs_tpu.ops.mixture import eval_mixture
    from pigs_tpu.pde import Problem
    from pigs_tpu.train.no_mlp import NoMLPConfig, concrete, solve
    from pigs_tpu.utils.sampling import grid_samples

    out_dir = args.out or f"results_no_mlp_{args.d}d"
    os.makedirs(out_dir, exist_ok=True)

    cfg = NoMLPConfig(
        problem=Problem[args.problem.upper()], d=args.d, scale=args.scale,
        n_init=args.n_init, capacity=args.capacity,
        dt=args.dt if args.dt is not None else (0.05 if args.d == 1 else 0.1),
        max_iters=args.max_iters)

    traj = solve(cfg, jax.random.PRNGKey(args.seed), args.timesteps,
                 densify_every=args.densify_every or None)

    xs = grid_samples(args.render_res, args.d, cfg.scale)
    losses = []
    for i, snap in enumerate(traj):
        means, conics, values = concrete(cfg, snap["params"])
        u = eval_mixture(means, conics, values, xs, order=0,
                         mask=snap["active"]).u
        np.savez(os.path.join(out_dir, f"gaussians_{args.problem}_{i}.npz"),
                 raw_means=np.asarray(snap["params"].raw_means),
                 values=np.asarray(snap["params"].values),
                 raw_scaling=np.asarray(snap["params"].raw_scaling),
                 transforms=np.asarray(snap["params"].transforms),
                 active=np.asarray(snap["active"]),
                 field=np.asarray(u))
        losses.append(snap["loss"])
        print(f"timestep {i}: loss {snap['loss']:.6f} "
              f"active {int(np.asarray(snap['active']).sum())}")
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump({"losses": losses}, f, indent=2)


if __name__ == "__main__":
    main()
