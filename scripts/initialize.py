#!/usr/bin/env python
"""Fit-to-target mixture initialization CLI (the reference's test_initialize*.py).

Examples:
  python scripts/initialize.py gaussian
  python scripts/initialize.py sinusoid --iters 3000
  python scripts/initialize.py path/to/image.png
  # curl-fit one FNO trajectory (the reference's "f <idx>" mode,
  # test_initialize.py:39-47, 112-116):
  python scripts/initialize.py f --fno ns_V1e-3_N50_T50.npy --index 11
  # convert the first K trajectories into an NSDataset .npz for
  # `train_pn.py --ns-data` (main_pn.py:36-49):
  python scripts/initialize.py convert --fno ns_V1e-3_N50_T50.npy --count 50 \
      --out ns_data.npz
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("target",
                   help="'gaussian' | 'sinusoid' | 'f' | 'convert' | "
                        "image path")
    p.add_argument("--nx", type=int, default=50)
    p.add_argument("--capacity", type=int, default=4096)
    p.add_argument("--iters", type=int, default=6000)
    p.add_argument("--split-every", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="results_initialize")
    p.add_argument("--render-res", type=int, default=128)
    p.add_argument("--fno", default=None,
                   help="FNO .npy (T, res, res, N) for 'f'/'convert' modes")
    p.add_argument("--index", type=int, default=0,
                   help="trajectory index for 'f' mode")
    p.add_argument("--frame", type=int, default=0,
                   help="vorticity frame to fit in 'f' mode")
    p.add_argument("--count", type=int, default=None,
                   help="trajectories to convert in 'convert' mode")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pigs_tpu.ops.mixture import eval_mixture_image
    from pigs_tpu.train.fit import (FitConfig, fit, gaussian_pair_target,
                                    image_target, sinusoid_target)
    from pigs_tpu.train import fit as fit_mod

    if args.target == "convert":
        from pigs_tpu.train.ns_data import convert_fno
        out = (args.out if args.out.endswith(".npz")
               else os.path.join(args.out, "ns_data.npz"))
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        convert_fno(args.fno, out, count=args.count,
                    nx=min(args.nx, 20), iters=args.iters, seed=args.seed)
        return

    cfg = FitConfig(nx=args.nx, capacity=args.capacity, iters=args.iters,
                    split_every_blocks=args.split_every)

    if args.target == "f":
        from pigs_tpu.train.ns_data import load_fno
        frame = load_fno(args.fno)[args.index, :, :, args.frame]
        cfg = cfg._replace(curl=True, periodic=True, tanh_means=False,
                           capacity=cfg.nx * cfg.nx)
        target = image_target(jnp.asarray(frame, jnp.float32))
    elif args.target == "gaussian":
        target = gaussian_pair_target(cfg)
    elif args.target == "sinusoid":
        target = sinusoid_target()
    else:
        import matplotlib.image as mpimg
        img = np.asarray(mpimg.imread(args.target), np.float32)
        if img.ndim == 3:
            img = img[..., 0]
        target = image_target(jnp.asarray(img))

    params, active, losses = fit(cfg, target, jax.random.PRNGKey(args.seed))
    os.makedirs(args.out, exist_ok=True)
    means, conics, values = fit_mod._concrete(cfg, params)
    img = eval_mixture_image(means, conics, values, args.render_res,
                             mask=active)
    np.savez(os.path.join(args.out, "fit.npz"),
             raw_means=np.asarray(params.raw_means),
             values=np.asarray(params.values),
             raw_scaling=np.asarray(params.raw_scaling),
             transforms=np.asarray(params.transforms),
             active=np.asarray(active), render=np.asarray(img),
             losses=np.asarray(losses))
    print(f"final loss {losses[-1]:.6f}, "
          f"active {int(np.asarray(active).sum())}, saved to {args.out}")


if __name__ == "__main__":
    main()
