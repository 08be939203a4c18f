#!/usr/bin/env python
"""Gradient accuracy of the fused mixture backward vs a float64 reference
(BASELINE.md accuracy target; VERDICT r1 item 8).

Two phases because f64 runs on CPU and the Pallas kernel on TPU:

  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python benchmarks/grad_accuracy.py cpu
      -> computes f64 blockwise-XLA reference grads, saves grad_ref.npz
  python benchmarks/grad_accuracy.py tpu
      -> computes f32 Pallas + f32 blockwise grads on the chip, prints the
         error table (max elementwise relative error on |ref| > tau entries,
         plus norm-relative error).

Workload: the bench.py loss (order-2 sum of squares) at the sizes given by
--m/--n (default 65536 x 2048, the headline size).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

STASH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "grad_ref.npz")


def build(m, n, dtype):
    import jax
    import jax.numpy as jnp
    from bench import make_inputs
    means, conics, values, samples = make_inputs(m=m, n=n)
    return tuple(jnp.asarray(np.asarray(x), dtype)
                 for x in (means, conics, values, samples))


def grads(m, n, dtype, impl):
    import jax
    import jax.numpy as jnp
    from pigs_tpu.ops.mixture import eval_mixture
    means, conics, values, samples = build(m, n, dtype)

    def loss(means, conics, values):
        out = eval_mixture(means, conics, values, samples, order=2,
                           sample_chunk=4096, impl=impl, diff_samples=False)
        return (jnp.sum(out.u ** 2) + jnp.sum(out.ux ** 2)
                + jnp.sum(out.uxx ** 2))

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)),
                static_argnames=())(means, conics, values)
    return tuple(np.asarray(x, np.float64) for x in g)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("phase", choices=["cpu", "tpu"])
    p.add_argument("--m", type=int, default=65536)
    p.add_argument("--n", type=int, default=2048)
    args = p.parse_args()

    import jax
    if args.phase == "cpu":
        jax.config.update("jax_enable_x64", True)
        ref = grads(args.m, args.n, "float64", impl="blockwise")
        np.savez(STASH, means=ref[0], conics=ref[1], values=ref[2],
                 m=args.m, n=args.n)
        print(f"saved f64 reference grads for {args.m}x{args.n} -> {STASH}")
        return

    data = np.load(STASH)
    assert int(data["m"]) == args.m and int(data["n"]) == args.n, \
        "stash was computed for different sizes; re-run the cpu phase"
    ref = (data["means"], data["conics"], data["values"])
    names = ("means", "conics", "values")

    def sym(g):
        # The packed Pallas kernel returns the canonical symmetrized conic
        # gradient while the dense/blockwise paths treat C[0,1] and C[1,0] as
        # independent; both agree through build_full_covariances (the
        # off-diagonals are tied), so compare symmetrized — the same
        # convention as tests/test_pallas_mixture.py::_sym_conic_grad.
        return 0.5 * (g + np.swapaxes(g, -1, -2))

    for impl in ("pallas", "blockwise"):
        got = grads(args.m, args.n, "float32", impl=impl)
        print(f"impl={impl}:")
        for nm, a, b in zip(names, got, ref):
            if nm == "conics":
                a, b = sym(a), sym(b)
            a, b = a.ravel(), b.ravel()
            tau = 1e-3 * np.abs(b).max()
            mask = np.abs(b) > tau
            max_rel = np.max(np.abs(a[mask] - b[mask]) / np.abs(b[mask]))
            norm_rel = np.linalg.norm(a - b) / np.linalg.norm(b)
            print(f"  {nm:7s} max-rel {max_rel:.2e}  norm-rel {norm_rel:.2e}")


if __name__ == "__main__":
    main()
