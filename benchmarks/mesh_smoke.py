#!/usr/bin/env python
"""Mosaic-under-shard_map smoke on REAL TPU hardware.

`tests/test_parallel.py` and `__graft_entry__.dryrun_multichip` validate the
sharded paths on the 8-device virtual CPU mesh, where the Pallas kernels run
in interpret mode.  This script compiles and runs the fused Mosaic kernels
*inside* ``shard_map`` on the actual chip(s) available — the compile surface
that a pod slice would hit first — and checks values and gradients against
the dense XLA path on the same device.

Prints one JSON line with max relative errors.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from bench import make_inputs
    from pigs_tpu.ops.mixture import eval_mixture
    from pigs_tpu.parallel.mesh import make_mesh

    from pigs_tpu.parallel.sharded import eval_mixture_sharded

    means, conics, values, samples = make_inputs(m=4096, n=512)
    mesh = make_mesh()

    def rel(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        return float(np.abs(a - b).max() / (np.abs(b).max() + 1e-30))

    out = {"backend": jax.default_backend(),
           "mesh": {k: int(v) for k, v in mesh.shape.items()}}

    sh = eval_mixture_sharded(mesh, means, conics, values, samples, order=2,
                              impl="pallas")
    ref = eval_mixture(means, conics, values, samples, order=2, impl="xla",
                       diff_samples=False)
    out["fwd_rel"] = {"u": rel(sh.u, ref.u), "ux": rel(sh.ux, ref.ux),
                      "uxx": rel(sh.uxx, ref.uxx)}

    def loss(impl):
        def f(means, values):
            if impl == "sharded":
                o = eval_mixture_sharded(mesh, means, conics, values, samples,
                                         order=2, impl="pallas")
            else:
                o = eval_mixture(means, conics, values, samples, order=2,
                                 impl="xla", diff_samples=False)
            return jnp.sum(o.u ** 2) + jnp.sum(o.ux ** 2) + jnp.sum(o.uxx ** 2)
        return f

    g_sh = jax.jit(jax.grad(loss("sharded"), argnums=(0, 1)))(means, values)
    g_rf = jax.jit(jax.grad(loss("xla"), argnums=(0, 1)))(means, values)
    out["grad_rel"] = {"means": rel(g_sh[0], g_rf[0]),
                      "values": rel(g_sh[1], g_rf[1])}
    ok = (max(out["fwd_rel"].values()) < 3e-4
          and max(out["grad_rel"].values()) < 3e-3)
    out["ok"] = bool(ok)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
