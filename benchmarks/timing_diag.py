#!/usr/bin/env python
"""Timing-methodology diagnostic for the tunneled chip.

Two independent completion barriers are compared for the same workloads:

  * ``block_until_ready`` (what naive timing uses), and
  * a value readback ``float(x.ravel()[0])`` — the host cannot have the value
    unless the entire dependency chain actually executed, so this is immune
    to an under-waiting ``block_until_ready`` and to any dispatch-level
    caching/pipelining in the tunnel.

If the two disagree by more than ~2x for a workload, every
block_until_ready-based number for that workload class is suspect and the
readback number is the honest one.

Workloads: (a) the bench.py grad step (real fused-kernel fwd+bwd), (b) a
256 MB elementwise exp chain with a non-converging, never-repeating input
(drifted per call, so no fixed point and no identical-dispatch dedup).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench_grad_step():
    from bench import make_inputs
    from pigs_tpu.ops.mixture import eval_mixture

    means, conics, values, samples = make_inputs()

    def loss(means, conics, values):
        out = eval_mixture(means, conics, values, samples, order=2,
                           sample_chunk=8192, diff_samples=False)
        return (jnp.sum(out.u ** 2) + jnp.sum(out.ux ** 2)
                + jnp.sum(out.uxx ** 2))

    step = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    jax.block_until_ready(step(means, conics, values))

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        g = step(means, conics, values)
    jax.block_until_ready(g)
    t_block = (time.perf_counter() - t0) / iters

    t0 = time.perf_counter()
    for _ in range(iters):
        g = step(means, conics, values)
    _ = float(np.asarray(g[0]).ravel()[0])   # forced readback
    t_read = (time.perf_counter() - t0) / iters
    return t_block, t_read


def exp_chain():
    n = 64 * 1024 * 1024
    K = 16

    @jax.jit
    def f(v, drift):
        # Non-converging: the drift shifts the map every call, so the chain
        # never reaches a fixed point and inputs never repeat.
        for _ in range(K):
            v = jnp.exp(-v) + drift
        return v

    x = jnp.linspace(0.05, 1.0, n, dtype=jnp.float32)
    j = 0
    x = jax.block_until_ready(f(x, jnp.float32(0.0)))

    iters = 8
    t0 = time.perf_counter()
    for _ in range(iters):
        j += 1
        x = f(x, jnp.float32(j * 1e-4))
    jax.block_until_ready(x)
    t_block = (time.perf_counter() - t0) / iters

    t0 = time.perf_counter()
    for _ in range(iters):
        j += 1
        x = f(x, jnp.float32(j * 1e-4))
    _ = float(np.asarray(x[:8]).ravel()[0])  # forced readback (tiny slice)
    t_read = (time.perf_counter() - t0) / iters
    return t_block, t_read, n, K


def main():
    tb, tr = bench_grad_step()
    print(f"bench grad step : block {tb*1e3:8.2f} ms   readback {tr*1e3:8.2f} ms")
    m, n = 65536, 2048
    print(f"  -> pair rate  : block {m*n/tb/1e9:6.2f} Gpair/s  "
          f"readback {m*n/tr/1e9:6.2f} Gpair/s")
    tb, tr, n, K = exp_chain()
    print(f"exp chain 256MB : block {tb*1e3:8.2f} ms   readback {tr*1e3:8.2f} ms")
    print(f"  -> exp rate   : block {K*n/tb/1e9:8.1f} Ge/s  "
          f"readback {K*n/tr/1e9:8.1f} Ge/s")
    print(f"  -> HBM floor  : readback {2*4*n/tr/1e9:8.1f} GB/s "
          f"(one read+write per dispatch after fusion)")


if __name__ == "__main__":
    main()
