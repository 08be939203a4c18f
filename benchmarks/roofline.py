#!/usr/bin/env python
"""Roofline probe for the fused mixture kernel (BASELINE.md "speed of light").

The order-2 mixture evaluation is transcendental-bound, not MXU-bound: per
(sample, Gaussian) pair the forward computes one exp plus ~40 f32 VPU flops,
and the Gaussian-side backward recomputes the exp once more (the sample-side
kernel is skipped for ``diff_samples=False``, the bench workload).  The
relevant hardware ceiling is therefore the chip's exp throughput.

Measurement methodology on this tunneled chip (see benchmarks/timing_diag.py
for the experiment):

  * ``block_until_ready`` is honest for the real fused-kernel grad step
    (block == value-readback timing to <1%), so bench.py's number stands.
  * It UNDER-waits for large elementwise chains, and large arrays are
    shipped host<->device per dispatch (~4.4 GB/s network), so chip-local
    HBM bandwidth is NOT measurable through the tunnel and any probe with
    big operands measures the network, not the chip.

Therefore the exp probe below uses a SMALL persistent array (8 MB, shipping
cost ~2 ms) with a very deep in-kernel chain (4096 dependent exps per
element via fori_loop), a per-call drift so no dispatch ever repeats, and a
value-readback barrier.  Compute (~8.6e9 exps) dominates transfer >40x.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = 2 * 1024 * 1024   # 8 MB f32
K_INNER = 16          # unrolled exps per loop body
K_LOOP = 256          # fori_loop trips -> 4096 exps/element/dispatch


def main():
    @jax.jit
    def deep_exp(v, drift):
        def body(_, u):
            for _ in range(K_INNER):
                u = jnp.exp(-u) + drift
            return u
        return jax.lax.fori_loop(0, K_LOOP, body, v)

    x = jnp.linspace(0.05, 1.0, N, dtype=jnp.float32)
    x = jax.block_until_ready(deep_exp(x, jnp.float32(0.0)))  # compile

    iters, j = 4, 0
    t0 = time.perf_counter()
    for _ in range(iters):
        j += 1
        x = deep_exp(x, jnp.float32(j * 1e-4))
    _ = float(np.asarray(x[:8]).ravel()[0])   # value-readback barrier
    t = (time.perf_counter() - t0) / iters

    exps = N * K_INNER * K_LOOP
    exp_rate = exps / t
    print(f"exp throughput:    {exp_rate/1e9:8.2f} Ge/s  "
          f"({exps/1e9:.1f}e9 dependent exps per {t*1e3:.1f} ms dispatch)")

    # Headline kernel rate (same workload as bench.py; verified honest by
    # timing_diag.py: block == readback for this step).
    from bench import measure
    pair_rate = measure()
    # fwd+bwd = 2 exps per pair (the backward recomputes the density once).
    implied_exp = 2.0 * pair_rate
    print(f"kernel pair rate:  {pair_rate/1e9:8.2f} Gpair/s (fwd+bwd)")
    print(f"implied exp rate:  {implied_exp/1e9:8.2f} Ge/s "
          f"= {implied_exp/exp_rate*100:.0f}% of the measured exp roofline")
    print("note: the kernel also does ~40 VPU flops/pair around each exp; "
          "matching a pure-exp stream is unattainable, so the % above is a "
          "lower bound on how close the kernel is to the VPU ceiling.")


if __name__ == "__main__":
    main()
