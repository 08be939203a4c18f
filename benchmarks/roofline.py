#!/usr/bin/env python
"""Roofline probe for the fused mixture kernel (BASELINE.md "speed of light").

The order-2 mixture evaluation is transcendental-bound, not MXU-bound: per
(sample, Gaussian) pair the forward computes one exp plus ~40 f32 VPU flops,
and the backward recomputes the exp once more.  The relevant hardware ceiling
is therefore the chip's exp throughput, which this script measures directly
with a pure jnp.exp stream, and compares against the pair rate the kernel
achieves (each fwd+bwd pair costs >= 2 exps).

Prints one line per probe plus the implied fraction-of-roofline.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(f, *args, iters=20):
    jax.block_until_ready(f(*args))  # compile
    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    n = 64 * 1024 * 1024  # 256 MB f32: far beyond VMEM, HBM-streamed
    x = jnp.linspace(-3.0, 0.0, n, dtype=jnp.float32)

    # Pure exp stream: one exp per element, one read + one write of HBM.
    exp_stream = jax.jit(lambda v: jnp.exp(v))
    t_exp = timed(exp_stream, x)
    exp_rate = n / t_exp

    # exp + multiply-accumulate chain (closer to the kernel's inner loop mix).
    fused = jax.jit(lambda v: jnp.exp(v) * v + v * v)
    t_fused = timed(fused, x)
    fused_rate = n / t_fused

    # HBM bandwidth probe: pure copy.
    copy = jax.jit(lambda v: v + 1.0)
    t_copy = timed(copy, x)
    bw = 2 * 4 * n / t_copy  # read + write, 4B each

    print(f"exp throughput:    {exp_rate/1e9:8.2f} Ge/s   ({t_exp*1e3:.2f} ms)")
    print(f"exp+mac chain:     {fused_rate/1e9:8.2f} Ge/s")
    print(f"HBM copy bandwidth:{bw/1e9:8.1f} GB/s")

    # Headline kernel rate (same workload as bench.py).
    from bench import measure
    pair_rate = measure()
    # fwd+bwd = 2 exps per pair (backward recomputes the density once).
    implied_exp = 2.0 * pair_rate
    print(f"kernel pair rate:  {pair_rate/1e9:8.2f} Gpair/s (fwd+bwd)")
    print(f"implied exp rate:  {implied_exp/1e9:8.2f} Ge/s "
          f"= {implied_exp/exp_rate*100:.0f}% of the measured exp roofline")


if __name__ == "__main__":
    main()
