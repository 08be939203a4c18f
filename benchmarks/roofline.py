#!/usr/bin/env python
"""Roofline probe for the fused mixture kernel (BASELINE.md "speed of light").

The order-2 mixture evaluation is transcendental-bound, not MXU-bound: per
(sample, Gaussian) pair the forward computes one exp plus ~40 f32 VPU flops,
and the Gaussian-side backward recomputes the exp once more (the sample-side
kernel is skipped for ``diff_samples=False``, the bench workload).  The
relevant hardware ceiling is therefore the chip's exp throughput, measured
here directly, plus the HBM stream rate as a sanity floor.

Probe design note: repeated dispatches with *identical* arguments measure
nothing on this setup — the axon tunnel pipelines/dedupes them, reporting
physically impossible rates (>30 TB/s "bandwidth").  Every probe below is a
data-dependent chain: the compute probe nests K exps inside ONE fused
elementwise kernel (y <- exp(-y) composed K times, domain-stable in (0, 1]),
the bandwidth probe runs K full read+write passes under ``lax.fori_loop``,
and successive dispatches feed the previous output back as input.

Prints one line per probe plus the implied fraction-of-roofline.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

K = 16  # chain length per dispatch


def timed_chain(f, x, iters=8):
    """Time ``x = f(x)`` chains: data-dependent across AND inside dispatches."""
    x = jax.block_until_ready(f(x))  # compile
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            x = f(x)
        jax.block_until_ready(x)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    n = 64 * 1024 * 1024  # 256 MB f32: far beyond VMEM, HBM-streamed
    x = jnp.linspace(0.05, 1.0, n, dtype=jnp.float32)

    @jax.jit
    def exp_chain(v):
        # K nested exps fused into one elementwise kernel: one HBM read +
        # one write, K exps per element -> compute-bound at K=16.
        for _ in range(K):
            v = jnp.exp(-v)
        return v

    t = timed_chain(exp_chain, x)
    exp_rate = K * n / t

    @jax.jit
    def bw_chain(v):
        # K sequential full passes (read + write each) over the array; the
        # loop-carried dependence forces XLA to materialize every pass.
        return jax.lax.fori_loop(
            0, K, lambda i, u: u * 1.0000001 + 0.5, v)

    t = timed_chain(bw_chain, x)
    bw = K * 2 * 4 * n / t  # K passes x (read + write) x 4 B

    print(f"exp throughput:    {exp_rate/1e9:8.2f} Ge/s  "
          f"(K={K} nested, {n/1e6:.0f}M lanes)")
    print(f"HBM stream rate:   {bw/1e9:8.1f} GB/s  (fori_loop passes)")

    # Headline kernel rate (same workload as bench.py).
    from bench import measure
    pair_rate = measure()
    # fwd+bwd = 2 exps per pair (the backward recomputes the density once).
    implied_exp = 2.0 * pair_rate
    print(f"kernel pair rate:  {pair_rate/1e9:8.2f} Gpair/s (fwd+bwd)")
    print(f"implied exp rate:  {implied_exp/1e9:8.2f} Ge/s "
          f"= {implied_exp/exp_rate*100:.0f}% of the measured exp roofline")


if __name__ == "__main__":
    main()
