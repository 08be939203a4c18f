#!/usr/bin/env python
"""Roofline probe for the fused mixture kernel (BASELINE.md "speed of light").

Round-5 rework.  The round-2 version assumed the kernel is exp-bound and
measured a single deep-exp dispatch; measured on the chip, BOTH assumptions
fail:

  * a single dispatch through the axon tunnel has tens-of-seconds scheduling
    outliers (first-call warmups of 0.8-187 s were observed), so every number
    here is best-of-5 on a warmed executable;
  * dispatch+readback overhead is ~25 ms, so shallow chains measure overhead,
    not compute — rates are taken at the asymptote of a depth sweep (and the
    marginal rate between the two deepest points is reported, which cancels
    the constant overhead exactly);
  * the chip's measured exp rate (~1.3 Te/s) is ~36x the kernel's exp stream
    (2 exps/pair at ~18.5 Gpair/s = 37 Ge/s): exp is NOT the binding
    resource.  The kernel is bound by general VPU issue: per (sample,
    Gaussian) pair the order-2 fwd+bwd executes ~104 elementwise f32 ops
    (forward geometry 12 + weights 13; backward geometry 12 + adjoint
    accumulation ~30 + five E-fields ~31 + column reductions 6 — counted
    from ops/pallas_mixture.py _tile_geometry/_weight_list/_adjoint_fields;
    the value contractions ride the MXU and are not VPU work) plus 2 exps.

So the roofline statement this script prints is:

    sustained elementwise op rate = pair_rate * (OPS_PER_PAIR
                                    + EXPS_PER_PAIR * exp_cost_in_slots)
    fraction = that / measured_peak_slot_rate

where exp_cost_in_slots = peak_slot_rate / peak_exp_rate (how many FMA-slot
issues one exp displaces) and peak_slot_rate is measured with a deep
dependent FMA chain (one FMA = one VPU issue slot).  The op count does NOT
assume mul+add pairs fuse into FMAs; if the compiler fuses some, the true
utilization is proportionally lower — the printed fraction is therefore an
estimate with ~20% model uncertainty, which is why both the raw measured
rates and the op model are printed.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = 2 * 1024 * 1024   # 8 MB f32: small enough that tunnel shipping ~2 ms
K_INNER = 16

OPS_PER_PAIR = 104    # counted from ops/pallas_mixture.py (order 2, c=1)
EXPS_PER_PAIR = 2


def _best_of(f, *args, reps=5):
    """Best wall-clock of ``reps`` value-readback-barriered calls."""
    times = []
    v = None
    for j in range(reps):
        t0 = time.perf_counter()
        v = f(*args, jnp.float32(1e-4 * (j + 1)))
        _ = float(np.asarray(v[:8]).ravel()[0])
        times.append(time.perf_counter() - t0)
    return min(times), v


def _chain_rate(make, depths, unit_per_elem):
    """Asymptotic rate of a dependent elementwise chain: returns
    (marginal rate between the two deepest points, best time at each)."""
    results = []
    for k in depths:
        f = make(k)
        x = jnp.linspace(0.05, 1.0, N, dtype=jnp.float32)
        jax.block_until_ready(f(x, jnp.float32(0.0)))   # compile + warm
        best, _ = _best_of(f, x)
        results.append((k, best))
    (k1, t1), (k2, t2) = results[-2], results[-1]
    marginal = (k2 - k1) * K_INNER * N * unit_per_elem / (t2 - t1)
    return marginal, results


def main():
    def make_exp(k_loop):
        @jax.jit
        def deep_exp(v, drift):
            def body(_, u):
                for _ in range(K_INNER):
                    u = jnp.exp(-u) + drift
                return u
            return jax.lax.fori_loop(0, k_loop, body, v)
        return deep_exp

    def make_fma(k_loop):
        @jax.jit
        def deep_fma(v, drift):
            a = jnp.float32(0.99999)
            def body(_, u):
                for _ in range(K_INNER):
                    u = u * a + drift
                return u
            return jax.lax.fori_loop(0, k_loop, body, v)
        return deep_fma

    # exp chain: 1 exp + 1 add per element-step -> count exps only.
    exp_rate, exp_pts = _chain_rate(make_exp, (16384, 65536, 262144), 1.0)
    # FMA chain: one VPU issue slot per element-step.
    slot_rate, fma_pts = _chain_rate(make_fma, (262144, 1048576, 4194304), 1.0)

    print("measured ceilings (marginal rate between the two deepest "
          "dependent-chain points; overhead cancelled):")
    for name, rate, pts in (("exp", exp_rate, exp_pts),
                            ("fma-slot", slot_rate, fma_pts)):
        depths = ", ".join(f"{k*K_INNER}:{t*1e3:.0f}ms" for k, t in pts)
        print(f"  {name:9s} {rate/1e12:6.2f} T/s   ({depths})")

    # ------------------------------------------------- kernel under test ----
    # bench.measure() is the headline methodology: 10-dispatch windows, best
    # of 5 — pipelined dispatches hide the ~22 ms tunnel round-trip that a
    # single-dispatch readback timing would charge to the kernel.
    from bench import measure
    pair_rate = measure()

    exp_slots = slot_rate / exp_rate          # slots one exp displaces
    used = pair_rate * (OPS_PER_PAIR + EXPS_PER_PAIR * exp_slots)
    frac = used / slot_rate
    print(f"\nkernel fwd+bwd:   {pair_rate/1e9:6.2f} Gpair/s "
          "(bench.measure, best 10-dispatch window of 5)")
    print(f"exp stream:       {pair_rate*EXPS_PER_PAIR/1e9:6.1f} Ge/s "
          f"= {pair_rate*EXPS_PER_PAIR/exp_rate*100:.1f}% of exp ceiling "
          "(exp is not the binding resource)")
    print(f"op model:         {OPS_PER_PAIR} VPU ops + {EXPS_PER_PAIR} exps "
          f"per pair (1 exp ~ {exp_slots:.2f} slots)")
    print(f"VPU utilization:  {used/1e12:.2f} T slot/s of "
          f"{slot_rate/1e12:.2f} T slot/s measured peak = {frac*100:.0f}% "
          "(upper estimate; FMA fusion of counted mul+add pairs would "
          "lower it)")


if __name__ == "__main__":
    main()
