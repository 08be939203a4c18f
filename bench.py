"""Headline benchmark: Gaussian-mixture field evaluation throughput (fwd+bwd).

Measures the framework's hot primitive — the fused value+gradient+Hessian mixture
evaluation that every training loop calls per step (SURVEY.md §2.1 performance
envelope: 65,536 samples x ~O(1k) Gaussians) — as (sample x Gaussian) pair
evaluations per second through a full forward+backward pass on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` is measured against the recorded round-1 blockwise-XLA number
(BASELINE_PAIRS_PER_S below): the reference publishes no numbers (BASELINE.md), so
round-1's XLA path on this chip is the fixed baseline later rounds must beat.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

# Round-1 baseline (pair-evals/s, fwd+bwd, order-2, f32) measured on the one
# TPU v5e chip with the blockwise XLA path (the best non-Pallas implementation
# of the reference semantics): 121.7 ms for 65536 x 2048 pairs = 1.10e9 pair/s.
# Fixed after round 1; later rounds are measured against this.
BASELINE_PAIRS_PER_S = 1.10e9


def make_inputs(m=65536, n=2048, d=2, c=1, dtype=jnp.float32):
    from pigs_tpu import gaussians
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    means = (jax.random.uniform(ks[0], (n, d), dtype) * 2.0 - 1.0)
    scaling = jnp.exp(jax.random.normal(ks[1], (n, d), dtype) * 0.3 - 4.0)
    transforms = jax.random.normal(ks[2], (n, 1), dtype) * 0.5
    values = jax.random.normal(ks[3], (n, c), dtype)
    _, conics = gaussians.build_full_covariances(scaling, transforms)
    samples = (jax.random.uniform(ks[4], (m, d), dtype) * 2.0 - 1.0)
    return means, conics, values, samples


def measure(m=65536, n=2048):
    """Measured fwd+bwd pair-evals/s of the headline workload (importable —
    benchmarks/roofline.py reuses it)."""
    from pigs_tpu.ops.mixture import eval_mixture

    means, conics, values, samples = make_inputs(m=m, n=n)

    def loss(means, conics, values):
        # diff_samples=False matches training reality: collocation points are
        # constants, so the sample-grad backward kernel is skipped.
        out = eval_mixture(means, conics, values, samples, order=2,
                           sample_chunk=8192, diff_samples=False)
        return (jnp.sum(out.u ** 2) + jnp.sum(out.ux ** 2)
                + jnp.sum(out.uxx ** 2))

    step = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

    # Warm-up / compile.
    g = step(means, conics, values)
    jax.block_until_ready(g)

    # Best of several windows: the tunneled chip shows occasional slow
    # windows (scheduling noise); steady-state throughput is the best window.
    iters, windows = 10, 5
    best = float("inf")
    for _ in range(windows):
        start = time.time()
        for _ in range(iters):
            g = step(means, conics, values)
        jax.block_until_ready(g)
        best = min(best, time.time() - start)

    return m * n * iters / best


def main():
    pairs_per_s = measure()
    print(json.dumps({
        "metric": "gaussian_pair_evals_per_s_fwd_bwd",
        "value": pairs_per_s,
        "unit": "pair-evals/s",
        "vs_baseline": pairs_per_s / BASELINE_PAIRS_PER_S,
    }))


if __name__ == "__main__":
    main()
