"""Headline benchmark: Gaussian-mixture field evaluation throughput (fwd+bwd).

Measures the framework's hot primitive — the fused value+gradient+Hessian mixture
evaluation that every training loop calls per step (SURVEY.md §2.1 performance
envelope: 65,536 samples x ~O(1k) Gaussians) — as (sample x Gaussian) pair
evaluations per second through a full forward+backward pass on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` is measured against the recorded round-1 blockwise-XLA number
(BASELINE_PAIRS_PER_S below): the reference publishes no numbers (BASELINE.md), so
round-1's XLA path on this chip is the fixed baseline later rounds must beat.

Resilience: the axon TPU claim is acquired in ``sitecustomize`` at interpreter
start and is flaky under contention — a failed ``register()`` is swallowed there
and surfaces as a catchable "Unable to initialize backend 'axon'" at first jax
use. When the in-process attempt fails, this script retries by spawning fresh
``python bench.py --worker`` subprocesses (a fresh interpreter = a fresh claim
attempt), each bounded by a timeout, with backoff between attempts. On final
failure it still prints exactly one JSON line, with an ``"error"`` field —
the round record must never be a bare stack trace.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# Round-1 baseline (pair-evals/s, fwd+bwd, order-2, f32) measured on the one
# TPU v5e chip with the blockwise XLA path (the best non-Pallas implementation
# of the reference semantics): 121.7 ms for 65536 x 2048 pairs = 1.10e9 pair/s.
# Fixed after round 1; later rounds are measured against this.
BASELINE_PAIRS_PER_S = 1.10e9


def make_inputs(m=65536, n=2048, d=2, c=1, dtype=None):
    import jax
    import jax.numpy as jnp

    from pigs_tpu import gaussians
    dtype = dtype or jnp.float32
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
    import jax
    import jax.numpy as jnp

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


METRIC = "gaussian_pair_evals_per_s_fwd_bwd"

# One in-process attempt + up to 2 fresh-interpreter retries; each retry is a
# fresh axon claim attempt. Subprocesses are time-bounded so a hung
# sitecustomize register() can't wedge the round record.
RETRY_ATTEMPTS = 2
WORKER_TIMEOUT_S = 480
BACKOFF_S = (30, 60)


def _emit(pairs_per_s=None, error=None):
    rec = {
        "metric": METRIC,
        "value": pairs_per_s if pairs_per_s is not None else 0.0,
        "unit": "pair-evals/s",
        "vs_baseline": (pairs_per_s / BASELINE_PAIRS_PER_S)
        if pairs_per_s is not None else 0.0,
    }
    if error is not None:
        rec["error"] = error
    print(json.dumps(rec))


def _try_in_process():
    """Run the measurement in this interpreter; raises on backend failure."""
    import jax
    jax.devices()  # raises if the axon register() at interpreter start failed
    return measure()


def _try_subprocess():
    """Fresh interpreter = fresh axon claim attempt; bounded by a timeout.

    Returns (pairs_per_s | None, error_string | None).
    """
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker"],
        capture_output=True, text=True, timeout=WORKER_TIMEOUT_S,
    )
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            rec = json.loads(line)
        except ValueError:
            continue
        if rec.get("metric") == METRIC and not rec.get("error"):
            return float(rec["value"]), None
    tail = (proc.stderr or proc.stdout or "").strip().splitlines()[-3:]
    return None, f"worker rc={proc.returncode}: " + " | ".join(tail)


def main():
    if "--worker" in sys.argv:
        _emit(measure())
        return

    try:
        _emit(_try_in_process())
        return
    except Exception as e:  # noqa: BLE001 — any backend failure goes to retry
        last_err = f"{type(e).__name__}: {e}"
        print(f"[bench] in-process attempt failed: {last_err}", file=sys.stderr)

    for attempt in range(RETRY_ATTEMPTS):
        time.sleep(BACKOFF_S[min(attempt, len(BACKOFF_S) - 1)])
        print(f"[bench] subprocess retry {attempt + 1}/{RETRY_ATTEMPTS}",
              file=sys.stderr)
        try:
            value, err = _try_subprocess()
        except subprocess.TimeoutExpired:
            value, err = None, f"worker timed out after {WORKER_TIMEOUT_S}s"
        if value is not None:
            _emit(value)
            return
        last_err = err

    _emit(error=last_err)


if __name__ == "__main__":
    main()
