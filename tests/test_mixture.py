"""Blockwise eval_mixture vs the dense oracle (values, grads, padding edges)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pigs_tpu import gaussians
from pigs_tpu.ops.mixture import eval_mixture
from pigs_tpu.ops.oracle import eval_mixture_dense


def make(key, n=20, d=2, c=2, m=700, dtype=jnp.float64):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    means = (jax.random.uniform(k1, (n, d), dtype) * 2.0 - 1.0)
    scaling = jnp.exp(jax.random.normal(k2, (n, d), dtype) * 0.3 - 1.5)
    transforms = jax.random.normal(k3, (n, gaussians.off_diag_size(d)), dtype) * 0.5
    values = jax.random.normal(k4, (n, c), dtype)
    _, con = gaussians.build_full_covariances(scaling, transforms)
    samples = (jax.random.uniform(k5, (m, d), dtype) * 2.0 - 1.0)
    return means, con, values, samples


@pytest.mark.parametrize("m", [7, 256, 700])  # below, equal-multiple, ragged
def test_blockwise_equals_dense(m):
    means, con, values, samples = make(jax.random.PRNGKey(0), m=m)
    blocked = eval_mixture(means, con, values, samples, order=3, sample_chunk=256)
    dense = eval_mixture_dense(means, con, values, samples, order=3)
    for a, b in zip(blocked, dense):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12,
                                   atol=1e-14)


def test_blockwise_gradients_equal_dense():
    means, con, values, samples = make(jax.random.PRNGKey(1), m=300)

    def loss_blocked(means, con, values):
        out = eval_mixture(means, con, values, samples, order=2, sample_chunk=128)
        return jnp.sum(out.u ** 2) + jnp.sum(out.ux ** 2) + jnp.sum(out.uxx ** 2)

    def loss_dense(means, con, values):
        out = eval_mixture_dense(means, con, values, samples, order=2)
        return jnp.sum(out.u ** 2) + jnp.sum(out.ux ** 2) + jnp.sum(out.uxx ** 2)

    g1 = jax.grad(loss_blocked, argnums=(0, 1, 2))(means, con, values)
    g2 = jax.grad(loss_dense, argnums=(0, 1, 2))(means, con, values)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-10,
                                   atol=1e-12)


def test_jit_cache_and_mask():
    means, con, values, samples = make(jax.random.PRNGKey(2), m=500)
    mask = jnp.arange(means.shape[0]) % 3 != 0
    out = eval_mixture(means, con, values, samples, order=1, mask=mask,
                       sample_chunk=128)
    ref = eval_mixture_dense(means[mask], con[mask], values[mask], samples, order=1)
    np.testing.assert_allclose(np.asarray(out.u), np.asarray(ref.u), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out.ux), np.asarray(ref.ux), rtol=1e-12)
