"""Sharded mixture evaluation equals the single-device oracle (8-dev CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np

from pigs_tpu import gaussians
from pigs_tpu.ops.oracle import eval_mixture_dense
from pigs_tpu.parallel.mesh import make_mesh
from pigs_tpu.parallel.sharded import eval_mixture_sharded


def make(key, n=32, d=2, c=2, m=64, dtype=jnp.float64):
    ks = jax.random.split(key, 5)
    means = (jax.random.uniform(ks[0], (n, d), dtype) * 2.0 - 1.0)
    scaling = jnp.exp(jax.random.normal(ks[1], (n, d), dtype) * 0.3 - 2.0)
    transforms = jax.random.normal(ks[2], (n, 1), dtype) * 0.5
    values = jax.random.normal(ks[3], (n, c), dtype)
    _, con = gaussians.build_full_covariances(scaling, transforms)
    samples = (jax.random.uniform(ks[4], (m, d), dtype) * 2.0 - 1.0)
    return means, con, values, samples


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_equals_dense_2d_mesh():
    mesh = make_mesh(shape=(4, 2))
    means, con, values, samples = make(jax.random.PRNGKey(0))
    sharded = eval_mixture_sharded(mesh, means, con, values, samples, order=2)
    dense = eval_mixture_dense(means, con, values, samples, order=2)
    np.testing.assert_allclose(np.asarray(sharded.u), np.asarray(dense.u),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(sharded.ux), np.asarray(dense.ux),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(sharded.uxx), np.asarray(dense.uxx),
                               rtol=1e-12)


def test_sharded_equals_dense_model_only_mesh():
    mesh = make_mesh(shape=(1, 8))
    means, con, values, samples = make(jax.random.PRNGKey(1), n=40, m=24)
    sharded = eval_mixture_sharded(mesh, means, con, values, samples, order=1,
                                   mask=jnp.arange(40) % 5 != 0)
    dense = eval_mixture_dense(means, con, values, samples, order=1,
                               mask=jnp.arange(40) % 5 != 0)
    np.testing.assert_allclose(np.asarray(sharded.u), np.asarray(dense.u),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(sharded.ux), np.asarray(dense.ux),
                               rtol=1e-12)


def test_sharded_gradients_equal_dense():
    mesh = make_mesh(shape=(2, 4))
    means, con, values, samples = make(jax.random.PRNGKey(2))

    def loss_sharded(means, con, values):
        out = eval_mixture_sharded(mesh, means, con, values, samples, order=1)
        return jnp.sum(out.u ** 2) + jnp.sum(out.ux ** 2)

    def loss_dense(means, con, values):
        out = eval_mixture_dense(means, con, values, samples, order=1)
        return jnp.sum(out.u ** 2) + jnp.sum(out.ux ** 2)

    g1 = jax.grad(loss_sharded, argnums=(0, 1, 2))(means, con, values)
    g2 = jax.grad(loss_dense, argnums=(0, 1, 2))(means, con, values)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-10,
                                   atol=1e-12)
