"""Oracle correctness: analytic derivatives vs autodiff and finite differences.

Replaces the reference's test_derivatives.py (autograd-of-sum vs derivative kernel,
finite differences on the rendered field, Hessian vs gaussian_derivative2; asserts
there were commented out — ours are real) and the float64 gradcheck scaffolding
(test_derivatives.py:84-108) via jax.test_util.check_grads.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

from pigs_tpu import gaussians
from pigs_tpu.ops.oracle import eval_mixture_dense
from pigs_tpu.utils.sampling import grid_samples


def make_mixture(key, n=12, d=2, c=1, dtype=jnp.float64):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    means = (jax.random.uniform(k1, (n, d), dtype) * 2.0 - 1.0)
    scaling = jnp.exp(jax.random.normal(k2, (n, d), dtype) * 0.3 - 1.5)
    transforms = jax.random.normal(k3, (n, gaussians.off_diag_size(d)), dtype) * 0.5
    values = jax.random.normal(k4, (n, c), dtype)
    cov, con = gaussians.build_full_covariances(scaling, transforms)
    return means, cov, con, values


@pytest.mark.parametrize("d", [1, 2])
@pytest.mark.parametrize("c", [1, 2])
def test_derivative_orders_vs_autodiff(d, c):
    """Analytic ux/uxx/uxxx must equal jax autodiff of u w.r.t. the sample point."""
    key = jax.random.PRNGKey(0)
    means, cov, con, values = make_mixture(key, n=8, d=d, c=c)
    samples = (jax.random.uniform(jax.random.PRNGKey(9), (5, d), jnp.float64)
               * 2.0 - 1.0)

    out = eval_mixture_dense(means, con, values, samples, order=3)

    def u_at(x):
        return eval_mixture_dense(means, con, values, x[None, :], order=0).u[0]

    for j in range(samples.shape[0]):
        x = samples[j]
        jac = jax.jacfwd(u_at)(x)                       # (c, d)
        np.testing.assert_allclose(np.asarray(out.ux[j]), np.asarray(jac.T),
                                   rtol=1e-9, atol=1e-12)
        hess = jax.jacfwd(jax.jacfwd(u_at))(x)          # (c, d, d)
        np.testing.assert_allclose(np.asarray(out.uxx[j]),
                                   np.transpose(np.asarray(hess), (1, 2, 0)),
                                   rtol=1e-9, atol=1e-12)
        third = jax.jacfwd(jax.jacfwd(jax.jacfwd(u_at)))(x)  # (c, d, d, d)
        np.testing.assert_allclose(np.asarray(out.uxxx[j]),
                                   np.transpose(np.asarray(third), (1, 2, 3, 0)),
                                   rtol=1e-8, atol=1e-11)


def test_value_vs_naive_sum():
    """u matches a literal per-Gaussian loop (the reference twin's math,
    gaussians.py:48-58)."""
    key = jax.random.PRNGKey(1)
    means, cov, con, values = make_mixture(key, n=6, d=2, c=2)
    samples = grid_samples(5, 2, dtype=jnp.float64)
    out = eval_mixture_dense(means, con, values, samples, order=0)
    expected = np.zeros((samples.shape[0], 2))
    for i in range(means.shape[0]):
        delta = np.asarray(samples) - np.asarray(means)[i]
        p = -0.5 * np.einsum("md,de,me->m", delta, np.asarray(con)[i], delta)
        expected += np.exp(p)[:, None] * np.asarray(values)[i]
    np.testing.assert_allclose(np.asarray(out.u), expected, rtol=1e-10, atol=1e-12)


def test_finite_difference_field():
    """First/second derivatives agree with finite differences of the field."""
    key = jax.random.PRNGKey(2)
    means, cov, con, values = make_mixture(key, n=10, d=2, c=1)
    x0 = jnp.array([[0.13, -0.27]], dtype=jnp.float64)
    h = 1e-5
    out = eval_mixture_dense(means, con, values, x0, order=2)

    def u(x, y):
        return float(eval_mixture_dense(
            means, con, values, jnp.array([[x, y]], dtype=jnp.float64), order=0).u[0, 0])

    fx = (u(0.13 + h, -0.27) - u(0.13 - h, -0.27)) / (2 * h)
    fy = (u(0.13, -0.27 + h) - u(0.13, -0.27 - h)) / (2 * h)
    np.testing.assert_allclose(float(out.ux[0, 0, 0]), fx, rtol=1e-6)
    np.testing.assert_allclose(float(out.ux[0, 1, 0]), fy, rtol=1e-6)
    fxx = (u(0.13 + h, -0.27) - 2 * u(0.13, -0.27) + u(0.13 - h, -0.27)) / h**2
    np.testing.assert_allclose(float(out.uxx[0, 0, 0, 0]), fxx, rtol=1e-4)


@pytest.mark.parametrize("order", [0, 1, 2, 3])
def test_gradcheck_all_inputs(order):
    """f64 check_grads through every tensor input, fwd and rev, to 2nd order —
    the analog of torch.autograd.gradcheck (test_derivatives.py:84-108) made an
    active assertion."""
    key = jax.random.PRNGKey(3)
    means, cov, con, values = make_mixture(key, n=5, d=2, c=1)
    samples = (jax.random.uniform(jax.random.PRNGKey(8), (4, 2), jnp.float64)
               * 2.0 - 1.0)

    def f(means, con, values, samples):
        out = eval_mixture_dense(means, con, values, samples, order=order)
        total = jnp.sum(out.u ** 2)
        if out.ux is not None:
            total += jnp.sum(out.ux ** 2)
        if out.uxx is not None:
            total += jnp.sum(out.uxx ** 2)
        if out.uxxx is not None:
            total += jnp.sum(out.uxxx ** 2)
        return total

    check_grads(f, (means, con, values, samples), order=2,
                modes=["fwd", "rev"], rtol=2e-4)


def test_mask_zeroes_inactive():
    key = jax.random.PRNGKey(4)
    means, cov, con, values = make_mixture(key, n=7, d=2, c=1)
    samples = grid_samples(4, 2, dtype=jnp.float64)
    mask = jnp.array([True, True, False, True, False, True, True])
    out = eval_mixture_dense(means, con, values, samples, order=1, mask=mask)
    ref = eval_mixture_dense(means[mask], con[mask], values[mask], samples, order=1)
    np.testing.assert_allclose(np.asarray(out.u), np.asarray(ref.u), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out.ux), np.asarray(ref.ux), rtol=1e-12)


def test_periodic_wrap():
    """A Gaussian hugging the -x edge must bleed over to the +x edge on the torus
    (behavior of test_torus.py:15-37)."""
    means = jnp.array([[-0.95, 0.0]], dtype=jnp.float64)
    cov, con = gaussians.build_full_covariances(
        jnp.full((1, 2), np.exp(-3.0), dtype=jnp.float64),
        jnp.zeros((1, 1), dtype=jnp.float64))
    values = jnp.ones((1, 1), dtype=jnp.float64)
    probe = jnp.array([[0.95, 0.0]], dtype=jnp.float64)
    flat = eval_mixture_dense(means, con, values, probe, order=0).u[0, 0]
    torus = eval_mixture_dense(means, con, values, probe, order=0,
                               period=2.0).u[0, 0]
    assert float(torus) > 100.0 * float(flat)
    # Wrapped distance is 0.1: check the exact value.
    expected = np.exp(-0.5 * (0.1 ** 2) / np.exp(-3.0))
    np.testing.assert_allclose(float(torus), expected, rtol=1e-10)


def test_1d_shapes():
    means = jnp.linspace(-1, 1, 9, dtype=jnp.float64).reshape(-1, 1)
    var = jnp.full((9, 1, 1), 0.01, dtype=jnp.float64)
    con = 1.0 / var
    values = jnp.ones((9, 1), dtype=jnp.float64)
    samples = jnp.linspace(-1, 1, 33, dtype=jnp.float64).reshape(-1, 1)
    out = eval_mixture_dense(means, con, values, samples, order=3)
    assert out.u.shape == (33, 1)
    assert out.ux.shape == (33, 1, 1)
    assert out.uxx.shape == (33, 1, 1, 1)
    assert out.uxxx.shape == (33, 1, 1, 1, 1)
