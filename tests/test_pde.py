"""PDE registry: per-problem rhs shapes and values, integration rules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pigs_tpu.pde import (IntegrationRule, PDECoefficients, Problem, channels,
                          pde_rhs, pde_size, time_integrate)


def fake_fields(m=6, d=2, c=1, seed=0):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 6)
    samples = jax.random.normal(ks[0], (m, d))
    u = jax.random.normal(ks[1], (m, c))
    ux = jax.random.normal(ks[2], (m, d, c))
    uxx = jax.random.normal(ks[3], (m, d, d, c))
    wx = jax.random.normal(ks[4], (m, d))
    wxx = jax.random.normal(ks[5], (m, d, d))
    return samples, u, ux, uxx, wx, wxx


def test_diffusion_is_laplacian():
    samples, u, ux, uxx, *_ = fake_fields()
    rhs = pde_rhs(Problem.DIFFUSION, PDECoefficients(), samples, u, ux, uxx)
    np.testing.assert_allclose(np.asarray(rhs),
                               np.asarray(uxx[:, 0, 0] + uxx[:, 1, 1]))


def test_burgers_value():
    samples, u, ux, uxx, *_ = fake_fields()
    coeff = PDECoefficients.default(Problem.BURGERS)
    rhs = pde_rhs(Problem.BURGERS, coeff, samples, u, ux, uxx)
    expected = coeff.nu * (uxx[:, 0, 0] + uxx[:, 1, 1]) - u * ux[:, 0]
    np.testing.assert_allclose(np.asarray(rhs), np.asarray(expected))
    assert abs(coeff.nu - 1.0 / (10.0 * np.pi)) < 1e-12


def test_wave_two_channels():
    samples, u, ux, uxx, *_ = fake_fields(c=2)
    rhs = pde_rhs(Problem.WAVE, PDECoefficients(), samples, u, ux, uxx)
    assert rhs.shape == u.shape
    np.testing.assert_allclose(np.asarray(rhs[..., 0]), np.asarray(u[..., 1]))
    expected = 10.0 * (uxx[..., 0, 0, 0] + uxx[..., 1, 1, 0]) - 0.1 * u[..., 1]
    np.testing.assert_allclose(np.asarray(rhs[..., 1]), np.asarray(expected))


def test_navier_stokes_vorticity_form():
    samples, u, ux, uxx, wx, wxx = fake_fields(c=2)
    coeff = PDECoefficients.default(Problem.NAVIER_STOKES)
    rhs = pde_rhs(Problem.NAVIER_STOKES, coeff, samples, u, ux, uxx, wx, wxx)
    expected = (coeff.nu * (wxx[:, 0, 0] + wxx[:, 1, 1])
                - (u[:, 0] * wx[:, 0] + u[:, 1] * wx[:, 1]))
    np.testing.assert_allclose(np.asarray(rhs), np.asarray(expected), rtol=1e-6)


def test_poisson_uses_time():
    samples, u, ux, uxx, *_ = fake_fields()
    rhs0 = pde_rhs(Problem.POISSON, PDECoefficients(), samples, u, ux, uxx, t=0.0)
    rhs1 = pde_rhs(Problem.POISSON, PDECoefficients(), samples, u, ux, uxx, t=1.0)
    assert not np.allclose(np.asarray(rhs0), np.asarray(rhs1))


def test_channels_and_pde_size():
    assert channels(Problem.WAVE) == 2
    assert channels(Problem.NAVIER_STOKES) == 2
    assert channels(Problem.BURGERS) == 1
    assert pde_size(Problem.NAVIER_STOKES) == 1
    assert pde_size(Problem.WAVE) == 2


@pytest.mark.parametrize("rule,expect", [
    (IntegrationRule.FORWARD, "prev"),
    (IntegrationRule.BACKWARD, "curr"),
])
def test_integration_endpoints(rule, expect):
    prev = jnp.zeros((4, 1))
    curr = jnp.ones((4, 1))
    ts = jnp.full((4,), 0.3)
    out = time_integrate(rule, ts, prev, curr)
    np.testing.assert_allclose(np.asarray(out),
                               0.0 if expect == "prev" else 1.0)


def test_trapezoid_convex_combination():
    prev = jnp.zeros((4, 2))
    curr = jnp.ones((4, 2))
    ts = jnp.array([0.0, 0.25, 0.5, 1.0])
    out = time_integrate(IntegrationRule.TRAPEZOID, ts, prev, curr)
    np.testing.assert_allclose(np.asarray(out)[:, 0], np.asarray(ts))
