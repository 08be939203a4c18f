"""Covariance construction, packing, closed-form inverse and eigendecomposition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pigs_tpu import gaussians


@pytest.mark.parametrize("d", [1, 2, 3])
def test_build_full_covariances_pd_and_inverse(d):
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    n = 17
    scaling = jnp.exp(jax.random.normal(k1, (n, d)) * 0.5 - 2.0)
    transforms = jax.random.normal(k2, (n, gaussians.off_diag_size(d)))
    cov, con = gaussians.build_full_covariances(scaling, transforms)
    assert cov.shape == (n, d, d)
    # Symmetric.
    np.testing.assert_allclose(cov, jnp.swapaxes(cov, -1, -2), rtol=0, atol=0)
    # Positive definite: all eigenvalues > 0.
    eigvals = np.linalg.eigvalsh(np.asarray(cov))
    assert (eigvals > 0).all()
    # Conic is the exact inverse.
    eye = jnp.broadcast_to(jnp.eye(d), (n, d, d))
    np.testing.assert_allclose(np.asarray(cov @ con), np.asarray(eye), atol=1e-10)


def test_build_matches_reference_formula_2d():
    """Off-diagonal = tanh(t) * sqrt(s0*s1) (reference gaussians.py:163-176)."""
    scaling = jnp.array([[0.5, 2.0]])
    transforms = jnp.array([[0.3]])
    cov, _ = gaussians.build_full_covariances(scaling, transforms)
    expected_off = np.tanh(0.3) * np.sqrt(0.5 * 2.0)
    np.testing.assert_allclose(cov[0, 0, 1], expected_off, rtol=1e-12)
    np.testing.assert_allclose(cov[0, 1, 0], expected_off, rtol=1e-12)
    np.testing.assert_allclose(cov[0, 0, 0], 0.5, rtol=1e-12)
    np.testing.assert_allclose(cov[0, 1, 1], 2.0, rtol=1e-12)


def test_pack_unpack_roundtrip():
    for d in (1, 2, 3):
        key = jax.random.PRNGKey(d)
        m = jax.random.normal(key, (5, d, d))
        sym = 0.5 * (m + jnp.swapaxes(m, -1, -2))
        packed = gaussians.pack_symmetric(sym)
        assert packed.shape == (5, gaussians.tri_size(d))
        np.testing.assert_allclose(
            np.asarray(gaussians.unpack_symmetric(packed, d)), np.asarray(sym))


def test_pack_order_matches_reference_2d():
    """d=2 packing must be [xx, xy, yy] — flat indices [0, 1, 3]
    (gaussians.py:186-189)."""
    sym = jnp.array([[[1.0, 2.0], [2.0, 3.0]]])
    packed = gaussians.pack_symmetric(sym)
    np.testing.assert_allclose(np.asarray(packed), [[1.0, 2.0, 3.0]])


@pytest.mark.parametrize("d", [1, 2, 3])
def test_sym_inverse_vs_linalg(d):
    key = jax.random.PRNGKey(42)
    scaling = jnp.exp(jax.random.normal(key, (11, d)))
    transforms = jax.random.normal(key, (11, gaussians.off_diag_size(d)))
    cov, _ = gaussians.build_full_covariances(scaling, transforms)
    np.testing.assert_allclose(
        np.asarray(gaussians.sym_inverse(cov)),
        np.linalg.inv(np.asarray(cov)), rtol=1e-9, atol=1e-9)


def test_sym_eig2x2_vs_numpy():
    key = jax.random.PRNGKey(7)
    scaling = jnp.exp(jax.random.normal(key, (50, 2)))
    transforms = jax.random.normal(key, (50, 1)) * 2.0
    cov, _ = gaussians.build_full_covariances(scaling, transforms)
    eigvals, eigvecs = gaussians.sym_eig2x2(cov)
    ref_vals = np.linalg.eigvalsh(np.asarray(cov))  # ascending
    np.testing.assert_allclose(np.sort(np.asarray(eigvals), axis=-1), ref_vals,
                               rtol=1e-9, atol=1e-12)
    # Each row of eigvecs is a unit eigenvector: cov @ v = lambda v.
    for i in range(50):
        for k in range(2):
            v = np.asarray(eigvecs)[i, k]
            lam = np.asarray(eigvals)[i, k]
            np.testing.assert_allclose(np.asarray(cov)[i] @ v, lam * v,
                                       rtol=1e-7, atol=1e-9)
            np.testing.assert_allclose(np.linalg.norm(v), 1.0, rtol=1e-12)


def test_sym_eig2x2_isotropic_degenerate():
    cov = jnp.eye(2)[None] * 0.3
    eigvals, eigvecs = gaussians.sym_eig2x2(cov)
    np.testing.assert_allclose(np.asarray(eigvals), [[0.3, 0.3]], rtol=1e-12)
    assert np.isfinite(np.asarray(eigvecs)).all()


def test_principal_axis_matches_dominant_eigenpair():
    key = jax.random.PRNGKey(3)
    scaling = jnp.exp(jax.random.normal(key, (20, 2)))
    transforms = jax.random.normal(key, (20, 1))
    cov, _ = gaussians.build_full_covariances(scaling, transforms)
    axis = gaussians.principal_axis(cov)
    vals, vecs = np.linalg.eigh(np.asarray(cov))
    lam_max = vals[:, -1]
    v_max = vecs[:, :, -1]
    # Same magnitude; direction may flip sign.
    np.testing.assert_allclose(np.linalg.norm(np.asarray(axis), axis=-1),
                               np.abs(lam_max), rtol=1e-7)
    dots = np.abs(np.sum(np.asarray(axis) * v_max, axis=-1))
    np.testing.assert_allclose(dots, np.abs(lam_max), rtol=1e-7)
