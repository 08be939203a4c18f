"""Samplers and small utilities (the reference's embedded UnitTests,
gaussians.py:195-248, made portable)."""

import jax
import jax.numpy as jnp
import numpy as np

from pigs_tpu.models.dynamics import RBFAct, WaveAct
from pigs_tpu.ops.mixture import eval_mixture_image, eval_mixture_region
from pigs_tpu.utils.sampling import (boundary_band_samples, grid_samples,
                                     image_samples, region_kernel)
from pigs_tpu import gaussians


def _contains(expected, samples):
    samples = np.asarray(samples)
    for e in expected:
        assert any(np.allclose(s, e) for s in samples), (e, samples)


def test_region_kernel_2d_2():
    """region_kernel(2, 1.0, 2) -> the four half-step corners
    (gaussians.py:206-215)."""
    samples = region_kernel(2, 1.0, 2)
    assert samples.shape == (4, 2)
    _contains([[-0.5, -0.5], [0.5, -0.5], [-0.5, 0.5], [0.5, 0.5]], samples)


def test_region_kernel_2d_3():
    samples = region_kernel(3, 0.5, 2)
    assert samples.shape == (9, 2)
    _contains([[-0.5, 0.0], [0.0, 0.0], [0.5, 0.0], [-0.5, 0.5], [0.0, 0.5],
               [0.5, 0.5], [-0.5, -0.5], [0.0, -0.5], [0.5, -0.5]], samples)


def test_region_kernel_3d_2():
    samples = region_kernel(2, 2.0, 3)
    assert samples.shape == (8, 3)
    _contains([[1.0, 1.0, 1.0], [-1.0, -1.0, -1.0], [1.0, -1.0, 1.0]], samples)


def test_grid_and_image_samples_shapes():
    g = grid_samples(5, 2, scale=2.0)
    assert g.shape == (25, 2)
    assert float(g[:, 0].min()) == -2.0 and float(g[:, 0].max()) == 2.0
    img = image_samples(4, scale=1.0)
    assert img.shape == (16, 2)
    # y axis flipped: first row has the max y.
    assert float(img[0, 1]) == 1.0


def test_boundary_band_samples_on_bands():
    s = boundary_band_samples(jax.random.PRNGKey(0), 64, scale=1.0)
    s = np.asarray(s)
    half = 32
    # First half: x on the band, second half: y on the band.
    assert (np.abs(s[:half, 0]) >= 1.0).all()
    assert (np.abs(s[:half, 0]) <= 1.5).all()
    assert (np.abs(s[half:, 1]) >= 1.0).all()


def test_eval_mixture_region_and_image():
    means = jnp.zeros((1, 2))
    cov, con = gaussians.build_full_covariances(jnp.full((1, 2), 0.05),
                                                jnp.zeros((1, 1)))
    values = jnp.ones((1, 1))
    out = eval_mixture_region(means, con, values, [0.0, 0.0], 3, 0.1, order=0)
    assert out.u.shape == (9, 1)
    # Center sample is the peak.
    assert float(out.u[4, 0]) == np.asarray(out.u).max()
    img = eval_mixture_image(means, con, values, 16)
    assert img.shape == (16, 16, 1)
    peak = np.unravel_index(np.asarray(img).argmax(), (16, 16, 1))
    assert abs(peak[0] - 8) <= 1 and abs(peak[1] - 8) <= 1


def test_wave_and_rbf_activations():
    x = jnp.linspace(-1, 1, 8)
    wa = WaveAct()
    p = wa.init(jax.random.PRNGKey(0), x)
    y = wa.apply(p, x)
    np.testing.assert_allclose(np.asarray(y),
                               np.sin(np.asarray(x)) + np.cos(np.asarray(x)),
                               rtol=1e-6)
    rbf = RBFAct(in_dim=8)
    p2 = rbf.init(jax.random.PRNGKey(0), x)
    y2 = rbf.apply(p2, x)
    np.testing.assert_allclose(np.asarray(y2),
                               np.exp(-np.asarray(x) ** 2), rtol=1e-6)
