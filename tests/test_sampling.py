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


def test_conic_form_matches_scipy_pdf_shape():
    """Unnormalized exp(-0.5 x^T C x) is proportional to the scipy multivariate
    normal pdf (the reference's test_conic_matrix.py check)."""
    import scipy.stats as st
    cov = np.array([[0.1, 0.03], [0.03, 0.2]])
    con = np.linalg.inv(cov)
    xs = np.asarray(grid_samples(11, 2))
    ours = np.exp(-0.5 * np.einsum("md,de,me->m", xs, con, xs))
    ref = st.multivariate_normal.pdf(xs, mean=[0, 0], cov=cov)
    ref = ref / ref.max()
    np.testing.assert_allclose(ours / ours.max(), ref, rtol=1e-10)


def test_oracle_d3():
    """The dense oracle is dimension-generic: d=3 values and first derivatives
    match autodiff."""
    from pigs_tpu.ops.oracle import eval_mixture_dense
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    n, d = 5, 3
    means = jax.random.uniform(ks[0], (n, d), jnp.float64) * 2 - 1
    scaling = jnp.exp(jax.random.normal(ks[1], (n, d), jnp.float64) * 0.2 - 1.5)
    transforms = jax.random.normal(ks[2], (n, 3), jnp.float64) * 0.3
    cov, con = gaussians.build_full_covariances(scaling, transforms)
    values = jax.random.normal(ks[3], (n, 1), jnp.float64)
    x0 = jnp.array([[0.1, -0.2, 0.3]], dtype=jnp.float64)
    out = eval_mixture_dense(means, con, values, x0, order=2)

    def u_at(x):
        return eval_mixture_dense(means, con, values, x[None, :], order=0).u[0, 0]

    jac = jax.jacfwd(u_at)(x0[0])
    np.testing.assert_allclose(np.asarray(out.ux[0, :, 0]), np.asarray(jac),
                               rtol=1e-9)
    hess = jax.jacfwd(jax.jacfwd(u_at))(x0[0])
    np.testing.assert_allclose(np.asarray(out.uxx[0, :, :, 0]),
                               np.asarray(hess), rtol=1e-9)


def test_profiling_timer():
    from pigs_tpu.utils.profiling import Timer
    t = Timer()
    with t("op"):
        pass
    with t("op"):
        pass
    assert t.totals()["op"] >= 0
    assert "op" in t.report()


def test_launch_single_process_noop():
    from pigs_tpu.parallel.launch import (host_summary, initialize_distributed,
                                          is_multihost)
    assert initialize_distributed() is False
    assert is_multihost() is False
    assert "process 0/1" in host_summary()
