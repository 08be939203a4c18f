"""Neighbor aggregation: shapes, masking, gradients, and shift-learning capacity.

The reference's one *active* hard assertion is a float64 gradcheck of
aggregate_neighbors (test_neighbor_aggregation.py:89-98); test_gradcheck_all_inputs
is its analog.  test_can_learn_spatial_shift reproduces the functional learning test
(test_neighbor_aggregation.py:103-193): aggregation must be able to express a
one-grid-row shift of a stripe pattern.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.test_util import check_grads

from pigs_tpu import gaussians
from pigs_tpu.ops.aggregate import aggregate_neighbors, neighbor_mask


def setup(nx=5, ny=5, L=2, K=4, E=21, d=2, dtype=jnp.float64, seed=0,
          log_var=-1.5):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 6)
    n = nx * ny
    t = jnp.linspace(-1, 1, nx, dtype=dtype)
    gx, gy = jnp.meshgrid(t, t, indexing="ij")
    means = jnp.stack([gx, gy], axis=-1).reshape(n, d)
    scaling = jnp.full((n, d), np.exp(log_var), dtype=dtype)
    cov, _ = gaussians.build_full_covariances(scaling, jnp.zeros((n, 1), dtype))
    F = (E - 1) // d // 2
    features = jax.random.uniform(ks[0], (n, L), dtype)
    transform = jax.random.uniform(ks[1], (L, L), dtype)
    queries = jax.random.uniform(ks[2], (n, K), dtype)
    keys = jax.random.uniform(ks[3], (n, K), dtype)
    frequencies = jax.random.normal(ks[4], (F,), dtype) * 10
    distance_transform = jax.random.uniform(ks[5], (L, 2 * E), dtype)
    mask = neighbor_mask(means, cov)
    return (means, cov, mask,
            (features, transform, queries, keys, frequencies, distance_transform))


def test_output_shape_and_finite():
    means, cov, mask, args = setup()
    out = aggregate_neighbors(*args[:6], means=means, mask=mask)
    assert out.shape == args[0].shape
    assert np.isfinite(np.asarray(out)).all()


def test_no_neighbors_row_is_zero():
    means, cov, mask, args = setup()
    mask = mask.at[3, :].set(False)
    out = aggregate_neighbors(*args, means=means, mask=mask)
    np.testing.assert_allclose(np.asarray(out[3]), 0.0, atol=0)


def test_gradcheck_all_inputs():
    """f64 check_grads w.r.t. all six tensor inputs (reference's active gradcheck,
    test_neighbor_aggregation.py:89-98)."""
    means, cov, mask, args = setup()

    def f(features, transform, queries, keys, frequencies, distance_transform):
        out = aggregate_neighbors(features, transform, queries, keys, frequencies,
                                  distance_transform, means=means, mask=mask)
        return jnp.sum(out ** 2)

    check_grads(f, args, order=1, modes=["rev"], rtol=1e-6)


def test_neighbor_mask_excludes_far_pairs():
    means, cov, mask, _ = setup(nx=5, ny=5, log_var=-4.0)
    m = np.asarray(mask)
    assert not m[0, 24]          # opposite corners: not neighbors
    assert m[0, 1] or m[0, 5]    # adjacent grid nodes: neighbors
    assert not m.diagonal().any()  # self excluded


def test_neighbor_mask_periodic():
    means = jnp.array([[-0.95, 0.0], [0.95, 0.0]])
    cov = jnp.tile(jnp.eye(2)[None] * 0.01, (2, 1, 1))
    flat = neighbor_mask(means, cov)
    torus = neighbor_mask(means, cov, period=2.0)
    assert not bool(flat[0, 1])
    assert bool(torus[0, 1])


def test_can_learn_spatial_shift():
    """Train the aggregation (with small in/out projections) to shift a stripe
    pattern by one grid row — the reference's functional ground truth
    (test_neighbor_aggregation.py:126-193)."""
    nx = ny = 10
    d = 2
    L, K, E = 8, 4, 21
    n = nx * ny
    dtype = jnp.float32
    t = jnp.linspace(-1, 1, nx, dtype=dtype)
    gx, gy = jnp.meshgrid(t, t, indexing="ij")
    means = jnp.stack([gx, gy], axis=-1).reshape(n, d)
    scaling = jnp.full((n, d), np.exp(-2.0), dtype=dtype)
    cov, _ = gaussians.build_full_covariances(
        scaling, jnp.zeros((n, 1), dtype=dtype))
    mask = neighbor_mask(means, cov, sigma_cut=3.0)

    values = np.zeros((n, 1), np.float32)
    expected = np.zeros((n, 1), np.float32)
    for i in range(nx):
        if i % 5 == 0:
            for j in range(ny):
                values[i * ny + j] = 1.0
                if i + 1 < nx:
                    expected[(i + 1) * ny + j] = 1.0
    values = jnp.asarray(values)
    expected = jnp.asarray(expected)

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    F = (E - 1) // d // 2
    params = {
        "w_in": jax.random.normal(ks[0], (1, L), dtype) * 0.5,
        "b_in": jnp.zeros((L,), dtype),
        "transform": jax.random.uniform(ks[1], (L, L), dtype) - 0.5,
        "wq": jax.random.normal(ks[2], (L, K), dtype) * 0.5,
        "wk": jax.random.normal(ks[3], (L, K), dtype) * 0.5,
        "dist": jax.random.uniform(ks[4], (L, 2 * E), dtype) - 0.5,
        "w_out": jax.random.normal(ks[5], (L, 1), dtype) * 0.5,
        "b_out": jnp.zeros((1,), dtype),
    }
    frequencies = jax.random.normal(ks[6], (F,), dtype) * 10

    def forward(p):
        feats = jnp.tanh(values @ p["w_in"] + p["b_in"])
        agg = aggregate_neighbors(
            feats, p["transform"], feats @ p["wq"], feats @ p["wk"],
            frequencies, p["dist"], means=means, mask=mask)
        return agg @ p["w_out"] + p["b_out"]

    def loss_fn(p):
        return jnp.mean((forward(p) - expected) ** 2)

    opt = optax.adam(1e-2)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    loss0 = float(loss_fn(params))
    for _ in range(400):
        params, state, loss = step(params, state)
    assert float(loss) < 0.25 * loss0, (loss0, float(loss))


# ------------------------------------------------------------------ factored --


def test_factored_matches_dense_values_and_grads():
    """The angle-addition factorization is EXACT: values and all six input
    gradients match the dense path to f64 machine precision, periodic or not,
    d=1 and d=2."""
    from pigs_tpu.ops.aggregate import aggregate_neighbors_factored

    for d, E in ((1, 13), (2, 21)):
        for period in (None, 2.0):
            key = jax.random.PRNGKey(3)
            ks = jax.random.split(key, 7)
            n, L, K = 40, 3, 4
            F = (E - 1) // d // 2
            dtype = jnp.float64
            means = jax.random.uniform(ks[6], (n, d), dtype) * 2 - 1
            cov = (jnp.eye(d, dtype=dtype)[None] * 0.02
                   + jnp.zeros((n, d, d), dtype))
            mask = neighbor_mask(means, cov, period=period)
            args = (jax.random.normal(ks[0], (n, L), dtype),
                    jax.random.normal(ks[1], (L, L), dtype),
                    jax.random.normal(ks[2], (n, K), dtype),
                    jax.random.normal(ks[3], (n, K), dtype),
                    jax.random.normal(ks[4], (F,), dtype) * 10,
                    jax.random.normal(ks[5], (L, 2 * E), dtype))

            a = aggregate_neighbors(*args, means=means, mask=mask,
                                    period=period)
            b = aggregate_neighbors_factored(*args, means=means, mask=mask,
                                             period=period)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-12, atol=1e-12)

            def loss(fn):
                return lambda *a_: jnp.sum(
                    fn(*a_, means=means, mask=mask, period=period) ** 2)

            g1 = jax.grad(loss(aggregate_neighbors),
                          argnums=tuple(range(6)))(*args)
            g2 = jax.grad(loss(aggregate_neighbors_factored),
                          argnums=tuple(range(6)))(*args)
            for x, y in zip(g1, g2):
                np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                           rtol=1e-9, atol=1e-10)


def test_factored_means_gradient_matches_dense():
    """Gradients w.r.t. the Gaussian centers flow through the trig tables in
    the factored path and through the embedded displacements in the dense
    path — both must agree."""
    from pigs_tpu.ops.aggregate import aggregate_neighbors_factored

    means, cov, mask, args = setup()

    def loss(fn):
        return lambda m: jnp.sum(fn(*args, means=m, mask=mask) ** 2)

    g1 = jax.grad(loss(aggregate_neighbors))(means)
    g2 = jax.grad(loss(aggregate_neighbors_factored))(means)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-9, atol=1e-10)


def test_factored_double_backward():
    """grad-of-grad works through the factored path (plain XLA autodiff, no
    custom_vjp) — the property the reference requests with create_graph=True
    (test_derivatives.py:122-123)."""
    from pigs_tpu.ops.aggregate import aggregate_neighbors_factored

    means, cov, mask, args = setup()
    feats = args[0]

    def inner(f):
        out = aggregate_neighbors_factored(f, *args[1:], means=means,
                                           mask=mask)
        return jnp.sum(out ** 2)

    gg = jax.grad(lambda f: jnp.sum(jax.grad(inner)(f) ** 2))(feats)
    assert np.isfinite(np.asarray(gg)).all()
    check_grads(inner, (feats,), order=2, modes=["rev"], atol=1e-6, rtol=1e-6)
