"""Fused Pallas aggregation vs the dense masked-attention path (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from pigs_tpu import gaussians
from pigs_tpu.ops.aggregate import aggregate_neighbors, neighbor_mask
from pigs_tpu.ops.pallas_aggregate import aggregate_neighbors_pallas, radii_of


def setup(n=60, L=8, K=4, E=25, seed=0, log_var=-3.0, active_frac=1.0):
    d = 2
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 8)
    means = (jax.random.uniform(ks[0], (n, d)) * 2.0 - 1.0).astype(jnp.float32)
    scaling = jnp.exp(jax.random.normal(ks[1], (n, d)) * 0.2 + log_var)
    cov, _ = gaussians.build_full_covariances(
        scaling.astype(jnp.float32), jnp.zeros((n, 1), jnp.float32))
    F = (E - 1) // d // 2
    args = dict(
        features=jax.random.normal(ks[2], (n, L), jnp.float32),
        transform=jax.random.normal(ks[3], (L, L), jnp.float32),
        queries=jax.random.normal(ks[4], (n, K), jnp.float32),
        keys=jax.random.normal(ks[5], (n, K), jnp.float32),
        frequencies=jax.random.normal(ks[6], (F,), jnp.float32) * 10,
        distance_transform=jax.random.normal(ks[7], (L, 2 * E), jnp.float32),
    )
    active = None
    if active_frac < 1.0:
        active = jax.random.uniform(jax.random.PRNGKey(99), (n,)) < active_frac
    return means, cov, active, args


def run_both(means, cov, active, args, period=None):
    mask = neighbor_mask(means, cov, active=active, period=period)
    dense = aggregate_neighbors(args["features"], args["transform"],
                                args["queries"], args["keys"],
                                args["frequencies"],
                                args["distance_transform"],
                                means=means, mask=mask, period=period)
    if active is not None:
        dense = dense * active[:, None]
    radii = radii_of(cov, active)
    with pltpu.force_tpu_interpret_mode():
        fused = aggregate_neighbors_pallas(
            args["features"], args["transform"], args["queries"], args["keys"],
            args["frequencies"], args["distance_transform"], means, radii,
            period=period)
    return dense, fused


def test_matches_dense():
    means, cov, active, args = setup()
    dense, fused = run_both(means, cov, active, args)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(dense),
                               rtol=2e-4, atol=2e-5)


def test_matches_dense_with_inactive():
    means, cov, active, args = setup(active_frac=0.7)
    dense, fused = run_both(means, cov, active, args)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(dense),
                               rtol=2e-4, atol=2e-5)
    # Inactive rows are exactly zero.
    np.testing.assert_allclose(np.asarray(fused)[~np.asarray(active)], 0.0)


def test_matches_dense_periodic():
    means, cov, active, args = setup(n=40)
    dense, fused = run_both(means, cov, active, args, period=2.0)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(dense),
                               rtol=2e-4, atol=2e-5)


def test_large_n_beyond_one_chunk():
    # n > TILE_J exercises the chunked streaming path.
    means, cov, active, args = setup(n=600, log_var=-4.5)
    dense, fused = run_both(means, cov, active, args)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(dense),
                               rtol=2e-4, atol=2e-5)


def test_gradients_match_dense():
    means, cov, active, args = setup(n=50)
    mask = neighbor_mask(means, cov)
    radii = radii_of(cov)

    def loss_dense(features, transform, queries, keys, frequencies, dist):
        out = aggregate_neighbors(features, transform, queries, keys,
                                  frequencies, dist, means=means, mask=mask)
        return jnp.sum(out ** 2)

    def loss_fused(features, transform, queries, keys, frequencies, dist):
        out = aggregate_neighbors_pallas(features, transform, queries, keys,
                                         frequencies, dist, means, radii)
        return jnp.sum(out ** 2)

    inputs = (args["features"], args["transform"], args["queries"],
              args["keys"], args["frequencies"], args["distance_transform"])
    g_dense = jax.grad(loss_dense, argnums=tuple(range(6)))(*inputs)
    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(loss_fused, argnums=tuple(range(6)))(*inputs)
    for a, b in zip(g_fused, g_dense):
        scale = max(1.0, float(np.abs(np.asarray(b)).max()))
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=5e-5)


def test_means_gradient_matches_dense():
    means, cov, active, args = setup(n=40)
    mask = neighbor_mask(means, cov)
    radii = radii_of(cov)

    def loss_dense(means_):
        out = aggregate_neighbors(args["features"], args["transform"],
                                  args["queries"], args["keys"],
                                  args["frequencies"],
                                  args["distance_transform"],
                                  means=means_, mask=mask)
        return jnp.sum(out ** 2)

    def loss_fused(means_):
        out = aggregate_neighbors_pallas(args["features"], args["transform"],
                                         args["queries"], args["keys"],
                                         args["frequencies"],
                                         args["distance_transform"],
                                         means_, radii)
        return jnp.sum(out ** 2)

    g_dense = jax.grad(loss_dense)(means)
    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(loss_fused)(means)
    scale = max(1.0, float(np.abs(np.asarray(g_dense)).max()))
    np.testing.assert_allclose(np.asarray(g_fused) / scale,
                               np.asarray(g_dense) / scale, atol=1e-4)
