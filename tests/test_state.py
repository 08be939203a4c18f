"""Padded mixture state: init, prune, split, and split mixture preservation."""

import jax
import jax.numpy as jnp
import numpy as np

from pigs_tpu import gaussians
from pigs_tpu.models.state import (MixtureState, active_count, compact_scatter,
                                   covariance_of, init_state, prune, split)
from pigs_tpu.ops.oracle import eval_mixture_dense


def simple_state(capacity=16, n=6, d=2, c=1, with_boundary=True):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    means = jax.random.uniform(ks[0], (n, d)) * 2.0 - 1.0
    scaling = jnp.exp(jax.random.normal(ks[1], (n, d)) * 0.2 - 3.0)
    transforms = jax.random.normal(ks[2], (n, d * (d - 1) // 2)) * 0.3
    u = jax.random.normal(ks[3], (n, c))
    if with_boundary:
        nb = 3
        bm = jnp.stack([jnp.full((nb,), -1.0), jnp.linspace(-1, 1, nb)], axis=-1)
        bs = jnp.full((nb, d), 0.01)
        bt = jnp.zeros((nb, d * (d - 1) // 2))
        bu = jnp.zeros((nb, c))
        return init_state(capacity, means, scaling, transforms, u, bm, bs, bt, bu)
    return init_state(capacity, means, scaling, transforms, u)


def test_init_layout():
    st = simple_state()
    assert st.capacity == 16
    assert int(active_count(st)) == 9
    assert bool(st.boundary[0]) and bool(st.boundary[2])
    assert not bool(st.boundary[3])
    assert bool(st.active[8]) and not bool(st.active[9])
    assert np.asarray(st.interior).sum() == 6
    # Padded scaling stays positive (finite conics).
    cov, con = covariance_of(st)
    assert np.isfinite(np.asarray(con)).all()


def test_prune_keeps_boundaries():
    st = simple_state()
    keep = jnp.zeros(st.capacity, bool)
    st2 = prune(st, keep)
    assert np.asarray(st2.active & st2.boundary).sum() == 3
    assert np.asarray(st2.interior).sum() == 0


def test_compact_scatter_assigns_free_slots():
    free = jnp.array([False, True, False, True, True, False])
    want = jnp.array([True, False, True, False, False, False])
    dest = compact_scatter(free, want)
    assert int(dest[0]) == 1
    assert int(dest[2]) == 3
    assert int(dest[1]) == 6 and int(dest[3]) == 6  # non-wants dropped


def test_split_increases_count_and_halves_values():
    st = simple_state()
    idx = jnp.zeros(st.capacity, bool).at[4].set(True)  # interior slot
    u_before = float(st.u[4, 0])
    st2 = split(st, idx)
    assert int(active_count(st2)) == int(active_count(st)) + 1
    # Parent slot value halved; a new active slot carries the same halved value.
    assert abs(float(st2.u[4, 0]) - 0.5 * u_before) < 1e-6
    new_slots = np.asarray(st2.active & ~st.active)
    assert new_slots.sum() == 1
    j = int(np.nonzero(new_slots)[0][0])
    assert abs(float(st2.u[j, 0]) - 0.5 * u_before) < 1e-6
    # Children displaced symmetrically about the parent.
    mid = 0.5 * (np.asarray(st2.means[4]) + np.asarray(st2.means[j]))
    np.testing.assert_allclose(mid, np.asarray(st.means[4]), atol=1e-6)


def test_split_ignores_boundary_and_inactive():
    st = simple_state()
    idx = jnp.zeros(st.capacity, bool).at[0].set(True).at[12].set(True)
    st2 = split(st, idx)
    assert int(active_count(st2)) == int(active_count(st))


def test_split_preserves_mixture_approximately():
    """The analog of test_split.py:59 — splitting a wide Gaussian into two
    displaced halves approximately preserves the summed field."""
    d = 1
    means = jnp.array([[0.0]])
    scaling = jnp.array([[0.25]])
    transforms = jnp.zeros((1, 0))
    u = jnp.array([[1.0]])
    st = init_state(4, means, scaling, transforms, u)
    samples = jnp.linspace(-3, 3, 200).reshape(-1, 1)

    def field(state):
        cov, con = covariance_of(state)
        return eval_mixture_dense(state.means, con, state.u, samples, order=0,
                                  mask=state.active).u

    before = field(st)
    # Displacement std/4 like the reference's preservation experiment
    # (test_split.py:43-46): std = 0.5, so split_scale * var = 0.125.
    st2 = split(st, jnp.array([True, False, False, False]), split_scale=0.5)
    after = field(st2)
    err = float(jnp.sum((before - after) ** 2)) / float(jnp.sum(before ** 2))
    assert err < 0.02, err


def test_split_capacity_overflow_drops_extra():
    st = simple_state(capacity=10, n=6)  # 9 active, 1 free
    idx = np.zeros(10, bool)
    idx[4] = idx[5] = True  # want 2 splits, only 1 free slot
    st2 = split(st, jnp.asarray(idx))
    assert int(active_count(st2)) == 10  # filled up, no error
