"""Model layer: initial states, forward step, losses, adaptive split."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pigs_tpu.models.model import (ModelConfig, adaptive_split, compute_loss,
                                   forward_step, make_initial_state,
                                   make_network, randomize_state, sample_fields)
from pigs_tpu.models.state import active_count
from pigs_tpu.pde import IntegrationRule, Problem
from pigs_tpu.train.pn import TrainConfig, init_training


def small_cfg(problem=Problem.BURGERS, capacity=160):
    return ModelConfig.create(problem, IntegrationRule.TRAPEZOID, nx=6, ny=6,
                              d=2, scale=1.0, capacity=capacity,
                              dtype=jnp.float32)


def test_initial_state_burgers_layout():
    cfg = small_cfg()
    st = make_initial_state(cfg)
    # 100 boundary Gaussians on the four walls (model_pn.py:405-421) + 6x6 grid.
    assert int(np.asarray(st.boundary).sum()) == 100
    assert int(active_count(st)) == 136
    bmeans = np.asarray(st.means)[:100]
    assert (np.abs(bmeans).max(axis=1) >= 1.0 - 1e-6).all()


def test_initial_state_test_problem():
    cfg = small_cfg(Problem.TEST, capacity=80)
    st = make_initial_state(cfg)
    assert int(np.asarray(st.boundary).sum()) == 50
    assert int(active_count(st)) == 56
    interior_u = np.asarray(st.u)[np.asarray(st.interior)]
    np.testing.assert_allclose(interior_u, 1.0)


def test_randomize_preserves_boundary():
    cfg = small_cfg()
    st0 = make_initial_state(cfg)
    st = randomize_state(cfg, jax.random.PRNGKey(0), n=6)
    b = np.asarray(st.boundary)
    np.testing.assert_allclose(np.asarray(st.means)[b],
                               np.asarray(st0.means)[b])
    # Interior means moved.
    i0 = np.asarray(st0.interior)
    assert not np.allclose(np.asarray(st.means)[i0],
                           np.asarray(st0.means)[i0])


@pytest.fixture(scope="module")
def trained_setup():
    cfg = small_cfg()
    network, params, opt, opt_state = init_training(cfg, TrainConfig(seed=0))
    state = make_initial_state(cfg)
    return cfg, network, params, state


def test_forward_step_updates_interior_only(trained_setup):
    cfg, network, params, state = trained_setup
    new_state, deltas = forward_step(cfg, network, params, state)
    b = np.asarray(state.boundary)
    np.testing.assert_allclose(np.asarray(new_state.means)[b],
                               np.asarray(state.means)[b])
    np.testing.assert_allclose(np.asarray(new_state.u)[b],
                               np.asarray(state.u)[b])
    i = np.asarray(state.interior)
    assert np.isfinite(np.asarray(deltas.dmeans)).all()
    assert not np.allclose(np.asarray(new_state.means)[i],
                           np.asarray(state.means)[i])
    # Inactive slots unchanged.
    free = ~np.asarray(state.active)
    np.testing.assert_allclose(np.asarray(new_state.means)[free],
                               np.asarray(state.means)[free])


def test_loss_finite_and_positive(trained_setup):
    cfg, network, params, state = trained_setup
    key = jax.random.PRNGKey(1)
    samples = (jax.random.uniform(key, (64, 2)) * 2.0 - 1.0).astype(jnp.float32)
    bc = jnp.zeros((64, 2), jnp.float32)
    ts = jax.random.uniform(key, (64,)).astype(jnp.float32)
    prev = sample_fields(cfg, state, samples, bc)
    new_state, deltas = forward_step(cfg, network, params, state)
    curr = sample_fields(cfg, new_state, samples, bc)
    losses = compute_loss(cfg, new_state, deltas, prev, curr, samples, ts,
                          t=0.0, dt=1.0)
    for name, val in losses._asdict().items():
        assert np.isfinite(float(val)), name
    assert float(losses.pde) >= 0
    assert float(losses.conservation) > 0


def test_gradients_flow_to_params(trained_setup):
    cfg, network, params, state = trained_setup
    key = jax.random.PRNGKey(2)
    samples = (jax.random.uniform(key, (32, 2)) * 2.0 - 1.0).astype(jnp.float32)
    bc = jnp.zeros((32, 2), jnp.float32)
    ts = jax.random.uniform(key, (32,)).astype(jnp.float32)
    prev = sample_fields(cfg, state, samples, bc)

    def loss_fn(p):
        new_state, deltas = forward_step(cfg, network, p, state)
        curr = sample_fields(cfg, new_state, samples, bc)
        return compute_loss(cfg, new_state, deltas, prev, curr, samples, ts,
                            t=0.0, dt=1.0).total

    grads = jax.grad(loss_fn)(params)
    norms = jax.tree_util.tree_map(lambda g: float(jnp.sum(g ** 2)), grads)
    total = sum(jax.tree_util.tree_leaves(norms))
    assert np.isfinite(total) and total > 0


def test_adaptive_split_runs(trained_setup):
    cfg, network, params, state = trained_setup
    new_state, _ = forward_step(cfg, network, params, state)
    split_state = adaptive_split(cfg, new_state, state)
    assert np.isfinite(np.asarray(split_state.means)).all()
    # Count can only stay or grow (prune removes |u|<0.01 interior though).
    assert int(active_count(split_state)) <= cfg.capacity


def test_navier_stokes_step():
    cfg = small_cfg(Problem.NAVIER_STOKES, capacity=64)
    network, params, opt, opt_state = init_training(cfg, TrainConfig(seed=0))
    state = make_initial_state(cfg)
    # Give NS a nonzero field so vorticity paths are exercised.
    state = state._replace(u=state.u + 0.1)
    new_state, deltas = forward_step(cfg, network, params, state)
    assert np.isfinite(np.asarray(new_state.u)).all()
    # Means stay in the fundamental domain (periodic wrap).
    i = np.asarray(new_state.interior)
    assert (np.abs(np.asarray(new_state.means)[i]) <= 1.0 + 1e-6).all()


def test_grid_state_dynamic_matches_static():
    """grid_state_dynamic (traced n) must reproduce make_initial_state's
    active rows exactly for every n in the randomization range."""
    from pigs_tpu.models.model import grid_state_dynamic, make_initial_state

    for problem in (Problem.BURGERS, Problem.WAVE):
        cfg = ModelConfig.create(problem, IntegrationRule.TRAPEZOID,
                                 nx=6, ny=6, d=2, scale=1.0, capacity=300)
        for n in (5, 9, 13):
            dyn = grid_state_dynamic(cfg, jnp.asarray(n), n_max=13)
            stat = make_initial_state(cfg, n=n)
            assert int(dyn.active.sum()) == int(stat.active.sum())
            # Active rows agree field-by-field (same ordering: boundary
            # first, then the row-major grid).
            for f in ("means", "scaling", "transforms", "u"):
                a = np.asarray(getattr(dyn, f))[np.asarray(dyn.active)]
                b = np.asarray(getattr(stat, f))[np.asarray(stat.active)]
                np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7,
                                           err_msg=f"{problem} n={n} {f}")


def test_width_mult_scales_parameters():
    """width_mult=1 keeps the exact reference layer sizes; width_mult=2
    doubles every hidden width (EMBEDDING stays fixed) and still produces
    finite, mask-gated deltas."""
    from pigs_tpu.models.model import (ModelConfig, forward_step,
                                       make_initial_state, make_network)
    from pigs_tpu.pde import IntegrationRule, Problem
    from pigs_tpu.train.pn import TrainConfig, init_training

    cfgs = {}
    for m in (1, 2):
        cfg = ModelConfig.create(Problem.BURGERS, IntegrationRule.TRAPEZOID,
                                 nx=6, ny=6, capacity=256, width_mult=m)
        network, params, _, _ = init_training(cfg, TrainConfig(n_epochs=1))
        counts = sum(x.size for x in jax.tree_util.tree_leaves(params))
        cfgs[m] = (cfg, network, params, counts)

    _, _, p1, n1 = cfgs[1]
    _, _, p2, n2 = cfgs[2]
    # Reference sizes at m=1: input_projection ends at LATENT=16.
    kernel = p1["params"]["input_projection"]["Dense_3"]["kernel"]
    assert kernel.shape[-1] == 16
    kernel2 = p2["params"]["input_projection"]["Dense_3"]["kernel"]
    assert kernel2.shape[-1] == 32
    assert n2 > 2 * n1  # hidden-hidden matmuls quadruple; IO layers double

    cfg, network, params, _ = cfgs[2]
    state = make_initial_state(cfg)
    new_state, deltas = forward_step(cfg, network, params, state)
    for leaf in jax.tree_util.tree_leaves(deltas):
        assert np.isfinite(np.asarray(leaf)).all()
    # inactive slots stay gated to zero
    inactive = ~np.asarray(state.active)
    assert np.abs(np.asarray(deltas.dmeans)[inactive]).max() == 0.0


def test_peak_vorticity_contribution_closed_form():
    """The closed-form peak |curl| of a single Gaussian velocity term must
    match a brute-force grid maximization of |curl(u g(x))|."""
    from pigs_tpu.models.model import peak_vorticity_contribution

    rng = np.random.default_rng(0)
    for _ in range(5):
        M = rng.normal(size=(2, 2))
        An = M @ M.T + 2.0 * np.eye(2)        # PD conic, O(1) eigenvalues
        u = rng.normal(size=(1, 2))
        p = float(peak_vorticity_contribution(jnp.asarray(An)[None],
                                              jnp.asarray(u))[0])

        # Brute force on a fine grid centered at the mean.
        lin = np.linspace(-3.0, 3.0, 1201)
        X, Y = np.meshgrid(lin, lin, indexing="ij")
        pts = np.stack([X.ravel(), Y.ravel()], -1)       # (M, 2)
        g = np.exp(-0.5 * np.einsum("mi,ij,mj->m", pts, An, pts))
        # curl(u g) = (u_y d/dx - u_x d/dy) g = -(c^T A x) g, c=(u_y,-u_x)
        c = np.array([u[0, 1], -u[0, 0]])
        w = -(pts @ An @ c) * g
        p_grid = np.abs(w).max()
        np.testing.assert_allclose(p, p_grid, rtol=2e-3)


def test_adaptive_split_vorticity_criteria():
    """NS-native criteria: runs under jit with static shapes, prunes the
    low-vorticity-contribution Gaussian, and splits high-dw/dt ones."""
    from functools import partial

    cfg = small_cfg(Problem.NAVIER_STOKES, capacity=128)
    cfg = cfg._replace(split_criteria="vorticity")
    network, params, opt, opt_state = init_training(cfg, TrainConfig(seed=0))
    state = make_initial_state(cfg)
    # Nonzero rotational field; make one interior Gaussian's velocity tiny so
    # its peak vorticity contribution is < 1% of the strongest.
    key = jax.random.PRNGKey(3)
    u = 0.5 * jax.random.normal(key, state.u.shape, state.u.dtype)
    idx = int(np.flatnonzero(np.asarray(state.interior))[0])
    u = u.at[idx].set(1e-5)
    state = state._replace(u=u * state.active[:, None])
    new_state, _ = forward_step(cfg, network, params, state)

    split_state = jax.jit(partial(adaptive_split, cfg))(new_state, state)
    assert np.isfinite(np.asarray(split_state.means)).all()
    assert int(active_count(split_state)) <= cfg.capacity
    # Shapes stay padded/static.
    assert split_state.means.shape == state.means.shape

    # The reference value criteria and the vorticity criteria disagree on
    # SOMETHING for a generic rotational field (different prune/split sets).
    cfg_val = cfg._replace(split_criteria="value")
    split_val = jax.jit(partial(adaptive_split, cfg_val))(new_state, state)
    assert (int(active_count(split_state)) != int(active_count(split_val))
            or not np.allclose(np.asarray(split_state.means),
                               np.asarray(split_val.means)))


def test_adaptive_split_vorticity_rejects_scalar_problems():
    cfg = small_cfg(Problem.BURGERS)._replace(split_criteria="vorticity")
    network, params, opt, opt_state = init_training(cfg, TrainConfig(seed=0))
    state = make_initial_state(cfg)
    new_state, _ = forward_step(cfg, network, params, state)
    with pytest.raises(ValueError, match="vorticity"):
        adaptive_split(cfg, new_state, state)


def test_wave_psi_scale_basis_change():
    """The (phi, psi/s) basis is an exact change of variables: with
    u_scaled = diag(1, 1/s) u, rhs_scaled(u_scaled) = diag(1, 1/s) rhs(u)."""
    from pigs_tpu.pde import PDECoefficients, pde_rhs

    rng = np.random.default_rng(1)
    m, d, c = 7, 2, 2
    samples = jnp.asarray(rng.normal(size=(m, d)))
    u = jnp.asarray(rng.normal(size=(m, c)))
    ux = jnp.asarray(rng.normal(size=(m, d, c)))
    uxx = jnp.asarray(rng.normal(size=(m, d, d, c)))
    s = 30.0
    T = jnp.asarray([1.0, 1.0 / s])

    rhs_ref = pde_rhs(Problem.WAVE, PDECoefficients(), samples, u, ux, uxx)
    rhs_scaled = pde_rhs(Problem.WAVE, PDECoefficients(wave_psi_scale=s),
                         samples, u * T, ux * T, uxx * T)
    np.testing.assert_allclose(np.asarray(rhs_scaled),
                               np.asarray(rhs_ref * T), rtol=1e-12)


def test_wave_psi_scale_initial_state():
    """s scales only the stored psi channel of the IC bump; s=1.0 is
    bit-identical to the reference IC."""
    cfg1 = small_cfg(Problem.WAVE, capacity=160)
    cfgs = cfg1._replace(coeff=cfg1.coeff._replace(wave_psi_scale=30.0))
    st1 = make_initial_state(cfg1)
    sts = make_initial_state(cfgs)
    u1, us = np.asarray(st1.u), np.asarray(sts.u)
    np.testing.assert_array_equal(u1[:, 0], us[:, 0])
    np.testing.assert_allclose(us[:, 1], u1[:, 1] / 30.0, rtol=1e-6)

    # Dynamic grid path agrees with the static path under scaling too.
    from pigs_tpu.models.model import grid_state_dynamic
    dyn = grid_state_dynamic(cfgs, jnp.asarray(6), n_max=6)
    a = np.asarray(dyn.u)[np.asarray(dyn.active)]
    b = us[np.asarray(sts.active)]
    np.testing.assert_allclose(a, b, rtol=1e-6)
