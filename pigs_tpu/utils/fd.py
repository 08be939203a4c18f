"""Finite-difference reference solvers for the supported PDEs.

Independent numerical ground truth for validating the Gaussian-mixture solvers,
playing the role of the reference's py-pde solves (test_numerical.py:27-39,
test_numerical_2d.py:43-54) — but in-tree, jittable, and runnable anywhere.

Explicit RK4 on a regular grid with second-order central differences; Dirichlet
(zero) or periodic boundaries.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["solve_fd_1d", "solve_fd_2d"]


def _dx1(u, h, periodic):
    if periodic:
        return (jnp.roll(u, -1, 0) - jnp.roll(u, 1, 0)) / (2 * h)
    du = jnp.zeros_like(u)
    du = du.at[1:-1].set((u[2:] - u[:-2]) / (2 * h))
    return du


def _dxx1(u, h, periodic):
    if periodic:
        return (jnp.roll(u, -1, 0) - 2 * u + jnp.roll(u, 1, 0)) / (h * h)
    du = jnp.zeros_like(u)
    du = du.at[1:-1].set((u[2:] - 2 * u[1:-1] + u[:-2]) / (h * h))
    return du


def _rhs_1d(problem: str, u, h, nu, periodic):
    if problem == "diffusion":
        return _dxx1(u, h, periodic)
    if problem == "burgers":
        return nu * _dxx1(u, h, periodic) - u * _dx1(u, h, periodic)
    if problem == "wave":
        # u = (phi, psi): phi_t = psi; psi_t = 10 lap(phi) - 0.1 psi
        phi, psi = u[..., 0], u[..., 1]
        return jnp.stack([psi, 10.0 * _dxx1(phi, h, periodic) - 0.1 * psi],
                         axis=-1)
    raise ValueError(problem)


@partial(jax.jit, static_argnames=("problem", "steps", "substeps", "periodic"))
def solve_fd_1d(u0: jax.Array, scale: float, dt: float, steps: int,
                problem: str = "burgers", nu: float = 0.00318,
                substeps: int = 200, periodic: bool = False) -> jax.Array:
    """Integrate ``steps`` outer steps of size ``dt`` (RK4, ``substeps`` inner
    steps each).  ``u0``: (res,) or (res, 2) for wave.  Returns
    ``(steps+1, ...)`` snapshots including the initial condition."""
    res = u0.shape[0]
    h = 2.0 * scale / (res - 1)
    dt_in = dt / substeps

    def rhs(u):
        return _rhs_1d(problem, u, h, nu, periodic)

    def rk4(u, _):
        k1 = rhs(u)
        k2 = rhs(u + 0.5 * dt_in * k1)
        k3 = rhs(u + 0.5 * dt_in * k2)
        k4 = rhs(u + dt_in * k3)
        u = u + dt_in / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
        if not periodic:
            if u.ndim == 1:
                u = u.at[0].set(0.0).at[-1].set(0.0)
            else:
                u = u.at[0].set(0.0).at[-1].set(0.0)
        return u, None

    def outer(u, _):
        u, _ = jax.lax.scan(rk4, u, None, length=substeps)
        return u, u

    _, traj = jax.lax.scan(outer, u0, None, length=steps)
    return jnp.concatenate([u0[None], traj], axis=0)


def _lap2(u, h, periodic):
    if periodic:
        return ((jnp.roll(u, -1, 0) - 2 * u + jnp.roll(u, 1, 0))
                + (jnp.roll(u, -1, 1) - 2 * u + jnp.roll(u, 1, 1))) / (h * h)
    du = jnp.zeros_like(u)
    interior = ((u[2:, 1:-1] - 2 * u[1:-1, 1:-1] + u[:-2, 1:-1])
                + (u[1:-1, 2:] - 2 * u[1:-1, 1:-1] + u[1:-1, :-2])) / (h * h)
    return du.at[1:-1, 1:-1].set(interior)


def _dx2(u, h, axis, periodic):
    if periodic:
        return (jnp.roll(u, -1, axis) - jnp.roll(u, 1, axis)) / (2 * h)
    du = jnp.zeros_like(u)
    sl = [slice(None)] * u.ndim
    sl_p = list(sl); sl_p[axis] = slice(2, None)
    sl_m = list(sl); sl_m[axis] = slice(None, -2)
    sl_c = list(sl); sl_c[axis] = slice(1, -1)
    return du.at[tuple(sl_c)].set(
        (u[tuple(sl_p)] - u[tuple(sl_m)]) / (2 * h))


@partial(jax.jit, static_argnames=("problem", "steps", "substeps", "periodic"))
def solve_fd_2d(u0: jax.Array, scale: float, dt: float, steps: int,
                problem: str = "burgers", nu: float = 0.0318,
                substeps: int = 400, periodic: bool = False) -> jax.Array:
    """2D analog of :func:`solve_fd_1d`.  ``u0``: (res, res) with axis 0 = x.

    Burgers here matches the reference's 2D scripts: advection along x only
    (``u_t = nu lap(u) - u u_x``, test_numerical_2d.py:43-45, test_no_mlp.py:142).
    """
    res = u0.shape[0]
    h = 2.0 * scale / (res - 1)
    dt_in = dt / substeps

    def rhs(u):
        if problem == "diffusion":
            return _lap2(u, h, periodic)
        if problem == "burgers":
            return nu * _lap2(u, h, periodic) - u * _dx2(u, h, 0, periodic)
        if problem == "wave":
            # u = (phi, psi): phi_t = psi; psi_t = 10 lap(phi) - 0.1 psi
            # (the 2D system of test_no_mlp.py:135-139 / model_pn.py:625-629).
            phi, psi = u[..., 0], u[..., 1]
            return jnp.stack(
                [psi, 10.0 * _lap2(phi, h, periodic) - 0.1 * psi], axis=-1)
        raise ValueError(problem)

    def rk4(u, _):
        k1 = rhs(u)
        k2 = rhs(u + 0.5 * dt_in * k1)
        k3 = rhs(u + 0.5 * dt_in * k2)
        k4 = rhs(u + dt_in * k3)
        u = u + dt_in / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
        if not periodic:
            u = u.at[0, :].set(0.0).at[-1, :].set(0.0)
            u = u.at[:, 0].set(0.0).at[:, -1].set(0.0)
        return u, None

    def outer(u, _):
        u, _ = jax.lax.scan(rk4, u, None, length=substeps)
        return u, u

    _, traj = jax.lax.scan(outer, u0, None, length=steps)
    return jnp.concatenate([u0[None], traj], axis=0)
