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

__all__ = ["solve_fd_1d", "solve_fd_2d", "solve_ns_2d", "random_vorticity"]


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


# --------------------------------------------------------------------------
# 2D incompressible Navier-Stokes, vorticity form, periodic pseudo-spectral.
# Ground truth for the NS problem the PN model trains on
# (model_pn.py:630-632: w_t = nu lap(w) - u . grad(w), unforced) — the
# in-tree stand-in for the external FNO dataset ns_V1e-3_N50_T50.npy
# (main_pn.py:36-49).


def _ns_wavenumbers(res: int, period: float):
    k = 2.0 * jnp.pi * jnp.fft.fftfreq(res, d=period / res)
    kx = k[:, None]
    ky = k[None, :]
    k2 = kx * kx + ky * ky
    inv_k2 = jnp.where(k2 == 0.0, 0.0, 1.0 / jnp.where(k2 == 0.0, 1.0, k2))
    # 2/3-rule dealiasing mask for the quadratic advection term.
    kmax = jnp.max(jnp.abs(k))
    dealias = (jnp.abs(kx) <= (2.0 / 3.0) * kmax) & \
              (jnp.abs(ky) <= (2.0 / 3.0) * kmax)
    return kx, ky, k2, inv_k2, dealias


@partial(jax.jit, static_argnames=("steps", "substeps", "res_out"))
def solve_ns_2d(w0: jax.Array, scale: float, dt: float, steps: int,
                nu: float = 1e-3, substeps: int = 20,
                res_out: int | None = None) -> jax.Array:
    """Pseudo-spectral solve of ``w_t = nu lap(w) - u . grad(w)`` on the
    period-``2*scale`` torus (the model's NS domain, model.py period=2.0).

    ``w0``: (res, res) vorticity with axis 0 = x, axis 1 = y ascending.
    Velocity from the stream function ``lap(psi) = -w``,
    ``u = (psi_y, -psi_x)`` — the convention matching the model's
    ``w = d(u_y)/dx - d(u_x)/dy`` (model_pn.py:653-659).  RK4 with integrating
    factor for the viscous term; 2/3-rule dealiased advection.  Returns
    ``(steps+1, res, res)`` including the initial frame.
    """
    res = w0.shape[0]
    period = 2.0 * scale
    kx, ky, k2, inv_k2, dealias = _ns_wavenumbers(res, period)
    dt_in = dt / substeps

    def advection_hat(w_hat):
        psi_hat = w_hat * inv_k2          # lap(psi) = -w  =>  psi_hat = w/k2
        ux = jnp.fft.ifft2(1j * ky * psi_hat).real
        uy = jnp.fft.ifft2(-1j * kx * psi_hat).real
        wx = jnp.fft.ifft2(1j * kx * w_hat).real
        wy = jnp.fft.ifft2(1j * ky * w_hat).real
        return -jnp.fft.fft2(ux * wx + uy * wy) * dealias

    # Integrating factor e^{-nu k^2 t} handles viscosity exactly; RK4 on the
    # advection term in the transformed variable.
    e_half = jnp.exp(-nu * k2 * dt_in * 0.5)
    e_full = e_half * e_half

    def rk4(w_hat, _):
        k1 = advection_hat(w_hat)
        k2_ = advection_hat(e_half * (w_hat + 0.5 * dt_in * k1))
        k3 = advection_hat(e_half * w_hat + 0.5 * dt_in * k2_)
        k4 = advection_hat(e_full * w_hat + dt_in * e_half * k3)
        w_hat = (e_full * w_hat
                 + dt_in / 6.0 * (e_full * k1 + 2.0 * e_half * (k2_ + k3)
                                  + k4))
        return w_hat, None

    def outer(w_hat, _):
        w_hat, _ = jax.lax.scan(rk4, w_hat, None, length=substeps)
        return w_hat, jnp.fft.ifft2(w_hat).real

    w_hat0 = jnp.fft.fft2(jnp.asarray(w0))
    _, traj = jax.lax.scan(outer, w_hat0, None, length=steps)
    out = jnp.concatenate([jnp.asarray(w0)[None].astype(traj.dtype), traj],
                          axis=0)
    if res_out is not None and res_out != res:
        # Spectrally-exact downsampling: truncate to the coarse grid's modes
        # then inverse-transform (a plain stride would alias the dealiased
        # band k in (res_out/2, res/3] back onto low wavenumbers).
        if not 0 < res_out < res:
            raise ValueError(f"res_out {res_out} must be in (0, {res})")
        if res_out % 2:
            # [:h] + [-h:] below keeps 2h rows; an odd res_out would silently
            # produce a (res_out-1)-size grid (the Nyquist row has no
            # unambiguous coarse-grid counterpart).
            raise ValueError(f"res_out must be even, got {res_out}")
        h = res_out // 2
        hat = jnp.fft.fft2(out) * (res_out / res) ** 2
        rows = jnp.concatenate([hat[:, :h], hat[:, -h:]], axis=1)
        coarse = jnp.concatenate([rows[:, :, :h], rows[:, :, -h:]], axis=2)
        out = jnp.fft.ifft2(coarse).real
    return out


def random_vorticity(key: jax.Array, res: int, scale: float = 1.0,
                     peak_k: float = 3.0, amplitude: float = 1.0) -> jax.Array:
    """Random smooth initial vorticity: a Gaussian random field with spectrum
    ``exp(-(|k|/k0 - 1)^2)`` band-centered at ``peak_k`` domain wavenumbers —
    the role of the FNO generator's Gaussian-measure ICs.  Zero-mean (no
    k=0 component), normalized to unit max-abs times ``amplitude``."""
    period = 2.0 * scale
    k = 2.0 * jnp.pi * jnp.fft.fftfreq(res, d=period / res)
    k2 = k[:, None] ** 2 + k[None, :] ** 2
    k0 = 2.0 * jnp.pi * peak_k / period
    spectrum = jnp.exp(-((jnp.sqrt(k2) / k0) - 1.0) ** 2 * 4.0)
    spectrum = spectrum.at[0, 0].set(0.0)
    noise = jax.random.normal(key, (res, res))
    w = jnp.fft.ifft2(jnp.fft.fft2(noise) * spectrum).real
    return amplitude * w / jnp.max(jnp.abs(w))
