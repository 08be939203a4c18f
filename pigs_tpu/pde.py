"""PDE right-hand-side registry and time-integration rules.

Functional port of the reference's per-problem physics (``Problem`` and
``IntegrationRule`` enums, model_pn.py:13-24; ``pde_rhs``, model_pn.py:612-642).
The reference's POISSON branch references an undefined ``t`` (model_pn.py:620-621,
a known defect listed in SURVEY.md §2.2); here the time is an explicit argument.

All functions are pure and shape-polymorphic over the leading sample axis, so they
jit/vmap/shard cleanly.
"""

from __future__ import annotations

import enum
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Problem", "IntegrationRule", "PDECoefficients", "pde_rhs", "pde_size",
           "channels"]


class Problem(enum.Enum):
    DIFFUSION = enum.auto()
    POISSON = enum.auto()
    BURGERS = enum.auto()
    WAVE = enum.auto()
    NAVIER_STOKES = enum.auto()
    TEST = enum.auto()


class IntegrationRule(enum.Enum):
    TRAPEZOID = enum.auto()
    FORWARD = enum.auto()
    BACKWARD = enum.auto()


class PDECoefficients(NamedTuple):
    """Physical constants per problem (model_pn.py:333-336)."""

    nu: float = 0.0
    wave_psi_scale: float = 1.0  # opt-in (phi, psi/s) basis for WAVE: the
                                 # state's channel 1 stores psi/s so both
                                 # channels stay O(bump amplitude) — the GT's
                                 # psi amplifies to omega*|phi| (omega =
                                 # sqrt(10)*k ~ 30 for the reference bump,
                                 # BENCHMARKS.md wave analysis).  1.0 =
                                 # reference semantics (raw psi).

    @staticmethod
    def default(problem: Problem) -> "PDECoefficients":
        if problem == Problem.BURGERS:
            return PDECoefficients(nu=1.0 / (10.0 * np.pi))
        if problem == Problem.NAVIER_STOKES:
            return PDECoefficients(nu=1e-3)
        return PDECoefficients()


def channels(problem: Problem) -> int:
    """Field channel count c per problem (model_pn.py:350-372)."""
    return 2 if problem in (Problem.WAVE, Problem.NAVIER_STOKES) else 1


def pde_size(problem: Problem) -> int:
    """Width of the PDE-residual feature fed to the dynamics net (model_pn.py:428-431)."""
    return 1 if problem == Problem.NAVIER_STOKES else channels(problem)


def pde_rhs(
    problem: Problem,
    coeff: PDECoefficients,
    samples: jax.Array,
    u: jax.Array,
    ux: jax.Array,
    uxx: jax.Array,
    wx: Optional[jax.Array] = None,
    wxx: Optional[jax.Array] = None,
    t: float = 0.0,
) -> jax.Array:
    """Spatial right-hand side of du/dt = rhs (model_pn.py:612-642).

    Shapes: ``u (m, c)``, ``ux (m, d, c)``, ``uxx (m, d, d, c)``; for
    Navier-Stokes, ``wx (m, d)`` and ``wxx (m, d, d)`` are the vorticity
    derivatives obtained from the 2nd/3rd field derivatives
    (``w = d(u_y)/dx - d(u_x)/dy``, model_pn.py:653-659).
    """
    if problem == Problem.DIFFUSION:
        return uxx[:, 0, 0] + uxx[:, 1, 1]

    if problem == Problem.BURGERS:
        return coeff.nu * (uxx[:, 0, 0] + uxx[:, 1, 1]) - u * ux[:, 0]

    if problem == Problem.POISSON:
        x = samples[..., 0]
        return (100.0 * t * jnp.sin(jnp.pi * (x + 1.0)))[:, None] - uxx[:, 0, 0]

    if problem == Problem.WAVE:
        # In the (phi, psi/s) basis (s = coeff.wave_psi_scale, 1.0 =
        # reference semantics): phi_t = psi = s*u1; (psi/s)_t =
        # (10*lap(phi) - 0.1*psi)/s = (10/s)*lap(phi) - 0.1*u1.
        s = coeff.wave_psi_scale
        return jnp.stack(
            (
                s * u[..., 1],
                (10.0 / s) * (uxx[..., 0, 0, 0] + uxx[..., 1, 1, 0])
                - 0.1 * u[..., 1],
            ),
            axis=-1,
        )

    if problem == Problem.NAVIER_STOKES:
        return (coeff.nu * (wxx[:, 0, 0] + wxx[:, 1, 1])
                - (u[:, 0] * wx[:, 0] + u[:, 1] * wx[:, 1]))

    if problem == Problem.TEST:
        return jnp.zeros_like(u)

    raise ValueError(f"Unexpected PDE problem: {problem}")


def time_integrate(rule: IntegrationRule, time_samples: jax.Array,
                   prev, curr):
    """Mix two consecutive sample sets per the integration rule.

    TRAPEZOID draws a random convex combination per collocation point
    (model_pn.py:794-815); FORWARD/BACKWARD pick an endpoint.  ``prev``/``curr``
    are pytrees of arrays with the sample axis leading.
    """
    if rule == IntegrationRule.FORWARD:
        return prev
    if rule == IntegrationRule.BACKWARD:
        return curr

    def mix(a, b):
        if a is None or b is None:
            return None
        ts = time_samples.reshape((-1,) + (1,) * (a.ndim - 1)).astype(a.dtype)
        return ts * b + (1.0 - ts) * a

    return jax.tree_util.tree_map(mix, prev, curr, is_leaf=lambda x: x is None)
