"""Collocation-point and image-grid samplers.

Functional equivalents of the reference's inline grid construction
(``torch.meshgrid`` blocks, e.g. model_pn.py:338-341, main_pn.py:102-121) and of
``region_kernel`` / ``sample_gaussians_img`` (gaussians.py:60-87).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["grid_samples", "image_samples", "region_kernel",
           "collocation_samples", "boundary_band_samples"]


def grid_samples(res: int, d: int, scale: float = 1.0,
                 dtype=jnp.float32) -> jax.Array:
    """Regular ``res^d`` grid over ``[-scale, scale]^d``, ``(res^d, d)``.

    Uses ``indexing="ij"`` like the Gaussian-placement grids (model_pn.py:338-341).
    """
    axes = [jnp.linspace(-1.0, 1.0, res, dtype=dtype) * scale for _ in range(d)]
    mesh = jnp.meshgrid(*axes, indexing="ij")
    return jnp.stack(mesh, axis=-1).reshape(-1, d)


def image_samples(res: int, scale: float = 1.0, dtype=jnp.float32) -> jax.Array:
    """Image-layout 2D grid (xy indexing, y flipped) matching the reference's
    render grids (gaussians.py:73-87, model_pn.py:909-914): ``(res*res, 2)``."""
    tx = jnp.linspace(-1.0, 1.0, res, dtype=dtype) * scale
    ty = jnp.flip(jnp.linspace(-1.0, 1.0, res, dtype=dtype)) * scale
    gx, gy = jnp.meshgrid(tx, ty, indexing="xy")
    return jnp.stack((gx, gy), axis=-1).reshape(res * res, 2)


def region_kernel(size: int, dx: float, d: int, dtype=jnp.float32) -> jax.Array:
    """Grid of offsets centered at zero: ``(size^d, d)`` (gaussians.py:60-66)."""
    half = (size - 1) / 2.0
    t = jnp.linspace(-half, half, size, dtype=dtype) * dx
    mesh = jnp.meshgrid(*[t] * d, indexing="xy")
    return jnp.stack(mesh, axis=-1).reshape(-1, d)


def collocation_samples(key: jax.Array, n: int, d: int,
                        scale: float = 1.0, dtype=jnp.float32) -> jax.Array:
    """Uniform random interior collocation points over ``[-scale, scale]^d``
    (main_pn.py:103)."""
    return (jax.random.uniform(key, (n, d), dtype=dtype) * 2.0 - 1.0) * scale


def boundary_band_samples(key: jax.Array, n: int, scale: float = 1.0,
                          dtype=jnp.float32) -> jax.Array:
    """Samples on the +-(1..1.5)*scale boundary band used for BC losses
    (main_pn.py:105-121).  2D only; returns ``(n, 2)``."""
    assert n % 4 == 0, "boundary_band_samples requires n divisible by 4"
    k1, k2, k3 = jax.random.split(key, 3)
    half = n // 2
    quarter = n // 4
    bands = jnp.concatenate([
        -jnp.ones(quarter, dtype) - jax.random.uniform(k1, (quarter,), dtype) * 0.5,
        jnp.ones(quarter, dtype) + jax.random.uniform(k2, (quarter,), dtype) * 0.5,
    ]) * scale  # (half,)
    tang = (jax.random.uniform(k3, (n,), dtype) * 2.0 - 1.0) * 1.5 * scale
    out = jnp.zeros((n, 2), dtype)
    out = out.at[half:, 0].set(tang[half:])
    out = out.at[half:, 1].set(bands)
    out = out.at[:half, 1].set(tang[:half])
    out = out.at[:half, 0].set(bands)
    return out
