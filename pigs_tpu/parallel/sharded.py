"""Sharded Gaussian-mixture evaluation over a device mesh.

The all-pairs (samples x Gaussians) reduction shards along both axes
(SURVEY.md §5 "long-context" note): query points split over the ``data`` axis,
Gaussians split over the ``model`` axis.  Each device computes the partial sum of
its Gaussian shard at its sample shard; a single ``psum`` over the ``model`` axis
completes the mixture sum.  Gradients flow through ``shard_map`` + ``psum``
automatically (psum transposes to identity for replicated cotangents).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from pigs_tpu.ops.oracle import MixtureFields, eval_mixture_dense
from pigs_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

__all__ = ["eval_mixture_sharded"]


def eval_mixture_sharded(
    mesh: Mesh,
    means: jax.Array,
    conics: jax.Array,
    values: jax.Array,
    samples: jax.Array,
    order: int = 0,
    mask: Optional[jax.Array] = None,
    period: Optional[float] = None,
) -> MixtureFields:
    """Mixture evaluation with samples sharded over ``data`` and Gaussians over
    ``model``.  Array sizes must divide the respective mesh axis sizes.

    Returns fields sharded over the ``data`` axis (replicated over ``model``).
    """
    if mask is None:
        mask = jnp.ones(means.shape[0], bool)

    n_orders = order + 1

    def local(means, conics, values, mask, samples):
        out = eval_mixture_dense(means, conics, values, samples, order=order,
                                 mask=mask, period=period)
        partial_fields = tuple(f for f in out[:n_orders])
        return tuple(jax.lax.psum(f, MODEL_AXIS) for f in partial_fields)

    gauss_spec = P(MODEL_AXIS)
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(gauss_spec, gauss_spec, gauss_spec, gauss_spec, P(DATA_AXIS)),
        out_specs=tuple(P(DATA_AXIS) for _ in range(n_orders)),
    )
    fields = fn(means, conics, values, mask, samples)
    return MixtureFields(*(list(fields) + [None] * (4 - n_orders)))
