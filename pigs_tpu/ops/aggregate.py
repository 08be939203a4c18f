"""Attention-based neighbor aggregation over Gaussian primitives.

TPU-native redesign of the reference's ``preprocess_aggregate`` /
``aggregate_neighbors`` CUDA methods (call sites: model_pn.py:253-264,
test_neighbor_aggregation.py:89-98; contract reconstructed in SURVEY.md §2.1).  The
CUDA extension builds an irregular neighbor list of overlapping Gaussians; on TPU
the same computation is a dense masked attention over all pairs — static shapes,
VPU/MXU-friendly — with the neighborhood expressed as a boolean mask derived from a
Gaussian-overlap radius test.

Semantics (per Gaussian i over neighbors j):

  pe(r)    in R^E   : sinusoidal embedding of the displacement r = mu_j - mu_i,
                      [1, sin(f_k r_a), cos(f_k r_a)]  (E = 1 + 2*F*d)
  emb(r)   in R^2E  : [pe(r), pe(2r)] — two frequency octaves
  logits_ij         = <q_i, k_j> / sqrt(K)
  alpha_ij          = masked softmax_j(logits_ij)        (i's overlapping neighbors)
  msg_ij   in R^L   = (W_t f_j) * (W_d emb(r_ij))        (feature map gated by a
                                                          learned distance filter)
  out_i    in R^L   = sum_j alpha_ij msg_ij

Differentiable w.r.t. all six tensor inputs (features, transform, queries, keys,
frequencies, distance_transform) — the property the reference verifies with its one
active float64 gradcheck (test_neighbor_aggregation.py:89-98); ours is verified with
``jax.test_util.check_grads`` in tests/test_aggregate.py.  Shape contract matches
the reference: features (n, L), transform (L, L), queries/keys (n, K),
frequencies (F,), distance_transform (L, 2E), output (n, L).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["positional_embedding", "neighbor_mask", "aggregate_neighbors"]


def positional_embedding(rel: jax.Array, frequencies: jax.Array) -> jax.Array:
    """Sinusoidal embedding of displacements: ``(..., d) -> (..., 1 + 2*F*d)``."""
    phases = rel[..., None, :] * frequencies[..., :, None]  # (..., F, d)
    flat = phases.reshape(*phases.shape[:-2], -1)           # (..., F*d)
    const = jnp.ones((*rel.shape[:-1], 1), dtype=rel.dtype)
    return jnp.concatenate([const, jnp.sin(flat), jnp.cos(flat)], axis=-1)


def neighbor_mask(
    means: jax.Array,
    covariances: jax.Array,
    active: Optional[jax.Array] = None,
    sigma_cut: float = 3.0,
    period: Optional[float] = None,
    include_self: bool = False,
) -> jax.Array:
    """Boolean ``(n, n)`` mask of overlapping Gaussian pairs.

    Pair (i, j) are neighbors when their centers are within
    ``sigma_cut * (r_i + r_j)`` where ``r = sqrt(max diag(Sigma))`` approximates the
    principal standard deviation — the dense-mask equivalent of the CUDA kernel's
    overlapping-pair neighbor structure (SURVEY.md §2.1 ``preprocess_aggregate``).
    """
    n, d = means.shape
    rel = means[None, :, :] - means[:, None, :]
    if period is not None:
        rel = rel - period * jnp.round(rel / period)
    dist = jnp.linalg.norm(rel, axis=-1)
    radius = jnp.sqrt(jnp.max(jnp.diagonal(covariances, axis1=-2, axis2=-1), axis=-1))
    cut = sigma_cut * (radius[:, None] + radius[None, :])
    mask = dist <= cut
    if not include_self:
        mask = mask & ~jnp.eye(n, dtype=bool)
    if active is not None:
        mask = mask & active[None, :] & active[:, None]
    return mask


@partial(jax.jit, static_argnames=("period",))
def aggregate_neighbors(
    features: jax.Array,
    transform: jax.Array,
    queries: jax.Array,
    keys: jax.Array,
    frequencies: jax.Array,
    distance_transform: jax.Array,
    means: jax.Array,
    mask: jax.Array,
    period: Optional[float] = None,
) -> jax.Array:
    """Aggregate neighbor features with distance-gated masked attention.

    Args:
      features: ``(n, L)`` per-Gaussian latent features.
      transform: ``(L, L)`` learned feature map applied to neighbor features.
      queries / keys: ``(n, K)`` attention projections.
      frequencies: ``(F,)`` sinusoidal embedding frequencies (fixed in the
        reference, model_pn.py:227-230, but differentiable here).
      distance_transform: ``(L, 2E)`` learned filter over the displacement
        embedding, ``E = 1 + 2*F*d``.
      means: ``(n, d)`` Gaussian centers (for relative displacements).
      mask: ``(n, n)`` boolean neighborhood from :func:`neighbor_mask`.
      period: optional torus period for displacement wrapping.

    Returns:
      ``(n, L)`` aggregated neighbor features.  Rows with no neighbors are zero.
    """
    n, L = features.shape
    K = queries.shape[-1]
    rel = means[None, :, :] - means[:, None, :]             # (n, n, d): mu_j - mu_i
    if period is not None:
        rel = rel - period * jnp.round(rel / period)

    pe1 = positional_embedding(rel, frequencies)            # (n, n, E)
    pe2 = positional_embedding(2.0 * rel, frequencies)      # (n, n, E)
    emb = jnp.concatenate([pe1, pe2], axis=-1)              # (n, n, 2E)

    logits = (queries @ keys.T) / jnp.sqrt(jnp.asarray(K, features.dtype))
    neg = jnp.asarray(jnp.finfo(features.dtype).min, features.dtype)
    logits = jnp.where(mask, logits, neg)
    # Masked softmax that yields exactly zero rows when a Gaussian has no neighbors.
    logits_max = jnp.max(logits, axis=-1, keepdims=True)
    unnorm = jnp.exp(logits - jax.lax.stop_gradient(logits_max)) * mask
    denom = jnp.sum(unnorm, axis=-1, keepdims=True)
    alpha = unnorm / jnp.maximum(denom, jnp.asarray(1e-30, features.dtype))

    mapped = features @ transform.T                         # (n, L): W_t f_j
    gate = jnp.einsum("ijE,lE->ijl", emb, distance_transform)  # (n, n, L)
    # out_i = sum_j alpha_ij * mapped_j * gate_ij
    return jnp.einsum("ij,jl,ijl->il", alpha, mapped, gate)
