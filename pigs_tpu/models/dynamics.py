"""PointNet-style dynamics network predicting per-timestep Gaussian deltas.

Flax re-design of the reference's model layer (model_pn.py:44-299): the same
architecture — a learned global canonical transform (``InputTransform`` built from a
PointNet ``LatentTransform`` encoder + per-quantity ``TransformNet`` heads), a
per-Gaussian input projection, multi-head attention-based neighbor aggregation, and
a delta head emitting (dmeans, dscaling, dtransforms, du) — expressed functionally
over padded per-Gaussian buffers with an active mask (masked mean-pool replaces the
variable-length mean over Gaussians at model_pn.py:114).

Sizes (model_pn.py:44-49): LATENT=16, L1=16, L2=32, L3=48, EMBEDDING=25, heads=2.
Activation is Tanh (model_pn.py:425-426).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pigs_tpu.ops.aggregate import aggregate_neighbors_factored

__all__ = ["DynamicsNetwork", "Deltas", "WaveAct", "RBFAct", "LATENT_SIZE",
           "ATTENTION_HEADS", "EMBEDDING_SIZE"]

LATENT_SIZE = 16
L1_SIZE = 16
L2_SIZE = 32
L3_SIZE = 48
EMBEDDING_SIZE = 25
ATTENTION_HEADS = 2


class Deltas(NamedTuple):
    dmeans: jax.Array       # (N, d)
    dscaling: jax.Array     # (N, d)
    dtransforms: jax.Array  # (N, T)
    du: jax.Array           # (N, c)
    # Per-head magnitude of the aggregated features, for the attention-magnitude
    # loss (model_pn.py:892-901).
    head_magnitudes: jax.Array  # (heads,)


class WaveAct(nn.Module):
    """Learned sin+cos activation (model_pn.py:26-33; unused by the default
    Model, which hardcodes Tanh at model_pn.py:425-426, but part of the API)."""

    @nn.compact
    def __call__(self, x):
        w1 = self.param("w1", nn.initializers.ones, (1,))
        w2 = self.param("w2", nn.initializers.ones, (1,))
        return w1 * jnp.sin(x) + w2 * jnp.cos(x)


class RBFAct(nn.Module):
    """Gaussian radial activation (model_pn.py:35-42)."""

    in_dim: int

    @nn.compact
    def __call__(self, x):
        b = self.param("b", nn.initializers.ones, (1,))
        c = self.param("c", nn.initializers.zeros, (self.in_dim,))
        return jnp.exp(-b * (x - c) ** 2)


class MLP(nn.Module):
    """Dense stack with Tanh between layers (none after the last)."""

    features: Sequence[int]

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Dense(f)(x)
            if i < len(self.features) - 1:
                x = jnp.tanh(x)
        return x


class LatentTransform(nn.Module):
    """Per-Gaussian encoder; Conv1d-1x1 stacks are per-point Dense layers
    (model_pn.py:51-68).  Tanh after every layer, including the last."""

    @nn.compact
    def __call__(self, x):  # (N, in)
        x = jnp.tanh(nn.Dense(L1_SIZE)(x))
        x = jnp.tanh(nn.Dense(L2_SIZE)(x))
        x = jnp.tanh(nn.Dense(LATENT_SIZE)(x))
        return x  # (N, LATENT_SIZE)


class TransformNet(nn.Module):
    """Global latent -> near-identity (k, k) transform, I + A
    (model_pn.py:70-86)."""

    k: int

    @nn.compact
    def __call__(self, latent):  # (LATENT,)
        a = MLP([L3_SIZE, L2_SIZE, self.k * self.k])(latent)
        return jnp.eye(self.k, dtype=latent.dtype) + a.reshape(self.k, self.k)


class InputTransform(nn.Module):
    """Learned canonical transforms applied to all per-Gaussian quantities
    (model_pn.py:88-152)."""

    c: int
    d: int
    pde_size: int

    def setup(self):
        self.latent_net = LatentTransform()
        self.transform_net = TransformNet(self.d)
        self.transform_u_net = TransformNet(self.c)
        self.transform_ux_net = TransformNet(self.d * self.c)
        self.transform_uxx_net = TransformNet(self.d * self.c)
        self.transform_pde_net = TransformNet(self.pde_size)

    def __call__(self, means, full_cov, u, boundaries, sample_u, sample_ux,
                 sample_uxx, sample_pde, active):
        n = means.shape[0]
        cov_flat = full_cov.reshape(n, self.d * self.d)
        params = jnp.concatenate(
            [means, cov_flat, u, boundaries[:, None].astype(u.dtype),
             sample_u, sample_ux, sample_uxx, sample_pde], axis=-1)
        per_gaussian = self.latent_net(params)            # (N, LATENT)
        # Masked mean-pool over *active* Gaussians (replaces .mean(-1) over a
        # variable-length axis, model_pn.py:114).
        w = active.astype(per_gaussian.dtype)[:, None]
        latent = jnp.sum(per_gaussian * w, axis=0) / jnp.maximum(jnp.sum(w), 1.0)

        t = self.transform_net(latent)          # (d, d)
        t_u = self.transform_u_net(latent)      # (c, c)
        t_ux = self.transform_ux_net(latent)    # (dc, dc)
        t_uxx = self.transform_uxx_net(latent)  # (dc, dc)
        t_pde = self.transform_pde_net(latent)  # (p, p)

        return (
            means @ t.T,
            jnp.einsum("ab,nbc->nac", t, full_cov).reshape(n, -1),
            u @ t_u.T,
            sample_u @ t_u.T,
            sample_ux @ t_ux.T,
            sample_uxx @ t_uxx.T,
            sample_pde @ t_pde.T,
        )


class DynamicsNetwork(nn.Module):
    """Full delta-prediction network (model_pn.py:176-278).

    Inputs are padded ``(N, ...)`` per-Gaussian quantities plus an ``(N,)`` active
    mask and an ``(N, N)`` neighbor mask; output deltas are zero on inactive slots.
    """

    c: int
    d: int
    pde_size: int
    width_mult: int = 1   # scales every hidden width (1 = reference sizes;
                          # EMBEDDING_SIZE is positional and stays fixed)

    @nn.compact
    def __call__(self, means, full_cov, u, boundaries, sample_u, sample_ux,
                 sample_uxx, sample_pde, active, nbr_mask,
                 period: Optional[float] = None) -> Deltas:
        n, d = means.shape
        transform_size = d * (d - 1) // 2
        dtype = means.dtype
        m = self.width_mult
        LATENT, L1, L2, L3 = (LATENT_SIZE * m, L1_SIZE * m, L2_SIZE * m,
                              L3_SIZE * m)

        _, t_cov, t_u, t_sample_u, t_ux, t_uxx, t_pde = InputTransform(
            self.c, self.d, self.pde_size)(
                means, full_cov, u, boundaries, sample_u, sample_ux,
                sample_uxx, sample_pde, active)

        t_params = jnp.concatenate(
            [t_cov, t_u, boundaries[:, None].astype(dtype), t_sample_u,
             t_ux, t_uxx, t_pde], axis=-1)

        features = MLP([L1, L2, L3, LATENT],
                       name="input_projection")(t_params)  # (N, LATENT)

        # Fixed random sinusoidal frequencies (model_pn.py:227-230,
        # requires_grad=False): deterministic constants, not parameters.
        freq_size = (EMBEDDING_SIZE - 1) // d // 2
        frequencies = (jax.random.normal(
            jax.random.PRNGKey(42), (freq_size,)) * 10.0).astype(dtype)

        mid = (LATENT + L1) // 2
        all_features = [features]
        magnitudes = []
        for h in range(ATTENTION_HEADS):
            transform = self.param(
                f"transform_{h}", nn.initializers.uniform(scale=2.0),
                (LATENT, LATENT))
            transform = transform - 1.0  # U[-1, 1) like torch.rand*2-1
            distance_transform = self.param(
                f"distance_transform_{h}", nn.initializers.uniform(scale=2.0),
                (LATENT, EMBEDDING_SIZE * 2))
            distance_transform = distance_transform - 1.0
            queries = MLP([LATENT, LATENT, mid, L1],
                          name=f"query_{h}")(features)
            keys = MLP([LATENT, LATENT, mid, L1],
                       name=f"key_{h}")(features)
            # The factored (angle-addition) formulation is the fastest path on
            # every backend — all-matmul, no per-pair transcendentals — and
            # exactly matches the dense semantics (tests/test_aggregate.py).
            agg = aggregate_neighbors_factored(
                features, transform.astype(dtype), queries, keys,
                frequencies, distance_transform.astype(dtype),
                means=means, mask=nbr_mask, period=period)
            magnitudes.append(jnp.mean(agg ** 2))
            all_features.append(agg)

        local_global = jnp.concatenate(all_features, axis=-1)

        l = ATTENTION_HEADS // 2 + 1
        out_size = d + d + transform_size + self.c
        deltas = MLP([l * LATENT, LATENT, LATENT, L3,
                      L2, out_size], name="delta_net")(local_global)

        gate = active.astype(dtype)[:, None]
        dmeans = deltas[:, :d] * gate
        dscaling = deltas[:, d:2 * d] * gate
        dtransforms = deltas[:, 2 * d:2 * d + transform_size] * gate
        du = deltas[:, 2 * d + transform_size:] * gate
        return Deltas(dmeans, dscaling, dtransforms, du,
                      jnp.stack(magnitudes))
