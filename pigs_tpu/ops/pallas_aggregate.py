"""Fused Pallas TPU kernel for attention-based neighbor aggregation.

STATUS — reference implementation, off the default path.  The factored
(angle-addition) formulation in ``pigs_tpu.ops.aggregate`` beats this kernel at
every measured scale, including post-split capacities with realistic sparse
masks (round-4 measurement, BENCHMARKS.md "Fused neighbor aggregation"):
at n=4096 (≈400 neighbors/Gaussian) factored fwd+bwd is 4.5 ms vs 10.5 ms for
this kernel's forward alone, and this kernel's backward fails to compile at
n≥4096 (VMEM).  ``DynamicsNetwork`` therefore hardcodes the factored path;
this kernel is kept as a tested second implementation of the same semantics
(useful as a cross-check and as the template for mask-sparse workloads where
an O(n·L)-traffic streaming kernel could win if the factored path's O(n·E·L)
matmuls ever dominate).

The dense path (``pigs_tpu.ops.aggregate``) materializes O(n^2 * 2E) positional
embeddings and O(n^2 * L) gates in HBM — at n=1600 that is ~0.7 GB of traffic
per head and ~6 ms on v5e.  This kernel tiles the query-Gaussian axis, keeps the
whole key side resident in VMEM (transposed ``(comp, n)`` layout), recomputes
the neighbor mask from Gaussian radii on the fly, and streams the gating
computation over key chunks — O(n * L) HBM traffic total.

Semantics are identical to :func:`pigs_tpu.ops.aggregate.aggregate_neighbors`
with ``mask = neighbor_mask(means, cov, active, sigma_cut, period)``: the radius
of a Gaussian is ``sqrt(max diag(Sigma))``, pairs are neighbors within
``sigma_cut * (r_i + r_j)``, self-pairs are excluded, and rows with no neighbors
are exactly zero.  Inactive Gaussians are encoded as ``radius = -inf`` (they
join no pairs on either side).

Mosaic-specific shape discipline (each of these failed a naive formulation):

  * no (TI, TJ, E) 3D tensors — small trailing dims pad to 128 lanes and blow
    VMEM; the gated message sum is instead ONE matmul per key chunk with the
    2E embedding components concatenated along the contraction axis:
    ``out = A @ Mbig`` where ``A[i, (e, j)] = alpha_ij * emb_e(rel_ij)`` and
    ``Mbig[(e, j), l] = mapped[l, j] * dist[l, e]``.
  * the key-chunk loop is a ``lax.fori_loop`` (unrolled chunks defeat Mosaic's
    buffer reuse), with dynamic slices of VMEM-resident values.
  * the backward is hand-derived with full recompute (``jax.checkpoint`` has no
    Mosaic lowering, and autodiff residuals across chunks overflow VMEM).
  * embedding components use a grouped per-bank ordering; the wrapper permutes
    ``distance_transform`` columns from the dense (freq, dim)-interleaved
    convention to match (``_group_permutation``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["aggregate_neighbors_pallas", "radii_of"]

TILE_I = 32
TILE_J = 512
TILE_I_BWD = 32


def radii_of(covariances: jax.Array,
             active: Optional[jax.Array] = None) -> jax.Array:
    """Principal std-dev radius per Gaussian; inactive slots get -inf so they
    join no neighbor pairs (matches neighbor_mask's radius definition)."""
    r = jnp.sqrt(jnp.max(jnp.diagonal(covariances, axis1=-2, axis2=-1),
                         axis=-1))
    if active is not None:
        r = jnp.where(active, r, -jnp.inf)
    return r


def _group_permutation(F: int, d: int = 2):
    """Column permutation mapping the kernel's grouped component layout onto
    the dense path's (freq, dim)-interleaved layout
    (ops/aggregate.py positional_embedding):
    ``emb_grouped[..., k] == emb_dense[..., perm[k]]``.

    Grouped layout per bank: [1, sin(f0 x)..sin(fF x), sin(f0 y)..,
    cos(f0 x).., cos(f0 y)..]; two banks (phase scales 1 and 2)."""
    fd = F * d
    phase = np.empty(fd, np.int64)
    for k in range(fd):
        dim, f = k // F, k % F
        phase[k] = f * d + dim
    E = 1 + 2 * fd
    block = np.concatenate([[0], 1 + phase, 1 + fd + phase])
    return np.concatenate([block, E + block])


def _trig_pairs(relx_c, rely_c, freqs):
    """(sin, cos) of f_k * rel per (axis, freq), axis-major order matching the
    grouped phase layout.  One sin+cos per pair; the second frequency bank is
    derived by double-angle identities instead of more transcendentals."""
    F = freqs.shape[-1]
    pairs = []
    for rel in (relx_c, rely_c):
        for k in range(F):
            theta = freqs[0, k] * rel
            pairs.append((jnp.sin(theta), jnp.cos(theta)))
    return pairs


def _components(relx_c, rely_c, freqs):
    """The 2E embedding components of one key chunk, grouped-bank order:
    bank 1 = [1, sin(theta)..., cos(theta)...], bank 2 the same at 2*theta
    (sin 2t = 2 s c, cos 2t = 1 - 2 s^2).  Returns a list of (TI, TJ) arrays."""
    pairs = _trig_pairs(relx_c, rely_c, freqs)
    ones = jnp.ones_like(relx_c)
    bank1 = [ones] + [s for s, c in pairs] + [c for s, c in pairs]
    bank2 = ([ones] + [2.0 * s * c for s, c in pairs]
             + [1.0 - 2.0 * s * s for s, c in pairs])
    return bank1 + bank2


def _tile_alpha(q_tile, mi_tile, ri_tile, kt, mt, rt, i_base, *,
                n_pad: int, sigma_cut: float, period: Optional[float],
                big_neg: float = -1e30):
    """Masked attention weights for one query tile: returns
    (alpha (TI, n), relx (TI, n), rely (TI, n))."""
    ti = q_tile.shape[0]
    K = q_tile.shape[1]
    f32 = jnp.float32

    logits = jax.lax.dot_general(
        q_tile, kt, (((1,), (0,)), ((), ())),
        preferred_element_type=f32) / jnp.sqrt(jnp.asarray(K, f32))  # (TI, n)

    relx = mt[0:1, :] - mi_tile[:, 0:1]          # (TI, n)
    rely = mt[1:2, :] - mi_tile[:, 1:2]
    if period is not None:
        relx = relx - period * jnp.round(relx * (1.0 / period))
        rely = rely - period * jnp.round(rely * (1.0 / period))
    dist2 = relx * relx + rely * rely
    cut = sigma_cut * (ri_tile + rt)             # (TI, n)
    row_ids = (jax.lax.broadcasted_iota(jnp.int32, (ti, n_pad), 0)
               + jnp.asarray(i_base, jnp.int32))
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (ti, n_pad), 1)
    neighbor = ((jax.lax.stop_gradient(dist2) <= cut * cut) & (cut > 0)
                & (row_ids != col_ids))

    masked = jnp.where(neighbor, logits, big_neg)
    row_max = jax.lax.stop_gradient(jnp.max(masked, axis=1, keepdims=True))
    unnorm = jnp.exp(masked - row_max) * neighbor.astype(f32)
    denom = jnp.sum(unnorm, axis=1, keepdims=True)
    alpha = unnorm / jnp.maximum(denom, 1e-30)   # (TI, n)
    return alpha, relx, rely


def _matmul(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _chunk_out(alpha_c, mapped_c, relx_c, rely_c, dist, freqs):
    """Gated message contribution of one key chunk as ONE matmul:
    ``A (TI, 2E*TJ) @ Mbig (2E*TJ, L)``."""
    comps = _components(relx_c, rely_c, freqs)
    A = jnp.concatenate([B * alpha_c for B in comps], axis=1)
    M = mapped_c.T                                # (TJ, L)
    twoE = len(comps)
    mpieces = [M * dist[:, e][None, :] for e in range(twoE)]
    Mbig = jnp.concatenate(mpieces, axis=0)       # (2E*TJ, L)
    return _matmul(A, Mbig)                       # (TI, L)


def _chunk_bwd(alpha_c, mapped_c, relx_c, rely_c, dist, freqs, cot):
    """Hand-derived adjoint of :func:`_chunk_out` with full recompute.
    Returns (galpha, gmapped (L, TJ), grelx, grely, gdist, gfreqs)."""
    f32 = jnp.float32
    F = freqs.shape[-1]
    tj = alpha_c.shape[1]
    pairs = _trig_pairs(relx_c, rely_c, freqs)    # 12 (s, c) pairs
    fd = len(pairs)
    E = 1 + 2 * fd
    ones = jnp.ones_like(alpha_c)

    def comp(e):
        """Component e rebuilt from the cached (s, c) pairs — holding the full
        component list across the e-loop costs 2E*(TI,TJ) of VMEM."""
        bank, idx = divmod(e, E)
        scale = 1.0 if bank == 0 else 2.0
        if idx == 0:
            return ones
        block, p = divmod(idx - 1, fd)
        s, c = pairs[p]
        if bank == 0:
            return s if block == 0 else c
        return 2.0 * s * c if block == 0 else 1.0 - 2.0 * s * s

    twoE = 2 * E
    A = jnp.concatenate([comp(e) * alpha_c for e in range(twoE)], axis=1)
    M = mapped_c.T                                # (TJ, L)
    Mbig = jnp.concatenate([M * dist[:, e][None, :] for e in range(twoE)],
                           axis=0)

    # dA = cot @ Mbig^T ; dMbig = A^T @ cot (via contraction on the TI axis).
    dA = jax.lax.dot_general(cot, Mbig, (((1,), (1,)), ((), ())),
                             preferred_element_type=f32)   # (TI, 2E*TJ)
    dMbig = jax.lax.dot_general(A, cot, (((0,), (0,)), ((), ())),
                                preferred_element_type=f32)  # (2E*TJ, L)

    ga = jnp.zeros_like(alpha_c)
    gM = jnp.zeros_like(M)                        # (TJ, L)
    gd_cols = []
    dtheta = [jnp.zeros_like(alpha_c) for _ in range(fd)]  # per (axis, freq)
    for e in range(twoE):
        dA_e = dA[:, e * tj:(e + 1) * tj]         # (TI, TJ)
        dM_e = dMbig[e * tj:(e + 1) * tj, :]      # (TJ, L)
        ga = ga + dA_e * comp(e)
        gM = gM + dM_e * dist[:, e][None, :]
        gd_cols.append(jnp.sum(dM_e * M, axis=0))  # (L,)
        # theta-adjoint, accumulated inline per trig pair:
        #   d sin t = c; d cos t = -s; d sin 2t = 2(c^2 - s^2); d cos 2t = -4sc
        bank, idx = divmod(e, E)
        if idx > 0:
            block, p = divmod(idx - 1, fd)
            s, c = pairs[p]
            dB = dA_e * alpha_c
            if bank == 0:
                dtheta[p] = dtheta[p] + (dB * c if block == 0 else -dB * s)
            else:
                dtheta[p] = dtheta[p] + (dB * 2.0 * (c * c - s * s)
                                         if block == 0 else -dB * 4.0 * s * c)
    grx = jnp.zeros_like(relx_c)
    gry = jnp.zeros_like(rely_c)
    gf = jnp.zeros((1, F), f32)
    for p in range(fd):
        axis, k = p // F, p % F
        rel = relx_c if axis == 0 else rely_c
        if axis == 0:
            grx = grx + dtheta[p] * freqs[0, k]
        else:
            gry = gry + dtheta[p] * freqs[0, k]
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (1, F), 1)
                  == k).astype(f32)
        gf = gf + onehot * jnp.sum(dtheta[p] * rel)
    gdist = jnp.stack(gd_cols, axis=1)            # (L, 2E)
    return ga, gM.T, grx, gry, gdist, gf


# ---------------------------------------------------------------- kernels ----


def _fwd_kernel(q_ref, mi_ref, ri_ref, ft_ref, kt_ref, mt_ref, rt_ref,
                tr_ref, dist_ref, fr_ref, out_ref, *, n_pad, tile_i, tile_j,
                sigma_cut, period):
    i = pl.program_id(0)
    f32 = jnp.float32
    L = ft_ref.shape[0]
    ti = tile_i

    def scoped(alpha_s, relx_s, rely_s, mapped_s):
        alpha, relx, rely = _tile_alpha(
            q_ref[:], mi_ref[:], ri_ref[:], kt_ref[:], mt_ref[:], rt_ref[:],
            i * tile_i, n_pad=n_pad, sigma_cut=sigma_cut, period=period)
        alpha_s[:] = alpha
        relx_s[:] = relx
        rely_s[:] = rely
        mapped_s[:] = _matmul(tr_ref[:], ft_ref[:])
        dist = dist_ref[:]
        freqs = fr_ref[:]

        # Chunk loop as a real loop with dynamic ref slices: an unrolled loop
        # keeps every chunk's temporaries live and overflows VMEM.
        def body(c, acc):
            j0 = c * tile_j
            return acc + _chunk_out(alpha_s[:, pl.ds(j0, tile_j)],
                                    mapped_s[:, pl.ds(j0, tile_j)],
                                    relx_s[:, pl.ds(j0, tile_j)],
                                    rely_s[:, pl.ds(j0, tile_j)],
                                    dist, freqs)

        out_ref[:] = jax.lax.fori_loop(0, n_pad // tile_j, body,
                                       jnp.zeros((ti, L), f32))

    pl.run_scoped(
        scoped,
        alpha_s=pltpu.VMEM((ti, n_pad), f32),
        relx_s=pltpu.VMEM((ti, n_pad), f32),
        rely_s=pltpu.VMEM((ti, n_pad), f32),
        mapped_s=pltpu.VMEM((L, n_pad), f32),
    )


def _bwd_kernel(q_ref, mi_ref, ri_ref, ft_ref, kt_ref, mt_ref, rt_ref,
                tr_ref, dist_ref, fr_ref, cot_ref,
                gq_ref, gmi_ref, gft_ref, gkt_ref, gmt_ref, gtr_ref,
                gdist_ref, gfr_ref, *, n_pad, tile_i, tile_j, sigma_cut,
                period):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        gft_ref[:] = jnp.zeros_like(gft_ref)
        gkt_ref[:] = jnp.zeros_like(gkt_ref)
        gmt_ref[:] = jnp.zeros_like(gmt_ref)
        gtr_ref[:] = jnp.zeros_like(gtr_ref)
        gdist_ref[:] = jnp.zeros_like(gdist_ref)
        gfr_ref[:] = jnp.zeros_like(gfr_ref)

    cot = cot_ref[:]
    f32 = jnp.float32

    def alpha_fn(q_tile, mi_tile, kt, mt):
        return _tile_alpha(q_tile, mi_tile, ri_ref[:], kt, mt, rt_ref[:],
                           i * tile_i, n_pad=n_pad, sigma_cut=sigma_cut,
                           period=period)

    dist = dist_ref[:]
    freqs = fr_ref[:]
    L = ft_ref.shape[0]
    ti = tile_i
    f32 = jnp.float32

    def scoped(alpha_s, relx_s, rely_s, mapped_s, ga_s, gm_s, grx_s, gry_s):
        (alpha, relx, rely), vjp_alpha = jax.vjp(
            alpha_fn, q_ref[:], mi_ref[:], kt_ref[:], mt_ref[:])
        mapped, vjp_mapped = jax.vjp(
            lambda tr, ft: _matmul(tr, ft), tr_ref[:], ft_ref[:])
        alpha_s[:] = alpha
        relx_s[:] = relx
        rely_s[:] = rely
        mapped_s[:] = mapped

        def body(c, carry):
            gdist, gfr = carry
            j0 = c * tile_j
            ga, gm, grx, gry, gd, gf = _chunk_bwd(
                alpha_s[:, pl.ds(j0, tile_j)], mapped_s[:, pl.ds(j0, tile_j)],
                relx_s[:, pl.ds(j0, tile_j)], rely_s[:, pl.ds(j0, tile_j)],
                dist, freqs, cot)
            ga_s[:, pl.ds(j0, tile_j)] = ga
            gm_s[:, pl.ds(j0, tile_j)] = gm
            grx_s[:, pl.ds(j0, tile_j)] = grx
            gry_s[:, pl.ds(j0, tile_j)] = gry
            return gdist + gd, gfr + gf

        gdist, gfr = jax.lax.fori_loop(
            0, n_pad // tile_j, body,
            (jnp.zeros_like(dist), jnp.zeros_like(freqs)))

        gq, gmi, gkt, gmt = vjp_alpha((ga_s[:], grx_s[:], gry_s[:]))
        gtr, gft = vjp_mapped(gm_s[:])

        gq_ref[:] = gq
        gmi_ref[:] = gmi
        gft_ref[:] += gft
        gkt_ref[:] += gkt
        gmt_ref[:] += gmt
        gtr_ref[:] += gtr
        gdist_ref[:] += gdist
        gfr_ref[:] += gfr

    pl.run_scoped(
        scoped,
        alpha_s=pltpu.VMEM((ti, n_pad), f32),
        relx_s=pltpu.VMEM((ti, n_pad), f32),
        rely_s=pltpu.VMEM((ti, n_pad), f32),
        mapped_s=pltpu.VMEM((L, n_pad), f32),
        ga_s=pltpu.VMEM((ti, n_pad), f32),
        gm_s=pltpu.VMEM((L, n_pad), f32),
        grx_s=pltpu.VMEM((ti, n_pad), f32),
        gry_s=pltpu.VMEM((ti, n_pad), f32),
    )


# ---------------------------------------------------------------- wrappers ---


def _pad_cols(x, target):
    size = x.shape[-1]
    if target == size:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, target - size)]
    return jnp.pad(x, pad)


def _prep(features, queries, keys, means, radii, tile_i, tile_j):
    f32 = jnp.float32
    n = features.shape[0]
    n_pad = ((n + tile_i - 1) // tile_i) * tile_i
    n_pad = ((n_pad + tile_j - 1) // tile_j) * tile_j

    ft = _pad_cols(features.T.astype(f32), n_pad)
    kt = _pad_cols(keys.T.astype(f32), n_pad)
    mt = _pad_cols(means.T.astype(f32), n_pad)
    finite_radii = jnp.where(jnp.isfinite(radii), radii, -1e30).astype(f32)
    rt = jnp.full((1, n_pad), -1e30, f32).at[:, :n].set(finite_radii[None, :])
    q = jnp.pad(queries.astype(f32), ((0, n_pad - n), (0, 0)))
    mi = jnp.pad(means.astype(f32), ((0, n_pad - n), (0, 0)))
    ri = jnp.pad(finite_radii[:, None], ((0, n_pad - n), (0, 0)),
                 constant_values=-1e30)
    return q, mi, ri, ft, kt, mt, rt, n_pad


@functools.partial(jax.jit, static_argnames=("sigma_cut", "period", "tile_i",
                                             "tile_j"))
def _forward(features, transform, queries, keys, frequencies, dist, means,
             radii, sigma_cut, period, tile_i=TILE_I, tile_j=TILE_J):
    n, L = features.shape
    K = queries.shape[1]
    f32 = jnp.float32
    q, mi, ri, ft, kt, mt, rt, n_pad = _prep(features, queries, keys, means,
                                             radii, tile_i, tile_j)
    fr = frequencies.astype(f32)[None, :]       # (1, F)
    tr = transform.astype(f32)
    di = dist.astype(f32)

    full = lambda r: pl.BlockSpec((r, n_pad), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, n_pad=n_pad, tile_i=tile_i,
                          tile_j=tile_j, sigma_cut=sigma_cut, period=period),
        grid=(n_pad // tile_i,),
        in_specs=[
            pl.BlockSpec((tile_i, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_i, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_i, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            full(L), full(K), full(2), full(1),
            pl.BlockSpec((L, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(di.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(fr.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((n_pad, L), f32),
        out_specs=pl.BlockSpec((tile_i, L), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(q, mi, ri, ft, kt, mt, rt, tr, di, fr)
    return out[:n]


@functools.partial(jax.jit, static_argnames=("sigma_cut", "period", "tile_i",
                                             "tile_j"))
def _backward(features, transform, queries, keys, frequencies, dist, means,
              radii, cot, sigma_cut, period, tile_i=TILE_I_BWD,
              tile_j=TILE_J):
    n, L = features.shape
    K = queries.shape[1]
    f32 = jnp.float32
    q, mi, ri, ft, kt, mt, rt, n_pad = _prep(features, queries, keys, means,
                                             radii, tile_i, tile_j)
    fr = frequencies.astype(f32)[None, :]
    tr = transform.astype(f32)
    di = dist.astype(f32)
    cotp = jnp.pad(cot.astype(f32), ((0, n_pad - n), (0, 0)))

    full = lambda r: pl.BlockSpec((r, n_pad), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, n_pad=n_pad, tile_i=tile_i,
                          tile_j=tile_j, sigma_cut=sigma_cut, period=period),
        grid=(n_pad // tile_i,),
        in_specs=[
            pl.BlockSpec((tile_i, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_i, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_i, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            full(L), full(K), full(2), full(1),
            const((L, L)), const(di.shape), const(fr.shape),
            pl.BlockSpec((tile_i, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, K), f32),   # gq (per tile)
            jax.ShapeDtypeStruct((n_pad, 2), f32),   # gmeans_i (per tile)
            jax.ShapeDtypeStruct((L, n_pad), f32),   # gft (accumulated)
            jax.ShapeDtypeStruct((K, n_pad), f32),   # gkt (accumulated)
            jax.ShapeDtypeStruct((2, n_pad), f32),   # gmt (accumulated)
            jax.ShapeDtypeStruct((L, L), f32),       # gtransform
            jax.ShapeDtypeStruct(di.shape, f32),     # gdist
            jax.ShapeDtypeStruct(fr.shape, f32),     # gfreqs
        ],
        out_specs=[
            pl.BlockSpec((tile_i, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_i, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            full(L), full(K), full(2),
            const((L, L)), const(di.shape), const(fr.shape),
        ],
    )(q, mi, ri, ft, kt, mt, rt, tr, di, fr, cotp)
    gq, gmi, gft, gkt, gmt, gtr, gdist, gfr = outs
    gmeans = gmi[:n] + gmt[:, :n].T
    return (gft[:, :n].T, gtr, gq[:n], gkt[:, :n].T, gfr[0], gdist, gmeans)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _agg_core(features, transform, queries, keys, frequencies, dist, means,
              radii, sigma_cut, period):
    return _forward(features, transform, queries, keys, frequencies, dist,
                    means, radii, sigma_cut, period)


def _agg_fwd(features, transform, queries, keys, frequencies, dist, means,
             radii, sigma_cut, period):
    out = _agg_core(features, transform, queries, keys, frequencies, dist,
                    means, radii, sigma_cut, period)
    return out, (features, transform, queries, keys, frequencies, dist,
                 means, radii)


def _agg_bwd(sigma_cut, period, res, cot):
    features, transform, queries, keys, frequencies, dist, means, radii = res
    gft, gtr, gq, gkt, gfr, gdist, gmeans = _backward(
        features, transform, queries, keys, frequencies, dist, means, radii,
        cot, sigma_cut, period)
    return (gft.astype(features.dtype), gtr.astype(transform.dtype),
            gq.astype(queries.dtype), gkt.astype(keys.dtype),
            gfr.astype(frequencies.dtype), gdist.astype(dist.dtype),
            gmeans.astype(means.dtype), jnp.zeros_like(radii))


_agg_core.defvjp(_agg_fwd, _agg_bwd)


def aggregate_neighbors_pallas(
    features: jax.Array,
    transform: jax.Array,
    queries: jax.Array,
    keys: jax.Array,
    frequencies: jax.Array,
    distance_transform: jax.Array,
    means: jax.Array,
    radii: jax.Array,
    sigma_cut: float = 3.0,
    period: Optional[float] = None,
) -> jax.Array:
    """Fused neighbor aggregation; equivalent to
    ``aggregate_neighbors(..., mask=neighbor_mask(means, cov, active))`` with
    ``radii = radii_of(cov, active)``.  d=2, f32."""
    if means.shape[1] != 2:
        raise ValueError("aggregate_neighbors_pallas supports d=2 only")
    F = frequencies.shape[0]
    perm = _group_permutation(F, d=2)
    dist_perm = distance_transform[:, perm]
    return _agg_core(features, transform, queries, keys, frequencies,
                     dist_perm, means, radii, sigma_cut, period)
