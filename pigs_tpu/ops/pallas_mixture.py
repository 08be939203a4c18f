"""Fused Pallas TPU kernel for 2D Gaussian-mixture field evaluation.

The speed-of-light path for the framework's hot primitive (the reference's CUDA
``sample_gaussians*`` family, SURVEY.md §2.1): one pass over (sample-tile x
Gaussian-tile) computes the density once and emits value, gradient, Hessian and
third derivative together — where the reference recomputes the exponent per
method, this kernel computes it once per pair.

Design (see /opt/skills/guides/pallas_guide.md):

  * grid = (sample_tiles, gaussian_tiles); the Gaussian axis is innermost so each
    output block is revisited consecutively and accumulates in VMEM.
  * Gaussian parameters are passed transposed ``(comp, n)`` so tiles put the
    Gaussian axis on the 128-lane dimension; samples are ``(m, 2)`` with the
    sample axis on sublanes.
  * symmetric tensors are packed: conic = [cxx, cxy, cyy]; Hessian output
    [xx, xy, yy]; third-derivative output [xxx, xxy, xyy, yyy].  The wrapper
    unpacks to the oracle's full shapes.
  * everything is f32; accumulation happens in the revisited output block.

The backward pass currently reuses the blockwise-XLA oracle via ``jax.vjp``
(exact same math, autodiff-derived); a hand-written Pallas backward is the next
optimization step.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pigs_tpu.ops.oracle import MixtureFields, eval_mixture_dense

__all__ = ["eval_mixture_pallas"]


def _fwd_kernel(smp_ref, mt_ref, ct_ref, vt_ref, msk_ref,
                *out_refs, order: int, c: int, period: Optional[float]):
    u_ref = out_refs[0]
    ux_ref = out_refs[1] if order >= 1 else None
    uxx_ref = out_refs[2] if order >= 2 else None
    uxxx_ref = out_refs[3] if order >= 3 else None
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        for ref in out_refs:
            ref[:] = jnp.zeros_like(ref)

    x = smp_ref[:, 0:1]            # (TM, 1)
    y = smp_ref[:, 1:2]
    mx = mt_ref[0:1, :]            # (1, TN)
    my = mt_ref[1:2, :]
    cxx = ct_ref[0:1, :]
    cxy = ct_ref[1:2, :]
    cyy = ct_ref[2:3, :]
    msk = msk_ref[0:1, :]          # (1, TN) float {0,1}

    dx = x - mx                    # (TM, TN)
    dy = y - my
    if period is not None:
        dx = dx - period * jnp.round(dx * (1.0 / period))
        dy = dy - period * jnp.round(dy * (1.0 / period))
    px = cxx * dx + cxy * dy
    py = cxy * dx + cyy * dy
    power = -0.5 * (dx * px + dy * py)
    g = jnp.exp(power) * msk       # (TM, TN)

    # Value: u += g @ v.
    u_ref[:] += jax.lax.dot_general(
        g, vt_ref[:].T, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    if order >= 1:
        w1x = -px * g
        w1y = -py * g
        ux_ref[:] += jnp.concatenate([
            jax.lax.dot_general(w, vt_ref[:].T, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            for w in (w1x, w1y)], axis=-1)

    if order >= 2:
        wxx = (px * px - cxx) * g
        wxy = (px * py - cxy) * g
        wyy = (py * py - cyy) * g
        uxx_ref[:] += jnp.concatenate([
            jax.lax.dot_general(w, vt_ref[:].T, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            for w in (wxx, wxy, wyy)], axis=-1)

    if order >= 3:
        # w3[a,b,e] = C_ab P_e + C_ae P_b + C_be P_a - P_a P_b P_e
        wxxx = (3.0 * cxx * px - px * px * px) * g
        wxxy = (cxx * py + 2.0 * cxy * px - px * px * py) * g
        wxyy = (cyy * px + 2.0 * cxy * py - px * py * py) * g
        wyyy = (3.0 * cyy * py - py * py * py) * g
        uxxx_ref[:] += jnp.concatenate([
            jax.lax.dot_general(w, vt_ref[:].T, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            for w in (wxxx, wxxy, wxyy, wyyy)], axis=-1)


def _pad_axis(x, mult, axis):
    size = x.shape[axis]
    target = (size + mult - 1) // mult * mult
    if target == size:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, target - size)
    return jnp.pad(x, widths)


@functools.partial(jax.jit,
                   static_argnames=("order", "period", "tile_m", "tile_n"))
def _pallas_forward(means, conics_packed, values, samples, mask,
                    order: int, period: Optional[float],
                    tile_m: int = 256, tile_n: int = 256):
    m, d = samples.shape
    n = means.shape[0]
    c = values.shape[1]
    f32 = jnp.float32

    smp = _pad_axis(samples.astype(f32), tile_m, 0)
    mt = _pad_axis(means.T.astype(f32), tile_n, 1)                # (2, n)
    ct = _pad_axis(conics_packed.T.astype(f32), tile_n, 1)        # (3, n)
    vt = _pad_axis(values.T.astype(f32), tile_n, 1)               # (c, n)
    msk = _pad_axis(mask.astype(f32)[None, :], tile_n, 1)         # (1, n)

    mp, np_ = smp.shape[0], mt.shape[1]
    grid = (mp // tile_m, np_ // tile_n)

    out_shapes = [
        jax.ShapeDtypeStruct((mp, c), f32),          # u
        jax.ShapeDtypeStruct((mp, 2 * c), f32),      # ux packed
        jax.ShapeDtypeStruct((mp, 3 * c), f32),      # uxx packed
        jax.ShapeDtypeStruct((mp, 4 * c), f32),      # uxxx packed
    ]
    out_specs = [
        pl.BlockSpec((tile_m, c), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_m, 2 * c), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_m, 3 * c), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_m, 4 * c), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    n_out = order + 1
    kernel = functools.partial(_fwd_kernel, order=order, c=c, period=period)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tile_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, tile_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shapes[:n_out],
        out_specs=out_specs[:n_out],
        cost_estimate=pl.CostEstimate(
            flops=int(mp) * int(np_) * (20 + 12 * order),
            bytes_accessed=int(mp) * 4 * (d + (1 + 2 + 3 + 4) * c),
            transcendentals=int(mp) * int(np_),
        ),
    )(smp, mt, ct, vt, msk)

    u = outs[0][:m]
    ux = uxx = uxxx = None
    if order >= 1:
        ux = outs[1][:m].reshape(m, 2, c)
    if order >= 2:
        p = outs[2][:m].reshape(m, 3, c)
        uxx = jnp.stack([
            jnp.stack([p[:, 0], p[:, 1]], axis=1),
            jnp.stack([p[:, 1], p[:, 2]], axis=1),
        ], axis=1)                                    # (m, 2, 2, c)
    if order >= 3:
        q = outs[3][:m].reshape(m, 4, c)
        # q = [xxx, xxy, xyy, yyy]; full symmetric (m, 2, 2, 2, c).
        uxxx = jnp.stack([
            jnp.stack([jnp.stack([q[:, 0], q[:, 1]], axis=1),
                       jnp.stack([q[:, 1], q[:, 2]], axis=1)], axis=1),
            jnp.stack([jnp.stack([q[:, 1], q[:, 2]], axis=1),
                       jnp.stack([q[:, 2], q[:, 3]], axis=1)], axis=1),
        ], axis=1)
    return MixtureFields(u=u, ux=ux, uxx=uxx, uxxx=uxxx)


def _pack_conics(conics_full):
    return jnp.stack([conics_full[:, 0, 0], conics_full[:, 0, 1],
                      conics_full[:, 1, 1]], axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _eval_core(means, conics_full, values, samples, order, period):
    mask = jnp.ones(means.shape[0], bool)
    return _pallas_forward(means, _pack_conics(conics_full), values, samples,
                           mask, order, period)


def _core_fwd(means, conics_full, values, samples, order, period):
    out = _eval_core(means, conics_full, values, samples, order, period)
    return out, (means, conics_full, values, samples)


def _core_bwd(order, period, res, cotangents):
    means, conics_full, values, samples = res

    def oracle(means, conics_full, values, samples):
        out = eval_mixture_dense(means, conics_full, values, samples,
                                 order=order, period=period)
        return tuple(f for f in out[:order + 1])

    _, vjp = jax.vjp(oracle, means, conics_full, values, samples)
    cots = tuple(jnp.zeros_like(x) if c is None else c
                 for x, c in zip(oracle(means, conics_full, values, samples),
                                 cotangents[:order + 1]))
    return vjp(cots)


_eval_core.defvjp(_core_fwd, _core_bwd)


def eval_mixture_pallas(
    means: jax.Array,
    conics: jax.Array,
    values: jax.Array,
    samples: jax.Array,
    order: int = 0,
    mask: Optional[jax.Array] = None,
    period: Optional[float] = None,
) -> MixtureFields:
    """Pallas-fused 2D mixture evaluation; same contract as
    :func:`pigs_tpu.ops.oracle.eval_mixture_dense` (d=2 only, f32).

    Differentiable w.r.t. means/conics/values/samples via custom VJP (backward
    currently runs the autodiff of the dense oracle).
    """
    if means.shape[1] != 2:
        raise ValueError("eval_mixture_pallas supports d=2 only")
    if mask is not None:
        # Fold the mask into the values so the custom_vjp signature stays simple;
        # masked Gaussians contribute exactly zero to values and grads.
        gate = mask.astype(values.dtype)[:, None]
        values = values * gate
    fields = _eval_core(means, conics, values, samples, order, period)
    return fields
