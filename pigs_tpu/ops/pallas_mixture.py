"""Fused Pallas TPU kernels for 2D Gaussian-mixture field evaluation.

The speed-of-light path for the framework's hot primitive (the reference's CUDA
``sample_gaussians*`` family, SURVEY.md §2.1): one pass over (sample-tile x
Gaussian-tile) computes the density once and emits value, gradient, Hessian and
third derivative together — where the reference recomputes the exponent per
method, this kernel computes it once per pair.

Design (see /opt/skills/guides/pallas_guide.md):

  * grid = (sample_tiles, gaussian_tiles); the innermost axis is the reduced one
    so each output block is revisited consecutively and accumulates in VMEM.
  * Gaussian parameters are passed transposed ``(comp, n)`` so tiles put the
    Gaussian axis on the 128-lane dimension; samples are ``(m, 2)`` with the
    sample axis on sublanes.
  * symmetric tensors are packed: conic = [cxx, cxy, cyy]; Hessian output
    [xx, xy, yy]; third derivative [xxx, xxy, xyy, yyy].  The wrapper unpacks to
    the oracle's full shapes and folds symmetric cotangents back down.
  * the backward pass is two Pallas kernels with transposed reduction
    orientations: Gaussian-parameter grads accumulate over sample tiles, sample
    grads over Gaussian tiles.  The adjoint is hand-derived (see
    ``_adjoint_fields``): with r_k(j,i) = sum_c cot_k[j,c] v[i,c] (one stacked
    matmul per tile), every parameter gradient is a column/row reduction of five
    elementwise fields E_theta = g * (polynomial in r_k, p, C, delta) — no
    per-component matvecs, no O(m*n) residuals (density recomputed).
  * cross-tile gradient accumulation is Kahan-compensated (scratch carry refs),
    keeping f32 grads ~1e-4-close to the f64 oracle even at 65536 x 2048
    (256 sequential tile accumulations would otherwise drift).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pigs_tpu.ops.oracle import MixtureFields

__all__ = ["eval_mixture_pallas"]

# Tile defaults swept on v5e (65536 x 2048, order 2): forward is fastest at
# (1024, 512); the hand-derived backward at (256, 512) — the stacked weight
# and r matrices are (K*TM, TN), so TM is kept small to fit VMEM.
DEFAULT_TILE_M = 1024
DEFAULT_TILE_N = 512
BWD_TILE_M = 256
BWD_TILE_N = 512


def _tile_geometry(smp, mt, ct, period: Optional[float]):
    """Shared per-pair geometry for one (sample-tile, Gaussian-tile) pair:
    displacements, conic products p = C delta, and the density g."""
    x = smp[:, 0:1]
    y = smp[:, 1:2]
    mx, my = mt[0:1, :], mt[1:2, :]
    cxx, cxy, cyy = ct[0:1, :], ct[1:2, :], ct[2:3, :]

    dx = x - mx
    dy = y - my
    if period is not None:
        dx = dx - period * jnp.round(dx * (1.0 / period))
        dy = dy - period * jnp.round(dy * (1.0 / period))
    px = cxx * dx + cxy * dy
    py = cxy * dx + cyy * dy
    g = jnp.exp(-0.5 * (dx * px + dy * py))
    return dx, dy, px, py, g, cxx, cxy, cyy


def _weight_list(geom, order: int):
    """The K = 1+2+3+4 packed output weights W_k with W_k = P_k * g:
    u = sum_i W_0 v_i, ux = (W_1, W_2) v, uxx = (W_3..W_5) v, uxxx = (W_6..W_9) v
    (analytic derivative formulas of reference gaussians.py:89-116 and the
    third-derivative tensor, model_pn.py:654-656)."""
    dx, dy, px, py, g, cxx, cxy, cyy = geom
    weights = [g]
    if order >= 1:
        weights += [-px * g, -py * g]
    if order >= 2:
        weights += [(px * px - cxx) * g, (px * py - cxy) * g,
                    (py * py - cyy) * g]
    if order >= 3:
        weights += [(3.0 * cxx * px - px * px * px) * g,
                    (cxx * py + 2.0 * cxy * px - px * px * py) * g,
                    (cyy * px + 2.0 * cxy * py - px * py * py) * g,
                    (3.0 * cyy * py - py * py * py) * g]
    return weights


def _tile_outputs(smp, mt, ct, vt, order: int, period: Optional[float]):
    """Packed mixture outputs for one (sample-tile, Gaussian-tile) pair.

    smp (TM, 2); mt (2, TN); ct (3, TN); vt (c, TN) with the mask prefolded
    into vt.  Returns a tuple of up to 4 arrays:
    u (TM, c), ux (TM, 2c), uxx (TM, 3c), uxxx (TM, 4c).
    """
    geom = _tile_geometry(smp, mt, ct, period)
    v = vt.T  # (TN, c)

    # All derivative components contract against the same (TN, c) values, so
    # stack them along the sublane axis and run ONE matmul per tile: separate
    # (TM, TN) @ (TN, c) matvecs are MXU-latency-bound at small c.
    weights = _weight_list(geom, order)
    tm = smp.shape[0]
    stacked = jnp.concatenate(weights, axis=0)        # (K*TM, TN)
    res = jax.lax.dot_general(stacked, v, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)  # (K*TM, c)

    group_sizes = [1, 2, 3, 4][:order + 1]
    outs = []
    row = 0
    for gsize in group_sizes:
        outs.append(jnp.concatenate(
            [res[(row + k) * tm:(row + k + 1) * tm] for k in range(gsize)],
            axis=-1))
        row += gsize
    return tuple(outs)


def _stack_cotangents(cot_refs):
    """Concatenate the per-component cotangents (TM, c) each into the
    component-major stack (K*TM, c) matching ``_weight_list``'s ordering.

    The components are split OUTSIDE the kernel (XLA slices in the wrapper):
    in-kernel lane slices at non-zero offsets cannot be row-concatenated by
    Mosaic ("result/input offset mismatch on non-concat dimension")."""
    return jnp.concatenate([ref[:] for ref in cot_refs], axis=0)


def _adjoint_fields(geom, rs, order: int):
    """Hand-derived adjoint: the five elementwise gradient fields.

    Given r_k(j,i) = sum_c cot_k[j,c] * v[i,c] (``rs``, component order matching
    ``_weight_list``), each output is W_k = P_k(p, C) * g with
    g = exp(-1/2 d.C d), p = C d.  Writing the total pair contribution
    T = sum_k r_k W_k, its derivative w.r.t. any tile scalar theta is

        E_theta = g * [ Q dpx/dtheta + R dpy/dtheta + (direct dP/dC terms)
                        + A dlog(g)/dtheta ]

    with Q = sum_k r_k dP_k/dpx, R = sum_k r_k dP_k/dpy, A = sum_k r_k P_k.
    Gaussian-parameter grads are column sums of E (means with a sign flip,
    d(delta)/d(mean) = -1); sample grads are row sums of (E_dx, E_dy).

    Returns (E_dx, E_dy, E_cxx, E_cxy, E_cyy).
    """
    dx, dy, px, py, g, cxx, cxy, cyy = geom
    r_u = rs[0]
    A = r_u
    Q = jnp.zeros_like(r_u)
    R = jnp.zeros_like(r_u)
    Dxx = jnp.zeros_like(r_u)
    Dxy = jnp.zeros_like(r_u)
    Dyy = jnp.zeros_like(r_u)
    if order >= 1:
        r_x, r_y = rs[1], rs[2]
        Q = Q - r_x
        R = R - r_y
        A = A - px * r_x - py * r_y
    if order >= 2:
        r_xx, r_xy, r_yy = rs[3], rs[4], rs[5]
        Q = Q + 2.0 * px * r_xx + py * r_xy
        R = R + px * r_xy + 2.0 * py * r_yy
        A = A + ((px * px - cxx) * r_xx + (px * py - cxy) * r_xy
                 + (py * py - cyy) * r_yy)
        Dxx = Dxx - r_xx
        Dxy = Dxy - r_xy
        Dyy = Dyy - r_yy
    if order >= 3:
        r3 = rs[6:10]
        r_xxx, r_xxy, r_xyy, r_yyy = r3
        Q = Q + ((3.0 * cxx - 3.0 * px * px) * r_xxx
                 + (2.0 * cxy - 2.0 * px * py) * r_xxy
                 + (cyy - py * py) * r_xyy)
        R = R + ((cxx - px * px) * r_xxy
                 + (2.0 * cxy - 2.0 * px * py) * r_xyy
                 + (3.0 * cyy - 3.0 * py * py) * r_yyy)
        A = A + ((3.0 * cxx * px - px * px * px) * r_xxx
                 + (cxx * py + 2.0 * cxy * px - px * px * py) * r_xxy
                 + (cyy * px + 2.0 * cxy * py - px * py * py) * r_xyy
                 + (3.0 * cyy * py - py * py * py) * r_yyy)
        Dxx = Dxx + 3.0 * px * r_xxx + py * r_xxy
        Dxy = Dxy + 2.0 * px * r_xxy + 2.0 * py * r_xyy
        Dyy = Dyy + px * r_xyy + 3.0 * py * r_yyy

    E_dx = g * (Q * cxx + R * cxy - A * px)
    E_dy = g * (Q * cxy + R * cyy - A * py)
    E_cxx = g * (Q * dx + Dxx - 0.5 * A * dx * dx)
    E_cxy = g * (Q * dy + R * dx + Dxy - A * dx * dy)
    E_cyy = g * (R * dy + Dyy - 0.5 * A * dy * dy)
    # A*g = sum_k r_k W_k: with r built WITHOUT the value factor (c=1 fast
    # path) this is exactly the per-pair value gradient field.
    return E_dx, E_dy, E_cxx, E_cxy, E_cyy, A * g


def _pair_r_fields(geom, ubar, vt, tm: int, order: int):
    """r_k(j,i) per component: ONE (K*TM, c) @ (c, TN) matmul, then row
    slices."""
    n_comp = [1, 3, 6, 10][order]
    r_full = jax.lax.dot_general(ubar, vt, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    return [r_full[k * tm:(k + 1) * tm] for k in range(n_comp)]


# ---------------------------------------------------------------- forward ----


def _fwd_kernel(smp_ref, mt_ref, ct_ref, vt_ref, *rest,
                order: int, period: Optional[float]):
    n_out = order + 1
    out_refs = rest[:n_out]
    carry_refs = rest[n_out:]
    j = pl.program_id(1)

    outs = _tile_outputs(smp_ref[:], mt_ref[:], ct_ref[:], vt_ref[:],
                         order, period)
    for ref, cref, val in zip(out_refs, carry_refs, outs):
        _kahan_add(ref, cref, val, j == 0)


def _pad_axis(x, mult, axis):
    size = x.shape[axis]
    target = (size + mult - 1) // mult * mult
    if target == size:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, target - size)
    return jnp.pad(x, widths)


def _prep(means, conics_packed, values, samples, tile_m, tile_n):
    f32 = jnp.float32
    smp = _pad_axis(samples.astype(f32), tile_m, 0)
    mt = _pad_axis(means.T.astype(f32), tile_n, 1)           # (2, n)
    ct = _pad_axis(conics_packed.T.astype(f32), tile_n, 1)   # (3, n)
    vt = _pad_axis(values.T.astype(f32), tile_n, 1)          # (c, n)
    return smp, mt, ct, vt


def _gauss_spec(rows, tile_n):
    return pl.BlockSpec((rows, tile_n), lambda i, j: (0, j),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit,
                   static_argnames=("order", "period", "tile_m", "tile_n"))
def _pallas_forward(means, conics_packed, values, samples,
                    order: int, period: Optional[float],
                    tile_m: Optional[int] = None,
                    tile_n: int = DEFAULT_TILE_N):
    m = samples.shape[0]
    c = values.shape[1]
    if tile_m is None:
        # Scoped-VMEM headroom: the kernel's live set scales with
        # c*(order+1) output/scratch columns per sample row.  At c=2,
        # order=3 (the NS third-derivative path) the default 1024x512 tiles
        # sit exactly at the 16 MiB scoped limit, and any extra stack — e.g.
        # the lax.cond wrapping curriculum-gated steps in pn_epoch_scan —
        # OOMs the *compile*.  Halve the sample tile for wide-output configs.
        tile_m = DEFAULT_TILE_M // 2 if c * (order + 1) >= 8 else DEFAULT_TILE_M
    f32 = jnp.float32
    smp, mt, ct, vt = _prep(means, conics_packed, values, samples,
                            tile_m, tile_n)
    mp, np_ = smp.shape[0], mt.shape[1]
    grid = (mp // tile_m, np_ // tile_n)
    widths = [c, 2 * c, 3 * c, 4 * c][:order + 1]

    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, order=order, period=period),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, 2), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            _gauss_spec(2, tile_n),
            _gauss_spec(3, tile_n),
            _gauss_spec(c, tile_n),
        ],
        out_shape=[jax.ShapeDtypeStruct((mp, w), f32) for w in widths],
        out_specs=[pl.BlockSpec((tile_m, w), lambda i, j: (i, 0),
                                memory_space=pltpu.VMEM) for w in widths],
        scratch_shapes=[pltpu.VMEM((tile_m, w), f32) for w in widths],
        cost_estimate=pl.CostEstimate(
            flops=int(mp) * int(np_) * (20 + 12 * order),
            bytes_accessed=int(mp) * 4 * (2 + sum(widths)),
            transcendentals=int(mp) * int(np_),
        ),
    )(smp, mt, ct, vt)
    return [o[:m] for o in outs]


# ---------------------------------------------------------------- backward ---


def _kahan_add(out_ref, carry_ref, inc, first):
    """Compensated cross-tile accumulation: out += inc with a persistent
    carry (scratch survives the sequential TPU grid)."""

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
        carry_ref[:] = jnp.zeros_like(carry_ref)

    y = inc - carry_ref[:]
    s = out_ref[:]
    t = s + y
    carry_ref[:] = (t - s) - y
    out_ref[:] = t


def _bwd_gauss_kernel(smp_ref, mt_ref, ct_ref, vt_ref, *rest,
                      order: int, period: Optional[float], c: int):
    """Gaussian-parameter grads: grid (gaussian_tiles, sample_tiles), sample
    axis innermost, accumulating (gm, gc, gv) blocks with Kahan carries.

    c == 1 takes a cheaper route exploiting the rank-1 structure
    r_k(j,i) = cot_k(j) * v(i): the polynomial sums S* are built from the
    broadcast cotangent columns directly (no cotangent stack, no r matmul,
    no stacked weight matrix), v is folded into g once, and
    gv = colsum(S_A * g)."""
    n_cot = [1, 3, 6, 10][order]
    cot_refs = rest[:n_cot]
    gm_ref, gc_ref, gv_ref = rest[n_cot:n_cot + 3]
    cm_ref, cc_ref, cv_ref = rest[n_cot + 3:]
    j = pl.program_id(1)
    first = j == 0

    smp = smp_ref[:]
    mt, ct, vt = mt_ref[:], ct_ref[:], vt_ref[:]
    tm = smp.shape[0]
    geom = _tile_geometry(smp, mt, ct, period)

    def colsum(E):
        return jnp.sum(E, axis=0, keepdims=True)       # (1, TN)

    if c == 1:
        ub = [ref[:] for ref in cot_refs]              # (TM, 1) columns
        E_dx, E_dy, E_cxx, E_cxy, E_cyy, sa_g = _adjoint_fields(
            geom, ub, order)
        v = vt                                          # (1, TN)
        # E fields above are missing the factor v (r_k = cot_k * v); fold it
        # into the column sums instead of into every field.
        gm_inc = jnp.concatenate([-colsum(E_dx), -colsum(E_dy)], axis=0) * v
        gc_inc = jnp.concatenate([colsum(E_cxx), colsum(E_cxy),
                                  colsum(E_cyy)], axis=0) * v
        gv_inc = colsum(sa_g)
    else:
        ubar = _stack_cotangents(cot_refs)             # (K*TM, c)
        rs = _pair_r_fields(geom, ubar, vt, tm, order)
        E_dx, E_dy, E_cxx, E_cxy, E_cyy, _ = _adjoint_fields(geom, rs, order)
        gm_inc = jnp.concatenate([-colsum(E_dx), -colsum(E_dy)], axis=0)
        gc_inc = jnp.concatenate([colsum(E_cxx), colsum(E_cxy),
                                  colsum(E_cyy)], axis=0)
        stacked = jnp.concatenate(_weight_list(geom, order), axis=0)
        gv_inc = jax.lax.dot_general(ubar, stacked, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    _kahan_add(gm_ref, cm_ref, gm_inc, first)
    _kahan_add(gc_ref, cc_ref, gc_inc, first)
    _kahan_add(gv_ref, cv_ref, gv_inc, first)


def _bwd_sample_kernel(smp_ref, mt_ref, ct_ref, vt_ref, *rest,
                       order: int, period: Optional[float], c: int):
    """Sample grads: grid (sample_tiles, gaussian_tiles), Gaussian axis
    innermost, accumulating the gx block.  Row sums of the same adjoint fields
    (d delta / d sample = +1)."""
    n_cot = [1, 3, 6, 10][order]
    cot_refs = rest[:n_cot]
    gx_ref = rest[n_cot]
    cx_ref = rest[n_cot + 1]
    j = pl.program_id(1)

    smp = smp_ref[:]
    tm = smp.shape[0]
    geom = _tile_geometry(smp, mt_ref[:], ct_ref[:], period)
    vt = vt_ref[:]
    if c == 1:
        # Fold v into g (rank-1 r): the E fields then carry the value factor.
        dx, dy, px, py, g, cxx, cxy, cyy = geom
        geom = (dx, dy, px, py, g * vt, cxx, cxy, cyy)
        rs = [ref[:] for ref in cot_refs]
    else:
        ubar = _stack_cotangents(cot_refs)
        rs = _pair_r_fields(geom, ubar, vt, tm, order)
    E_dx, E_dy, *_ = _adjoint_fields(geom, rs, order)
    gx_inc = jnp.concatenate([jnp.sum(E_dx, axis=1, keepdims=True),
                              jnp.sum(E_dy, axis=1, keepdims=True)], axis=1)
    _kahan_add(gx_ref, cx_ref, gx_inc, j == 0)


@functools.partial(jax.jit,
                   static_argnames=("order", "period", "diff_samples",
                                    "tile_m", "tile_n"))
def _pallas_backward(means, conics_packed, values, samples, cots,
                     order: int, period: Optional[float],
                     diff_samples: bool = True,
                     tile_m: int = BWD_TILE_M, tile_n: int = BWD_TILE_N):
    """cots: tuple of packed cotangents (m, c), (m, 2c), (m, 3c), (m, 4c).

    ``diff_samples=False`` skips the sample-grad kernel (half the backward) and
    returns zeros for gx — collocation points are constants in every training
    loop (the reference only differentiates samples in test_derivatives.py).
    """
    m = samples.shape[0]
    n = means.shape[0]
    c = values.shape[1]
    f32 = jnp.float32
    smp, mt, ct, vt = _prep(means, conics_packed, values, samples,
                            tile_m, tile_n)
    mp, np_ = smp.shape[0], mt.shape[1]
    # Split packed cotangent groups (m, G*c) into per-component (m, c) arrays
    # outside the kernel (Mosaic cannot row-concat non-zero-offset lane
    # slices in-kernel).
    group_sizes = [1, 2, 3, 4][:order + 1]
    comps = []
    for cb, gsize in zip(cots, group_sizes):
        cb = _pad_axis(cb.astype(f32), tile_m, 0)
        for k in range(gsize):
            comps.append(cb[:, k * c:(k + 1) * c])
    cots = comps

    smp_spec_outer = pl.BlockSpec((tile_m, 2), lambda i, j: (i, 0),
                                  memory_space=pltpu.VMEM)
    smp_spec_inner = pl.BlockSpec((tile_m, 2), lambda i, j: (j, 0),
                                  memory_space=pltpu.VMEM)
    cot_specs_inner = [pl.BlockSpec((tile_m, c), lambda i, j: (j, 0),
                                    memory_space=pltpu.VMEM)
                       for _ in range(len(cots))]
    cot_specs_outer = [pl.BlockSpec((tile_m, c), lambda i, j: (i, 0),
                                    memory_space=pltpu.VMEM)
                       for _ in range(len(cots))]

    def gspec(rows, inner):
        if inner:
            return pl.BlockSpec((rows, tile_n), lambda i, j: (0, j),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((rows, tile_n), lambda i, j: (0, i),
                            memory_space=pltpu.VMEM)

    # Kernel 1: Gaussian-parameter grads (reduce over samples).
    gm, gc, gv = pl.pallas_call(
        functools.partial(_bwd_gauss_kernel, order=order, period=period, c=c),
        grid=(np_ // tile_n, mp // tile_m),
        in_specs=[smp_spec_inner, gspec(2, False), gspec(3, False),
                  gspec(c, False)] + cot_specs_inner,
        out_shape=[jax.ShapeDtypeStruct((2, np_), f32),
                   jax.ShapeDtypeStruct((3, np_), f32),
                   jax.ShapeDtypeStruct((c, np_), f32)],
        out_specs=[gspec(2, False), gspec(3, False), gspec(c, False)],
        scratch_shapes=[pltpu.VMEM((2, tile_n), f32),
                        pltpu.VMEM((3, tile_n), f32),
                        pltpu.VMEM((c, tile_n), f32)],
        cost_estimate=pl.CostEstimate(
            flops=int(mp) * int(np_) * (40 + 24 * order),
            bytes_accessed=int(np_) * 4 * (5 + c),
            transcendentals=int(mp) * int(np_),
        ),
    )(smp, mt, ct, vt, *cots)

    if not diff_samples:
        return (gm[:, :n].T, gc[:, :n].T, gv[:, :n].T,
                jnp.zeros((m, 2), f32))

    # Kernel 2: sample grads (reduce over Gaussians).
    (gx,) = pl.pallas_call(
        functools.partial(_bwd_sample_kernel, order=order, period=period, c=c),
        grid=(mp // tile_m, np_ // tile_n),
        in_specs=[smp_spec_outer, gspec(2, True), gspec(3, True),
                  gspec(c, True)] + cot_specs_outer,
        out_shape=[jax.ShapeDtypeStruct((mp, 2), f32)],
        out_specs=[smp_spec_outer],
        scratch_shapes=[pltpu.VMEM((tile_m, 2), f32)],
        cost_estimate=pl.CostEstimate(
            flops=int(mp) * int(np_) * (40 + 24 * order),
            bytes_accessed=int(mp) * 4 * (2 + c * len(cots)),
            transcendentals=int(mp) * int(np_),
        ),
    )(smp, mt, ct, vt, *cots)

    return (gm[:, :n].T, gc[:, :n].T, gv[:, :n].T, gx[:m])


# ------------------------------------------------------------- public API ----


def _pack_conics(conics_full):
    return jnp.stack([conics_full[:, 0, 0], conics_full[:, 0, 1],
                      conics_full[:, 1, 1]], axis=-1)


def _unpack_fields(outs, m, c, order):
    u = outs[0]
    ux = uxx = uxxx = None
    if order >= 1:
        ux = outs[1].reshape(m, 2, c)
    if order >= 2:
        p = outs[2].reshape(m, 3, c)
        uxx = jnp.stack([
            jnp.stack([p[:, 0], p[:, 1]], axis=1),
            jnp.stack([p[:, 1], p[:, 2]], axis=1),
        ], axis=1)
    if order >= 3:
        q = outs[3].reshape(m, 4, c)
        uxxx = jnp.stack([
            jnp.stack([jnp.stack([q[:, 0], q[:, 1]], axis=1),
                       jnp.stack([q[:, 1], q[:, 2]], axis=1)], axis=1),
            jnp.stack([jnp.stack([q[:, 1], q[:, 2]], axis=1),
                       jnp.stack([q[:, 2], q[:, 3]], axis=1)], axis=1),
        ], axis=1)
    return MixtureFields(u=u, ux=ux, uxx=uxx, uxxx=uxxx)


def _pack_cotangents(fields_bar, m, c, order):
    """Fold full-tensor cotangents down to the packed kernel outputs, summing
    the symmetric positions that were broadcast from one packed component."""
    zeros = lambda w: jnp.zeros((m, w), jnp.float32)
    cots = [fields_bar.u if fields_bar.u is not None else zeros(c)]
    if order >= 1:
        b = fields_bar.ux
        cots.append(b.reshape(m, 2 * c) if b is not None else zeros(2 * c))
    if order >= 2:
        b = fields_bar.uxx
        if b is None:
            cots.append(zeros(3 * c))
        else:
            packed = jnp.stack([b[:, 0, 0], b[:, 0, 1] + b[:, 1, 0],
                                b[:, 1, 1]], axis=1)
            cots.append(packed.reshape(m, 3 * c))
    if order >= 3:
        b = fields_bar.uxxx
        if b is None:
            cots.append(zeros(4 * c))
        else:
            packed = jnp.stack([
                b[:, 0, 0, 0],
                b[:, 0, 0, 1] + b[:, 0, 1, 0] + b[:, 1, 0, 0],
                b[:, 0, 1, 1] + b[:, 1, 0, 1] + b[:, 1, 1, 0],
                b[:, 1, 1, 1],
            ], axis=1)
            cots.append(packed.reshape(m, 4 * c))
    return tuple(cots)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _eval_core(means, conics_full, values, samples, order, period,
               diff_samples):
    outs = _pallas_forward(means, _pack_conics(conics_full), values, samples,
                           order, period)
    m, c = samples.shape[0], values.shape[1]
    return _unpack_fields(outs, m, c, order)


def _core_fwd(means, conics_full, values, samples, order, period,
              diff_samples):
    out = _eval_core(means, conics_full, values, samples, order, period,
                     diff_samples)
    return out, (means, conics_full, values, samples)


def _sym_full(gc_packed):
    """Packed conic grads -> full symmetric: the off-diagonal splits evenly
    (the kernel's 2*cxy*dx*dy corresponds to C01 + C10 in the full form)."""
    return jnp.stack([
        jnp.stack([gc_packed[:, 0], 0.5 * gc_packed[:, 1]], axis=-1),
        jnp.stack([0.5 * gc_packed[:, 1], gc_packed[:, 2]], axis=-1),
    ], axis=-2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _bwd_op(order, period, diff_samples, primals, fields_bar):
    """The first-order backward as a differentiable op.

    Forward value: the fused Pallas backward kernels.  Its OWN vjp (i.e.
    second-order differentiation, the reference's create_graph=True,
    test_derivatives.py:122-129) differentiates the dense oracle's vjp of the
    same mapping instead — exact, plain XLA AD, used only when grad-of-grad
    is actually requested.

    Memory: the dense double-backward materializes O(m*n) pairwise
    intermediates (tens of arrays), so beyond
    ``SECOND_ORDER_PAIR_BUDGET`` sample-Gaussian pairs the vjp is computed
    in sample chunks under ``lax.map`` (exact — the second-order cotangents
    are sums of per-sample contributions).  At the headline 65536x2048 this
    caps the working set at ~1 GB instead of ~0.5 TB."""
    means, conics_full, values, samples = primals
    m, c = samples.shape[0], values.shape[1]
    cots = _pack_cotangents(fields_bar, m, c, order)
    gm, gc_packed, gv, gx = _pallas_backward(
        means, _pack_conics(conics_full), values, samples, cots, order,
        period, diff_samples)
    return (gm.astype(means.dtype), _sym_full(gc_packed).astype(
        conics_full.dtype), gv.astype(values.dtype), gx.astype(samples.dtype))


def _bwd_op_ref(order, period, diff_samples, primals, fields_bar):
    """Dense-oracle implementation of the same (primals, cotangents) ->
    gradients mapping, with the pallas path's conic symmetrization."""
    from pigs_tpu.ops.oracle import eval_mixture_dense
    means, conics_full, values, samples = primals

    def f(m_, c_, v_, s_):
        out = eval_mixture_dense(m_, c_, v_, s_, order=order, period=period)
        return tuple(x for x in out[:order + 1])

    _, vjp = jax.vjp(f, means, conics_full, values, samples)
    bar = tuple(fields_bar[:order + 1])
    gm, gc, gv, gx = vjp(bar)
    gc = 0.5 * (gc + jnp.swapaxes(gc, -1, -2))
    if not diff_samples:
        gx = jnp.zeros_like(gx)
    return gm, gc, gv, gx


def _bwd_op_fwd(order, period, diff_samples, primals, fields_bar):
    out = _bwd_op(order, period, diff_samples, primals, fields_bar)
    return out, (primals, fields_bar)


# Max sample-Gaussian pairs one dense second-order vjp block may
# materialize (~30 (m,n)-sized f32 intermediates -> ~1 GB at this budget).
SECOND_ORDER_PAIR_BUDGET = 1 << 23


def _bwd_op_bwd(order, period, diff_samples, res, grad_out):
    primals, fields_bar = res
    means, conics_full, values, samples = primals
    m, n = samples.shape[0], means.shape[0]

    def full(p, fb):
        return _bwd_op_ref(order, period, diff_samples, p, fb)

    if m * n <= SECOND_ORDER_PAIR_BUDGET:
        _, vjp2 = jax.vjp(full, primals, fields_bar)
        return vjp2(grad_out)

    # Chunk over samples: (gm, gc, gv) are sums of per-sample contributions
    # and gx is per-sample, so the vjp splits exactly across sample chunks —
    # shared primal cotangents sum, per-sample cotangents concatenate.
    chunk = max(SECOND_ORDER_PAIR_BUDGET // n, 1)
    k = -(-m // chunk)
    pad = k * chunk - m

    def split_rows(x):
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
        return x.reshape((k, chunk) + x.shape[1:])

    gm_bar, gc_bar, gv_bar, gx_bar = grad_out

    def chunk_fn(xs):
        samples_c, fb_c, gxb_c = xs
        _, vjp2 = jax.vjp(full, (means, conics_full, values, samples_c), fb_c)
        return vjp2((gm_bar, gc_bar, gv_bar, gxb_c))

    (mb, cb, vb, sb), fbb = jax.lax.map(
        chunk_fn, (split_rows(samples),
                   jax.tree_util.tree_map(split_rows, fields_bar),
                   split_rows(gx_bar)))

    def unsplit_rows(x):
        return x.reshape((-1,) + x.shape[2:])[:m]

    return ((mb.sum(0), cb.sum(0), vb.sum(0), unsplit_rows(sb)),
            jax.tree_util.tree_map(unsplit_rows, fbb))


_bwd_op.defvjp(_bwd_op_fwd, _bwd_op_bwd)


def _core_bwd(order, period, diff_samples, res, fields_bar):
    means, conics_full, values, samples = res
    m, c = samples.shape[0], values.shape[1]
    # Fix the cotangent pytree structure (None -> zeros) so _bwd_op's
    # signature is static.
    widths_full = [(m, c), (m, 2, c), (m, 2, 2, c), (m, 2, 2, 2, c)]
    bars = []
    for k, b in enumerate(tuple(fields_bar)[:order + 1]):
        bars.append(b if b is not None
                    else jnp.zeros(widths_full[k], jnp.float32))
    bars += [None] * (4 - len(bars))
    return _bwd_op(order, period, diff_samples,
                   (means, conics_full, values, samples),
                   MixtureFields(*bars))


_eval_core.defvjp(_core_fwd, _core_bwd)


def eval_mixture_pallas(
    means: jax.Array,
    conics: jax.Array,
    values: jax.Array,
    samples: jax.Array,
    order: int = 0,
    mask: Optional[jax.Array] = None,
    period: Optional[float] = None,
    diff_samples: bool = True,
) -> MixtureFields:
    """Pallas-fused 2D mixture evaluation; same contract as
    :func:`pigs_tpu.ops.oracle.eval_mixture_dense` (d=2 only, f32).

    Differentiable w.r.t. means/conics/values/samples via custom VJP whose
    backward runs two fused Pallas kernels (Gaussian-side and sample-side
    reductions) with tile-local adjoint code generated by ``jax.vjp``.
    """
    if means.shape[1] != 2:
        raise ValueError("eval_mixture_pallas supports d=2 only")
    if mask is not None:
        # Fold the mask into the values: masked Gaussians contribute exactly
        # zero to every output and to every gradient.
        gate = mask.astype(values.dtype)[:, None]
        values = values * gate
    return _eval_core(means, conics, values, samples, order, period,
                      diff_samples)
