"""Fit-to-target initialization: optimize a mixture to match a target field.

Functional redesign of test_initialize.py / test_initialize_1d.py (call stack
SURVEY.md §3.4): Adam-fit raw Gaussian parameters to a target (analytic function,
image, or the curl of a 2-channel field for FNO vorticity frames), with periodic
mean wrapping, densification jitter, and eigendecomposition-based splitting.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pigs_tpu import gaussians
from pigs_tpu.models.state import compact_scatter
from pigs_tpu.ops.mixture import eval_mixture
from pigs_tpu.train.no_mlp import RawParams

__all__ = ["FitConfig", "fit", "gaussian_pair_target", "sinusoid_target",
           "image_target"]


class FitConfig(NamedTuple):
    d: int = 2
    nx: int = 50
    capacity: int = 4096
    n_samples: int = 1024
    scale: float = 1.0
    lr_means: float = 5e-3
    lr_values: float = 1e-3
    lr_scaling: float = 5e-2
    lr_transforms: float = 5e-2
    init_raw_scaling: float = -5.0
    block_iters: int = 100
    iters: int = 6000
    split_every_blocks: int = 0     # 0 = off (reference: every 100 log steps)
    jitter_every_blocks: int = 0    # densification jitter cadence
    tanh_means: bool = True         # targets in [-1,1] use tanh parameterization
    curl: bool = False              # fit curl of a 2-channel field (FNO mode)
    periodic: bool = False          # wrap raw means into [-1, 1]
    dtype: jnp.dtype = jnp.float32

    @property
    def c(self) -> int:
        return 2 if self.curl else 1


def gaussian_pair_target(cfg: FitConfig):
    """Two anisotropic bumps (test_initialize.py:117-129)."""
    m1 = jnp.array([0.2, 0.0])
    m2 = jnp.array([-0.6, 0.0])

    def f(samples):
        d1 = samples - m1
        p1 = -0.5 * jnp.sum(d1 * d1, axis=-1) / 0.1
        d2 = samples - m2
        p2 = -0.5 * (d2[:, 0] ** 2 / 0.025 + d2[:, 1] ** 2 / 0.1)
        return jnp.exp(p1) * 0.5 + jnp.exp(p2)

    return f


def sinusoid_target(frequency: float = 1.5 * np.pi):
    """cos(fx) cos(fy) (test_initialize.py:37-38, 130-132)."""
    def f(samples):
        return (jnp.cos(frequency * samples[:, 0])
                * jnp.cos(frequency * samples[:, 1]))
    return f


def image_target(image: jax.Array):
    """Nearest-pixel lookup of a (res, res) image over [-1, 1]^2
    (test_initialize.py:131-141 coordinate convention)."""
    res = image.shape[0]

    def f(samples):
        coords = jnp.clip(((samples + 1.0) / 2.0 * res).astype(jnp.int32),
                          0, res - 1)
        return image[coords[:, 1], coords[:, 0]]

    return f


def _init(cfg: FitConfig):
    d, dt = cfg.d, cfg.dtype
    if d == 1:
        n = cfg.nx
        means = jnp.linspace(-1, 1, n, dtype=dt).reshape(-1, 1)
    else:
        n = cfg.nx * cfg.nx
        t = jnp.linspace(-1, 1, cfg.nx, dtype=dt)
        gx, gy = jnp.meshgrid(t, t, indexing="ij")
        means = jnp.stack([gx, gy], axis=-1).reshape(-1, d)
    T = d * (d - 1) // 2
    pad = cfg.capacity - n
    params = RawParams(
        raw_means=jnp.pad(means, ((0, pad), (0, 0))),
        values=jnp.zeros((cfg.capacity, cfg.c), dt),
        raw_scaling=jnp.full((cfg.capacity, d), cfg.init_raw_scaling, dt),
        transforms=jnp.zeros((cfg.capacity, T), dt),
    )
    return params, jnp.arange(cfg.capacity) < n


def _concrete(cfg: FitConfig, params: RawParams):
    means = (jnp.tanh(params.raw_means) if cfg.tanh_means
             else params.raw_means) * 1.0
    scaling = jnp.exp(params.raw_scaling)
    if cfg.d == 1:
        conics = (1.0 / scaling)[..., None]
    else:
        _, conics = gaussians.build_full_covariances(scaling, params.transforms)
    return means, conics, params.values


def _render(cfg: FitConfig, params, active, samples):
    """``cfg.periodic`` fits must also EVALUATE on the torus (period 2, the
    reference's GaussianSampler(True) for NS, main_pn.py:58): wrapping only
    the raw means while evaluating free-space trains a mixture that scores
    ~7x worse once the NS pipeline evaluates it periodically (round-3 NS
    validation: t=0 vorticity rel-L2 0.467 periodic vs 0.068 free-space)."""
    means, conics, values = _concrete(cfg, params)
    period = 2.0 if cfg.periodic else None
    if cfg.curl:
        out = eval_mixture(means, conics, values, samples, order=1,
                           mask=active, diff_samples=False, period=period)
        img = out.ux[:, 0, 1] - out.ux[:, 1, 0]
        div = out.ux[:, 0, 0] + out.ux[:, 1, 1]
        return img, div
    out = eval_mixture(means, conics, values, samples, order=0, mask=active,
                       diff_samples=False, period=period)
    return out.u[:, 0], None


def _make_optimizer(cfg: FitConfig):
    def label_fn(params):
        return RawParams(raw_means="means", values="values",
                         raw_scaling="scaling", transforms="transforms")
    return optax.multi_transform(
        {"means": optax.adam(cfg.lr_means),
         "values": optax.adam(cfg.lr_values),
         "scaling": optax.adam(cfg.lr_scaling),
         "transforms": optax.adam(cfg.lr_transforms)},
        label_fn)


@partial(jax.jit, static_argnames=("cfg", "target_fn"))
def _fit_block(cfg: FitConfig, target_fn, params, opt_state, active, key):
    opt = _make_optimizer(cfg)

    def step(carry, key):
        params, opt_state = carry
        samples = (jax.random.uniform(key, (cfg.n_samples, cfg.d), cfg.dtype)
                   * 2.0 - 1.0)

        def loss_fn(p):
            img, div = _render(cfg, p, active, samples)
            desired = target_fn(samples)
            loss = jnp.mean((img - desired) ** 2)
            if div is not None:
                loss = loss + jnp.mean(div ** 2)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        if cfg.periodic:
            wrapped = (jnp.mod(params.raw_means + 1.0, 2.0) - 1.0)
            params = params._replace(raw_means=wrapped)
        return (params, opt_state), (loss, grads.raw_means)

    keys = jax.random.split(key, cfg.block_iters)
    (params, opt_state), (losses, mean_grads) = jax.lax.scan(
        step, (params, opt_state), keys)
    return params, opt_state, jnp.mean(losses), mean_grads[-1]


@partial(jax.jit, static_argnames=("cfg",))
def _eig_split(cfg: FitConfig, params: RawParams, opt_state, active,
               last_mean_grad):
    """Eigendecomposition split (test_initialize.py:199-250): displace the parent
    by -pc and the child by +pc along the dominant covariance axis, halve
    values, zero fresh Adam moments."""
    grad_norm = jnp.linalg.norm(last_mean_grad, axis=-1)
    keep = ((jnp.linalg.norm(params.values, axis=-1) > 0.01)
            & (jnp.sum(jnp.exp(params.raw_scaling), axis=-1) < 0.2)
            & active)
    want = (grad_norm > 5e-4) & keep

    scaling = jnp.exp(params.raw_scaling)
    cov, _ = gaussians.build_full_covariances(scaling, params.transforms)
    pc = gaussians.principal_axis(cov) * 0.2

    parent_means = jnp.where(want[:, None], params.raw_means - pc,
                             params.raw_means)
    half_values = jnp.where(want[:, None], params.values * 0.5, params.values)
    base = params._replace(raw_means=parent_means, values=half_values)

    dest = compact_scatter(~active | ~keep, want)
    child = base._replace(raw_means=parent_means + 2.0 * pc)
    new_params = RawParams(*[b.at[dest].set(cb, mode="drop")
                             for b, cb in zip(base, child)])
    landed = jnp.zeros_like(active).at[dest].set(want, mode="drop")
    new_active = keep | landed

    fresh = landed | (active & ~keep)

    def zero_rows(m):
        return jnp.where(fresh.reshape((-1,) + (1,) * (m.ndim - 1)),
                         jnp.zeros_like(m), m)

    new_opt_state = jax.tree_util.tree_map(
        lambda s: (s._replace(mu=jax.tree_util.tree_map(zero_rows, s.mu),
                              nu=jax.tree_util.tree_map(zero_rows, s.nu))
                   if isinstance(s, optax.ScaleByAdamState) else s),
        opt_state,
        is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState))
    return new_params, new_opt_state, new_active


def fit(cfg: FitConfig, target_fn: Callable, key: jax.Array):
    """Run the full fitting loop; returns (params, active, loss_history)."""
    params, active = _init(cfg)
    opt = _make_optimizer(cfg)
    opt_state = opt.init(params)
    losses = []
    n_blocks = cfg.iters // cfg.block_iters
    for b in range(n_blocks):
        key, sub = jax.random.split(key)
        params, opt_state, loss, last_grad = _fit_block(
            cfg, target_fn, params, opt_state, active, sub)
        losses.append(float(loss))
        if cfg.split_every_blocks and (b + 1) % cfg.split_every_blocks == 0:
            params, opt_state, active = _eig_split(cfg, params, opt_state,
                                                   active, last_grad)
        if cfg.jitter_every_blocks and (b + 1) % cfg.jitter_every_blocks == 0:
            key, sub = jax.random.split(key)
            jitter = jnp.clip(
                jax.random.normal(sub, params.raw_means.shape, cfg.dtype),
                -1, 1) * 0.01
            params = params._replace(
                raw_means=params.raw_means + jitter,
                values=params.values * 0.0)
    return params, active, losses
