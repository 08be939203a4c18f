"""Navier-Stokes data pipeline: FNO dataset -> curl-fitted NSDataset.

The reference trains NS from two external artifacts (main_pn.py:36-49):

  * ``ns_V1e-3_N50_T50.npy`` — an FNO-format vorticity dataset with layout
    ``(T, res, res, N)`` (test_initialize.py:41-43 indexes ``file[..., i]``
    then transposes ``(1, 2, 0)``; main_pn.py:43 transposes ``(3, 1, 2, 0)``).
  * ``initialization/V1e-3/f_{i}-small.pt`` — per-trajectory Gaussian fits
    produced by test_initialize.py's "f" mode: fit the CURL of a 2-channel
    mixture field to a vorticity frame with a divergence penalty
    (test_initialize.py:112-116, 135-136).

This module is the in-tree equivalent: :func:`fit_fno_trajectory` performs
the curl fit, :func:`convert_fno` batches fits over trajectories and writes
the stacked ``NSDataset`` ``.npz`` that ``scripts/train_pn.py --ns-data``
consumes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pigs_tpu.train.fit import FitConfig, fit, image_target

__all__ = ["load_fno", "fit_fno_trajectory", "convert_fno", "generate_fno"]


def load_fno(path: str) -> np.ndarray:
    """Load an FNO-format ``.npy`` and return ``(N, res, res, T)``
    (main_pn.py:43's transpose of the raw ``(T, res, res, N)`` layout).
    Uses the native mmap reader when available."""
    from pigs_tpu.native import NpyFile
    f = NpyFile(path)
    # Copy out of the mmap: the view must not outlive the NpyFile handle.
    arr = np.array(f.array, copy=True)
    f.close()
    if arr.ndim != 4:
        raise ValueError(f"FNO dataset must be 4D (T, res, res, N), "
                         f"got {arr.shape}")
    return np.transpose(arr, (3, 1, 2, 0))


def fit_fno_trajectory(frame: jax.Array, nx: int = 20, iters: int = 2000,
                       seed: int = 0, block_iters: int = 100):
    """Curl-fit one vorticity frame (test_initialize.py "f" mode):
    fit a 2-channel velocity mixture whose curl matches ``frame`` with a
    divergence penalty.  Returns (means, u, scaling, transforms), each
    ``(nx*nx, ...)`` — the per-trajectory initialization main_pn.py:44-49
    loads from ``f_{i}-small.pt``."""
    cfg = FitConfig(nx=nx, capacity=nx * nx, iters=iters,
                    block_iters=min(block_iters, iters), curl=True,
                    periodic=True, tanh_means=False)
    target = image_target(jnp.asarray(frame, jnp.float32))
    params, active, losses = fit(cfg, target, jax.random.PRNGKey(seed))
    means = np.asarray(params.raw_means)           # periodic: raw IS the mean
    u = np.asarray(params.values)
    scaling = np.asarray(jnp.exp(params.raw_scaling))
    transforms = np.asarray(params.transforms)
    return means, u, scaling, transforms, losses[-1]


def convert_fno(path: str, out: str, count: Optional[int] = None,
                nx: int = 20, iters: int = 2000, seed: int = 0,
                log_fn=print) -> str:
    """FNO ``.npy`` -> ``NSDataset`` ``.npz``: curl-fit frame 0 of the first
    ``count`` trajectories and stack them with the vorticity frames.

    The output loads with :meth:`pigs_tpu.train.pn.NSDataset.load` and feeds
    ``scripts/train_pn.py --ns-data`` (the reference's main_pn.py:36-49 flow).
    """
    data = load_fno(path)                          # (N, res, res, T)
    k = data.shape[0] if count is None else min(count, data.shape[0])
    means, u, scaling, transforms = [], [], [], []
    for i in range(k):
        m, v, s, t, loss = fit_fno_trajectory(
            data[i, :, :, 0], nx=nx, iters=iters, seed=seed + i)
        means.append(m)
        u.append(v)
        scaling.append(s)
        transforms.append(t)
        log_fn(f"trajectory {i}: curl-fit final loss {loss:.6f}")
    np.savez(out,
             means=np.stack(means), u=np.stack(u),
             scaling=np.stack(scaling), transforms=np.stack(transforms),
             frames=data[:k].astype(np.float32))
    log_fn(f"wrote {k} trajectories to {out}")
    return out


def generate_fno(out: str, n_traj: int = 5, res: int = 64, steps: int = 50,
                 dt: float = 0.1, nu: float = 1e-3, seed: int = 0,
                 gen_res: int = 128, log_fn=print) -> str:
    """Generate an FNO-format NS dataset with the in-tree pseudo-spectral
    solver (:func:`pigs_tpu.utils.fd.solve_ns_2d`) — the stand-in for the
    external ``ns_V1e-3_N50_T50.npy`` (main_pn.py:36-43), with the SAME
    unforced dynamics the PN model's residual penalizes (model_pn.py:630-632).

    Solves at ``gen_res`` and strides down to ``res`` (band-limited ICs make
    the stride spectrally exact).  Output layout ``(T, res, res, N)`` with
    frame axis order [y, x] ascending — the convention both
    :func:`pigs_tpu.train.fit.image_target` (curl fit) and
    ``NSDataset.recon_target`` index with.
    """
    import jax

    from pigs_tpu.utils.fd import random_vorticity, solve_ns_2d

    key = jax.random.PRNGKey(seed)
    frames = []
    for i in range(n_traj):
        key, sub = jax.random.split(key)
        w0 = random_vorticity(sub, gen_res, scale=1.0)
        traj = solve_ns_2d(w0, 1.0, dt, steps, nu=nu,
                           substeps=max(20, int(200 * dt)), res_out=res)
        # solver layout [x, y] -> stored layout [y, x]
        frames.append(np.asarray(traj).transpose(0, 2, 1))
        log_fn(f"trajectory {i}: |w| max {np.abs(frames[-1]).max():.3f}")
    data = np.stack(frames, axis=-1).astype(np.float32)  # (T+1, res, res, N)
    np.save(out, data)
    log_fn(f"wrote FNO-format dataset {data.shape} to {out}")
    return out
