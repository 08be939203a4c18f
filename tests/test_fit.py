"""Fit-to-target initializer converges on analytic targets (test_initialize.py
behavioral analog, small scale)."""

import jax
import jax.numpy as jnp
import numpy as np

from pigs_tpu.ops.mixture import eval_mixture
from pigs_tpu.train.fit import (FitConfig, fit, gaussian_pair_target,
                                image_target, sinusoid_target)
from pigs_tpu.train.no_mlp import RawParams
from pigs_tpu import gaussians


def small_cfg(**kw):
    defaults = dict(d=2, nx=12, capacity=256, n_samples=256, block_iters=50,
                    iters=400, dtype=jnp.float32)
    defaults.update(kw)
    return FitConfig(**defaults)


def test_fit_gaussian_pair():
    cfg = small_cfg()
    params, active, losses = fit(cfg, gaussian_pair_target(cfg),
                                 jax.random.PRNGKey(0))
    assert losses[-1] < 0.25 * losses[0], losses
    assert losses[-1] < 0.02, losses[-1]


def test_fit_with_split_and_jitter_stays_finite():
    cfg = small_cfg(split_every_blocks=4, jitter_every_blocks=7, iters=500)
    params, active, losses = fit(cfg, sinusoid_target(),
                                 jax.random.PRNGKey(1))
    assert np.isfinite(losses).all()
    assert int(np.asarray(active).sum()) >= 1


def test_image_target_lookup():
    img = jnp.zeros((8, 8)).at[:, 4:].set(1.0)
    f = image_target(img)
    samples = jnp.array([[-0.9, 0.0], [0.9, 0.0]])
    got = np.asarray(f(samples))
    # x>0 maps to right half of image (columns >= 4) -> 1.
    np.testing.assert_allclose(got, [0.0, 1.0])


def test_curl_fit_periodic_consistency():
    """A periodic curl fit must score well when evaluated ON THE TORUS
    (period=2) — the convention every downstream NS consumer uses
    (main_pn.py:58 GaussianSampler(True)).  Round-3's NS validation found
    the fit evaluating free-space while the pipeline evaluated periodically:
    t=0 vorticity rel-L2 0.467 instead of 0.068."""
    from pigs_tpu.train.ns_data import fit_fno_trajectory
    from pigs_tpu.utils.fd import random_vorticity

    res = 24
    frame = np.asarray(random_vorticity(jax.random.PRNGKey(5), res))
    m, v, s, t, loss = fit_fno_trajectory(jnp.asarray(frame), nx=8, iters=400)
    _, conics = gaussians.build_full_covariances(jnp.asarray(s),
                                                 jnp.asarray(t))
    centers = (jnp.arange(res) + 0.5) / res * 2.0 - 1.0
    gx, gy = jnp.meshgrid(centers, centers, indexing="ij")
    samples = jnp.stack([gx, gy], -1).reshape(-1, 2)
    out = eval_mixture(jnp.asarray(m), conics, jnp.asarray(v), samples,
                       order=1, diff_samples=False, period=2.0)
    w = np.asarray(out.ux[:, 0, 1] - out.ux[:, 1, 0]).reshape(res, res).T
    rel = np.linalg.norm(w - frame) / np.linalg.norm(frame)
    assert rel < 0.4, f"periodic render rel-L2 {rel}"
