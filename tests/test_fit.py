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
