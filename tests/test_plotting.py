"""Host-side visualization utilities (reference gaussians.py:13-46 ellipse
plot; main_pn.py:461-479 frame dumps)."""

import json
import os

import numpy as np

from pigs_tpu.utils.plotting import (plot_gaussians, render_rollout_artifacts,
                                     save_field_frames)


def test_plot_gaussians_ellipse_geometry(tmp_path):
    """Axis-aligned covariance -> ellipse axes = 10*eigenvalues at angle 0;
    the active mask filters rows; n=0 renders an empty figure."""
    means = np.array([[0.2, -0.3], [5.0, 5.0]])
    cov = np.array([[0.4, 0.0, 0.1],   # diag(0.4, 0.1): eigvals 0.1, 0.4
                    [1.0, 0.0, 1.0]])
    vals = np.array([[1.0], [2.0]])
    fig = plot_gaussians(means, cov, vals, scale=1.0,
                         active=np.array([True, False]))
    coll = fig.gca().collections[0]
    assert coll.get_offsets().shape == (1, 2)   # masked row dropped
    np.testing.assert_allclose(coll.get_offsets()[0], means[0])
    # EllipseCollection stores full axis lengths (widths, heights).
    w = np.asarray(coll._widths).ravel() * 2    # stored as half-extents
    h = np.asarray(coll._heights).ravel() * 2
    np.testing.assert_allclose(sorted([w[0], h[0]]), [1.0, 4.0], atol=1e-12)
    fig.savefig(os.path.join(tmp_path, "ellipses.png"))

    empty = plot_gaussians(np.zeros((0, 2)), np.zeros((0, 3)),
                           np.zeros((0, 1)))
    assert empty.gca().get_xlim() == (-1.25, 1.25)


def test_save_field_frames_and_rollout_artifacts(tmp_path):
    frames = np.random.default_rng(0).normal(size=(3, 1, 8, 8))
    save_field_frames(frames, str(tmp_path / "frames"))
    assert sorted(os.listdir(tmp_path / "frames")) == [
        f"frame{i}.png" for i in range(3)]

    d = tmp_path / "results"
    os.makedirs(d)
    np.save(d / "rollout_frames.npy", frames)
    np.save(d / "fd_gt_frames.npy", frames + 0.1)
    with open(d / "summary.json", "w") as f:
        json.dump({"problem": "burgers", "mean_rel_norm": 0.1,
                   "per_step_rel_norm": [0.0, 0.1, 0.2]}, f)
    written = render_rollout_artifacts(str(d))
    assert sorted(os.path.basename(w) for w in written) == [
        "rollout_panel.png", "rollout_rel_norm.png"]
    assert render_rollout_artifacts(str(tmp_path / "missing")) == []
