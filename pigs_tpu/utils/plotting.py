"""Visualization: Gaussian ellipse plots and field renders.

Equivalent of the reference's ``plot_gaussians`` (gaussians.py:13-46) and the
frame-dump loops (main_pn.py:461-479); pure host-side matplotlib on numpy copies.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

__all__ = ["plot_gaussians", "save_field_frames"]


def plot_gaussians(means, covariances_packed, values, scale: float = 1.0,
                   active=None):
    """Ellipse plot of a 2D mixture colored by value channel 0.

    ``covariances_packed`` is ``(n, 3)`` [xx, xy, yy] packed storage.  Returns the
    matplotlib figure.
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import Ellipse
    from matplotlib.transforms import Affine2D

    means = np.asarray(means)
    values = np.asarray(values)
    cov = np.asarray(covariances_packed)
    if active is not None:
        sel = np.asarray(active)
        means, values, cov = means[sel], values[sel], cov[sel]
    n = means.shape[0]

    affine = np.zeros((n, 3, 3))
    affine[:, 0, 0] = cov[:, 0]
    affine[:, 0, 1] = cov[:, 1]
    affine[:, 1, 0] = cov[:, 1]
    affine[:, 1, 1] = cov[:, 2]
    affine[:, 2, 2] = 1.0

    fig = plt.figure()
    ax = fig.gca()
    vmin = float(values.min()) if n else 0.0
    vmax = float(values.max()) if n else 1.0
    cmap = matplotlib.colormaps["viridis"]
    for i in range(n):
        v = (values[i, 0] - vmin) / (vmax if vmax else 1.0)
        e = Ellipse(xy=(0.0, 0.0), width=10.0, height=10.0, fc=cmap(v),
                    alpha=0.25)
        t = Affine2D(affine[i]).translate(*means[i, :2])
        e.set_transform(t + ax.transData)
        ax.add_patch(e)
    ax.axis((-scale * 1.25, scale * 1.25, -scale * 1.25, scale * 1.25))
    ax.set_aspect("equal", adjustable="box")
    return fig


def save_field_frames(frames: np.ndarray, directory: str,
                      prefix: str = "frame",
                      vmin: Optional[float] = None,
                      vmax: Optional[float] = None) -> None:
    """Dump ``(t, c, h, w)`` field frames as PNGs (main_pn.py:461-479)."""
    import os

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(directory, exist_ok=True)
    frames = np.asarray(frames)
    vmin = float(frames.min()) if vmin is None else vmin
    vmax = float(frames.max()) if vmax is None else vmax
    for i, frame in enumerate(frames):
        fig = plt.figure()
        if frame.shape[0] == 2:
            axes = fig.subplots(1, 2)
            for ch in range(2):
                im = axes[ch].imshow(frame[ch], vmin=vmin, vmax=vmax)
                plt.colorbar(im, ax=axes[ch])
                axes[ch].axis("off")
        else:
            plt.imshow(frame[0], vmin=vmin, vmax=vmax)
            plt.colorbar()
            plt.axis("off")
        fig.savefig(os.path.join(directory, f"{prefix}{i}.png"),
                    bbox_inches="tight")
        plt.close(fig)
