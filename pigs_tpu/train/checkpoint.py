"""Checkpoint save/restore via orbax (the reference uses torch.save dicts every
100 epochs with resume-by-argv, main_pn.py:258-277 and 66-73)."""

from __future__ import annotations

import os
from typing import Any, Optional

import numpy as np
import orbax.checkpoint as ocp

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step"]


def _manager(directory: str) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=3, create=True),
    )


def save_checkpoint(directory: str, step: int, params: Any, opt_state: Any,
                    training_loss) -> None:
    with _manager(directory) as mgr:
        mgr.save(step, args=ocp.args.Composite(
            params=ocp.args.StandardSave(params),
            training_loss=ocp.args.ArraySave(np.asarray(training_loss,
                                                        dtype=np.float64)),
        ))
        mgr.wait_until_finished()


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    with _manager(directory) as mgr:
        return mgr.latest_step()


def restore_checkpoint(directory: str, params_template: Any):
    """Restore the latest checkpoint; returns (step, params, training_loss)."""
    with _manager(directory) as mgr:
        step = mgr.latest_step()
        if step is None:
            return None
        out = mgr.restore(step, args=ocp.args.Composite(
            params=ocp.args.StandardRestore(params_template),
            training_loss=ocp.args.ArrayRestore(),
        ))
        return step, out["params"], list(np.asarray(out["training_loss"]))
