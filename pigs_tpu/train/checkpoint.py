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
                    training_loss, ema_params: Any = None) -> None:
    """Save params + optimizer state + loss history (the reference's
    torch.save dict {epoch, model, optimizer, training_loss},
    main_pn.py:258-264).  ``ema_params``: optional EMA shadow of the
    parameters (TrainConfig.ema_decay), stored as its own item."""
    with _manager(directory) as mgr:
        args = dict(
            params=ocp.args.StandardSave(params),
            training_loss=ocp.args.ArraySave(np.asarray(training_loss,
                                                        dtype=np.float64)),
        )
        if opt_state is not None:
            args["opt_state"] = ocp.args.StandardSave(opt_state)
        if ema_params is not None:
            args["ema_params"] = ocp.args.StandardSave(ema_params)
        mgr.save(step, args=ocp.args.Composite(**args))
        mgr.wait_until_finished()


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    with _manager(directory) as mgr:
        return mgr.latest_step()


def restore_checkpoint(directory: str, params_template: Any,
                       opt_state_template: Any = None):
    """Restore the latest checkpoint.

    Returns ``(step, params, training_loss)`` or, when an optimizer-state
    template is given and the checkpoint carries one,
    ``(step, params, opt_state, training_loss)`` (the reference restores the
    optimizer too, main_pn.py:66-73).  When the checkpoint additionally
    carries EMA parameters, they are appended as a final tuple element."""
    with _manager(directory) as mgr:
        step = mgr.latest_step()
        if step is None:
            return None
        root = os.path.abspath(directory)
        args = dict(
            params=ocp.args.StandardRestore(params_template),
            training_loss=ocp.args.ArrayRestore(),
        )
        has_opt = (opt_state_template is not None and os.path.isdir(
            os.path.join(root, str(step), "opt_state")))
        if has_opt:
            args["opt_state"] = ocp.args.StandardRestore(opt_state_template)
        # EMA params ride along only in the full (with-optimizer) restore —
        # appending them to the 3-tuple form would make it ambiguous with the
        # 4-tuple (step, params, opt_state, loss) form.
        has_ema = has_opt and os.path.isdir(
            os.path.join(root, str(step), "ema_params"))
        if has_ema:
            args["ema_params"] = ocp.args.StandardRestore(params_template)
        out = mgr.restore(step, args=ocp.args.Composite(**args))
        loss = list(np.asarray(out["training_loss"]))
        parts = ((step, out["params"], out["opt_state"], loss) if has_opt
                 else (step, out["params"], loss))
        return parts + (out["ema_params"],) if has_ema else parts
