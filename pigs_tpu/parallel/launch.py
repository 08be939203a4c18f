"""Multi-host initialization for pod-slice runs.

The reference is single-process (SURVEY.md §2.2); on a TPU pod slice each host
runs the same program and must join the global runtime before building meshes.
Call :func:`initialize_distributed` first thing in a multi-host driver; it is a
safe no-op in single-process environments (including this build container).
"""

from __future__ import annotations

import os
from typing import Optional

import jax

__all__ = ["initialize_distributed", "is_multihost", "host_summary"]


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Join the jax distributed runtime when running multi-host.

    With no arguments, relies on the TPU environment auto-detection
    (``jax.distributed.initialize()`` discovers the coordinator on Cloud TPU).
    Returns True if distributed mode was initialized.
    """
    already = jax.process_count() > 1
    if already:
        return True
    env_says_multihost = any(
        os.environ.get(k) for k in
        ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
         "MEGASCALE_COORDINATOR_ADDRESS"))
    if coordinator_address is None and not env_says_multihost:
        return False  # single process: nothing to do
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def is_multihost() -> bool:
    return jax.process_count() > 1


def host_summary() -> str:
    return (f"process {jax.process_index()}/{jax.process_count()}, "
            f"{jax.local_device_count()} local / {jax.device_count()} global "
            f"devices")
