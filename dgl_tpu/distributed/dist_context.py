"""Distributed bring-up (reference ``python/dgl/distributed/dist_context.py:208``).

The reference reads ``DGL_ROLE``/``DGL_IP_CONFIG`` and spawns server/client
processes over TCP; SPMD needs only ``jax.distributed`` process init (no-op
on a single host) — every process runs the same program, roles are implicit.
"""
from __future__ import annotations

import os
from typing import Optional

__all__ = ["initialize", "get_rank", "get_world_size", "exit_client"]

_initialized = False


def initialize(
    ip_config: Optional[str] = None,
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
):
    """Initialize multi-host JAX if configured; single-host is a no-op.

    ``ip_config`` is accepted for API parity with the reference but unused —
    topology comes from the TPU runtime / explicit coordinator args.
    """
    global _initialized
    if _initialized:
        return
    # tools/launch.py env plumbing (reference: DGL_ROLE/DGL_IP_CONFIG)
    if coordinator_address is None and "DGL_TPU_COORDINATOR" in os.environ:
        coordinator_address = os.environ["DGL_TPU_COORDINATOR"]
        num_processes = int(os.environ.get("DGL_TPU_NUM_PROCS", "1"))
        process_id = int(os.environ.get("DGL_TPU_PROC_ID", "0"))
    if coordinator_address is not None:
        import jax

        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    _initialized = True


def get_rank() -> int:
    import jax

    return jax.process_index()


def get_world_size() -> int:
    import jax

    return jax.process_count()


def exit_client():
    """API parity (reference ``dist_context.py:365``); nothing to tear down."""
    global _initialized
    _initialized = False
