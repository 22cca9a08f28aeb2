"""Device-mesh construction helpers.

Replaces the reference's process-group bring-up (``dist_context.py:208``,
``DGL_ROLE``/``DGL_IP_CONFIG`` env plumbing) with a one-call mesh factory:
topology comes from ``jax.devices()``, roles are implicit in SPMD.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


@dataclass(frozen=True)
class MeshAxes:
    """Canonical axis names used across dgl_tpu.parallel."""

    dp: str = "dp"  # data parallel (minibatch / seed-node sharding)
    tp: str = "tp"  # tensor parallel (embedding rows, wide hidden dims)
    gp: str = "gp"  # graph-partition parallel (node-partition shards + halo)


AXES = MeshAxes()


def create_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Tuple[str, ...] = ("dp", "tp"),
    *,
    devices=None,
) -> Mesh:
    """Create a Mesh over available devices.

    ``shape=None`` puts all devices on the first axis. A ``-1`` entry is
    inferred from the device count (like a reshape).
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if shape is None:
        shape = [n] + [1] * (len(axis_names) - 1)
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1]))
        shape[shape.index(-1)] = n // known
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    dev_array = np.array(devices).reshape(shape)
    return Mesh(dev_array, axis_names)
