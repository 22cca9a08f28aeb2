"""Training-state checkpointing (SURVEY.md §5.4 build plan: orbax for
model/optimizer state; the reference leaves this to torch.save).

Uses orbax-checkpoint when available, falling back to a numpy .npz flat
format with identical semantics for the common (pytree of arrays) case.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint"]


def _try_orbax():
    try:
        import orbax.checkpoint as ocp  # type: ignore

        return ocp
    except Exception:
        return None


def save_checkpoint(path: str, state: Any, *, step: Optional[int] = None,
                    force: bool = True, use_orbax: bool = False):
    """Save a pytree of arrays. Default: portable flat-npz format (fast,
    works on remote-device setups where orbax's async machinery stalls).
    ``use_orbax=True`` opts into orbax (needed for multi-host sharded
    state)."""
    ocp = _try_orbax() if use_orbax else None
    if ocp is not None:
        path = os.path.abspath(path)
        ckpt = ocp.PyTreeCheckpointer()
        ckpt.save(path, state, force=force)
        return path
    # flat npz fallback
    flat, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)}
    arrays["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8
    )
    if step is not None:
        arrays["__step__"] = np.asarray(int(step))
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    np.savez(path if path.endswith(".npz") else path + ".npz", **arrays)
    return path


def load_checkpoint(path: str, target: Any = None, *, use_orbax: bool = False,
                    return_step: bool = False):
    """Load a checkpoint; ``target`` (an example pytree) restores structure
    for the npz format and dtypes/shardings for orbax. With
    ``return_step=True`` returns ``(state, step)`` (step is None when the
    checkpoint was saved without one)."""
    ocp = _try_orbax() if (use_orbax or os.path.isdir(path)) else None
    if ocp is not None and os.path.isdir(path):
        ckpt = ocp.PyTreeCheckpointer()
        if target is not None:
            return ckpt.restore(os.path.abspath(path), item=target)
        return ckpt.restore(os.path.abspath(path))
    f = path if path.endswith(".npz") else path + ".npz"
    with np.load(f) as z:
        n_leaves = sum(1 for k in z.files if k.startswith("leaf_"))
        leaves = [z[f"leaf_{i}"] for i in range(n_leaves)]
        step = int(z["__step__"]) if "__step__" in z.files else None
    if target is None:
        raise ValueError("npz checkpoint restore requires a target pytree")
    treedef = jax.tree_util.tree_structure(target)
    import jax.numpy as jnp

    state = jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(x) for x in leaves]
    )
    return (state, step) if return_step else state
