"""SPMD training-step helpers: dp-sharded batches, tp-sharded params.

Replaces the reference's torch-DDP gradient plane
(``examples/distributed/graphsage/node_classification.py:346``) and sharded
``DistEmbedding`` (``python/dgl/distributed/nn/pytorch/sparse_emb.py:9``):
gradients are reduced by XLA-inserted collectives under ``jit`` over the
mesh, and embedding tables shard by row over the ``tp`` axis.
"""
from __future__ import annotations

import re
from typing import Callable, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_batch(mesh: Mesh, tree, axis: str = "dp"):
    """Put a pytree on the mesh, sharding every leaf's leading dim over ``axis``.

    Scalars / 0-d leaves are replicated. The leading dim must divide evenly by
    the axis size (the fixed-shape padded batches from the dataloader ensure
    this by construction).
    """

    def put(x):
        x = jnp.asarray(x)
        if x.ndim == 0 or x.shape[0] % mesh.shape[axis] != 0:
            spec = P()
        else:
            spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree across the whole mesh."""
    s = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(jnp.asarray(x), s), tree)


def param_shardings(mesh: Mesh, params, rules: Dict[str, P]):
    """Map param-path regexes to PartitionSpecs; unmatched params replicate.

    ``rules`` e.g. ``{r"embedding": P("tp", None), r"sage0/.*kernel": P(None, "tp")}``.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def spec_for(path):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        for pat, spec in rules.items():
            if re.search(pat, name):
                return spec
        return P()

    specs = {
        jax.tree_util.keystr(path): spec_for(path) for path, _ in flat
    }

    def assign(path, x):
        return jax.device_put(
            x, NamedSharding(mesh, specs[jax.tree_util.keystr(path)])
        )

    return jax.tree_util.tree_map_with_path(assign, params)


def sharded_train_step(
    mesh: Mesh,
    loss_fn: Callable,
    optimizer,
    *,
    donate: bool = True,
) -> Callable:
    """Build a jitted SPMD train step over ``mesh``.

    ``loss_fn(params, batch) -> scalar``. The returned
    ``step(params, opt_state, batch) -> (params, opt_state, loss)`` is
    compiled with ``jit`` over the mesh; XLA inserts gradient allreduce
    over ``dp`` and tp collectives from the param shardings automatically.
    """

    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    donate_argnums = (0, 1) if donate else ()
    # NamedSharding on the inputs carries the mesh; no mesh context needed.
    return jax.jit(step, donate_argnums=donate_argnums)
