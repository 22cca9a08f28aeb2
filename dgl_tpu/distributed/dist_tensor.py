"""DistTensor / DistEmbedding (reference
``python/dgl/distributed/dist_tensor.py:21``,
``distributed/nn/pytorch/sparse_emb.py:9``).

The reference stores rows in a KVStore and pulls over RPC; here a DistTensor
is a mesh-sharded jax.Array — reads of arbitrary global rows lower to XLA
gather + collectives automatically under jit."""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["DistTensor", "DistEmbedding"]


class DistTensor:
    """Row-sharded tensor over a mesh axis."""

    def __init__(self, shape, dtype=jnp.float32, name=None, *,
                 mesh: Optional[Mesh] = None, axis: str = "gp",
                 init_func=None, data=None):
        self.name = name
        self._mesh = mesh
        self._axis = axis
        if data is None:
            data = (
                jnp.zeros(shape, dtype)
                if init_func is None
                else init_func(shape, dtype)
            )
        if mesh is not None:
            pad = (-shape[0]) % mesh.shape[axis]
            if pad:
                data = jnp.concatenate(
                    [data, jnp.zeros((pad,) + tuple(shape[1:]), dtype)]
                )
            data = jax.device_put(
                data, NamedSharding(mesh, P(axis, *([None] * (data.ndim - 1))))
            )
        self._data = data
        self._num_rows = shape[0]

    @property
    def shape(self):
        return (self._num_rows,) + tuple(self._data.shape[1:])

    @property
    def dtype(self):
        return self._data.dtype

    def __getitem__(self, idx):
        return self._data[idx]

    def __setitem__(self, idx, val):
        self._data = self._data.at[idx].set(val)

    def __len__(self):
        return self._num_rows

    @property
    def data(self):
        return self._data


class DistEmbedding(DistTensor):
    """Trainable sharded embedding table (reference ``sparse_emb.py:9``).

    Use with the row-sparse optimizers in ``dgl_tpu.nn.sparse_emb`` — under
    jit over the mesh, gathers/updates produce the same sparse all-to-all
    traffic pattern as the reference's NCCL path (``cuda/nccl.py:7``)."""

    def __init__(self, num_embeddings, embedding_dim, name=None, *,
                 mesh=None, axis: str = "gp", init_func=None, seed=0):
        if init_func is None:
            rng = np.random.default_rng(seed)

            def init_func(shape, dtype):
                return jnp.asarray(
                    rng.uniform(-1.0, 1.0, shape), dtype=dtype
                )

        super().__init__(
            (num_embeddings, embedding_dim), jnp.float32, name,
            mesh=mesh, axis=axis, init_func=init_func,
        )

    def __call__(self, ids):
        return self._data[ids]
