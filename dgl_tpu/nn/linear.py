"""Typed/hetero linear layers (reference ``python/dgl/nn/pytorch/linear.py``)."""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
from flax import linen as nn

from ..ops import gather_mm, segment_mm


class TypedLinear(nn.Module):
    """Per-type linear transform (reference ``linear.py:13``).

    Lowered to ``segment_mm`` when rows are sorted by type, else the one-hot
    MXU ``gather_mm`` (reference dispatches the same way).
    """

    in_size: int
    out_size: int
    num_types: int
    regularizer: str = None
    num_bases: int = None

    @nn.compact
    def __call__(self, x, x_type, sorted_by_type: bool = False, seglen=None):
        if self.regularizer == "basis":
            nb = self.num_bases or self.num_types
            basis = self.param(
                "basis", nn.initializers.xavier_uniform(),
                (nb, self.in_size, self.out_size),
            )
            coeff = self.param(
                "coeff", nn.initializers.xavier_uniform(), (self.num_types, nb)
            )
            w = jnp.einsum("rb,bio->rio", coeff, basis)
        else:
            w = self.param(
                "weight", nn.initializers.xavier_uniform(),
                (self.num_types, self.in_size, self.out_size),
            )
        if sorted_by_type and seglen is not None:
            return segment_mm(x, w, seglen)
        return gather_mm(x, w, x_type)


class HeteroLinear(nn.Module):
    """Per-node-type linear (reference ``linear.py:123`` HeteroLinear)."""

    in_size: Dict[str, int]
    out_size: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, feat: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        out = {}
        for typ, x in feat.items():
            out[typ] = nn.Dense(
                self.out_size,
                use_bias=self.use_bias,
                kernel_init=nn.initializers.xavier_uniform(),
                name=f"linear_{typ}",
            )(x)
        return out


class HeteroEmbedding(nn.Module):
    """Per-type embedding tables (reference ``linear.py:197`` HeteroEmbedding)."""

    num_embeddings: Dict[str, int]
    embedding_dim: int

    @nn.compact
    def __call__(self, ids: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        out = {}
        for typ, idx in ids.items():
            emb = nn.Embed(
                self.num_embeddings[typ],
                self.embedding_dim,
                name=f"embed_{typ}",
            )
            out[typ] = emb(idx)
        return out


def matmul_maybe_select(A, B):
    """A @ B, or an embedding-style row-select when A is an int index
    vector (reference ``python/dgl/nn/pytorch/utils.py:14``)."""
    A = jnp.asarray(A)
    if jnp.issubdtype(A.dtype, jnp.integer):
        return jnp.asarray(B)[A]
    return A @ jnp.asarray(B)


def bmm_maybe_select(A, B, index):
    """Batched per-type matmul A[i] @ B[index[i]], with the int-A
    row-select fast path (reference ``nn/pytorch/utils.py:54``)."""
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    index = jnp.asarray(index)
    if jnp.issubdtype(A.dtype, jnp.integer):
        # gather one weight ROW per (type, id) pair
        return B[index, A]
    BB = B[index]  # (N, D_in, D_out)
    return jnp.einsum("nd,ndo->no", A, BB)


__all__ = ["TypedLinear", "HeteroLinear", "HeteroEmbedding", "matmul_maybe_select", "bmm_maybe_select"]
