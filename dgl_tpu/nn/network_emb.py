"""Shallow network embeddings (reference
``python/dgl/nn/pytorch/network_emb.py``): DeepWalk and MetaPath2Vec —
skip-gram over random walks with negative sampling.

TPU design: walk generation on host (``dgl_tpu.sampling.random_walk``),
the skip-gram objective as a jit-compiled batch step.
"""
from __future__ import annotations


import jax
import numpy as np
from flax import linen as nn

from ..sampling import random_walk


class DeepWalk(nn.Module):
    """(reference ``network_emb.py:21``).

    Use ``sample_batch`` to draw (target, context, negative) index batches on
    host, and the module's ``__call__`` to compute the skip-gram loss.
    """

    num_nodes: int
    emb_dim: int = 128
    walk_length: int = 40
    window_size: int = 5
    neg_weight: float = 1.0
    negative_size: int = 1
    sparse: bool = True  # kept for API parity; JAX grads are dense segments

    @nn.compact
    def __call__(self, targets, contexts, negatives):
        emb = nn.Embed(
            self.num_nodes, self.emb_dim,
            embedding_init=nn.initializers.uniform(scale=1.0),
            name="node_embed",
        )
        ctx = nn.Embed(
            self.num_nodes, self.emb_dim,
            embedding_init=nn.initializers.zeros,
            name="context_embed",
        )
        t = emb(targets)
        pos = (t * ctx(contexts)).sum(-1)
        neg = (t[:, None, :] * ctx(negatives)).sum(-1)
        pos_loss = -jax.nn.log_sigmoid(pos).mean()
        neg_loss = -jax.nn.log_sigmoid(-neg).mean() * self.neg_weight
        return pos_loss + neg_loss

    def sample_batch(self, g, seeds, rng: np.random.Generator):
        """Host-side (target, context, negative) batch from random walks."""
        traces, _ = random_walk(
            g, seeds, length=self.walk_length,
            seed=int(rng.integers(2**31)),
        )
        tgt, ctxs = [], []
        L = traces.shape[1]
        for row in traces:
            for i in range(L):
                if row[i] < 0:
                    break
                for j in range(
                    max(0, i - self.window_size),
                    min(L, i + self.window_size + 1),
                ):
                    if j == i or row[j] < 0:
                        continue
                    tgt.append(row[i])
                    ctxs.append(row[j])
        tgt = np.array(tgt, np.int32)
        ctxs = np.array(ctxs, np.int32)
        negs = rng.integers(
            0, self.num_nodes, (tgt.shape[0], self.negative_size)
        ).astype(np.int32)
        return tgt, ctxs, negs


class MetaPath2Vec(nn.Module):
    """(reference ``network_emb.py:231``): DeepWalk over metapath-guided
    walks on a heterograph; one embedding table over all nodes (offset per
    ntype)."""

    num_nodes_total: int
    emb_dim: int = 128
    window_size: int = 5
    negative_size: int = 5

    @nn.compact
    def __call__(self, targets, contexts, negatives):
        emb = nn.Embed(
            self.num_nodes_total, self.emb_dim,
            embedding_init=nn.initializers.uniform(scale=1.0),
            name="node_embed",
        )
        ctx = nn.Embed(
            self.num_nodes_total, self.emb_dim,
            embedding_init=nn.initializers.zeros,
            name="context_embed",
        )
        t = emb(targets)
        pos = (t * ctx(contexts)).sum(-1)
        neg = (t[:, None, :] * ctx(negatives)).sum(-1)
        return (
            -jax.nn.log_sigmoid(pos).mean()
            - jax.nn.log_sigmoid(-neg).mean()
        )

    @staticmethod
    def type_offsets(g):
        """Global-id offsets per ntype (homogeneous-ID encoding like the
        reference's ``local_to_global_nid``)."""
        offs = {}
        total = 0
        for nt in g.ntypes:
            offs[nt] = total
            total += g.num_nodes(nt)
        return offs, total

    def sample_batch(self, g, seeds, metapath, rng: np.random.Generator):
        offs, _ = MetaPath2Vec.type_offsets(g)
        traces, types, _ = random_walk(
            g, seeds, metapath=metapath, return_eids=True,
            seed=int(rng.integers(2**31)),
        )
        ntype_names = list(g.ntypes)
        off_per_step = np.array(
            [offs[ntype_names[int(t)]] for t in types], np.int64
        )
        glob = np.where(traces >= 0, traces + off_per_step[None, :], -1)
        tgt, ctxs = [], []
        L = glob.shape[1]
        for row in glob:
            for i in range(L):
                if row[i] < 0:
                    break
                for j in range(
                    max(0, i - self.window_size),
                    min(L, i + self.window_size + 1),
                ):
                    if j == i or row[j] < 0:
                        continue
                    tgt.append(row[i])
                    ctxs.append(row[j])
        tgt = np.array(tgt, np.int32)
        ctxs = np.array(ctxs, np.int32)
        negs = rng.integers(
            0, self.num_nodes_total, (tgt.shape[0], self.negative_size)
        ).astype(np.int32)
        return tgt, ctxs, negs
