"""Atomic convolution (reference
``python/dgl/nn/pytorch/conv/atomicconv.py``, ACNN): radial-basis distance
filters pooled per neighbor atom type."""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ... import function as fn


class AtomicConv(nn.Module):
    """(reference ``atomicconv.py:57``).

    Inputs: ``feat`` (N, 1) atomic numbers, ``distances`` (E, 1).
    Output: (N, K) if ``features_to_use`` is None else (N, K * T) — per
    radial filter (and per atom type) summed radial responses.
    """

    interaction_cutoffs: tuple      # (K,)
    rbf_kernel_means: tuple         # (K,)
    rbf_kernel_scaling: tuple       # (K,)
    features_to_use: Optional[tuple] = None  # atom types (T,)

    @nn.compact
    def __call__(self, graph, feat, distances):
        cutoffs = jnp.asarray(self.interaction_cutoffs, jnp.float32)
        means = jnp.asarray(self.rbf_kernel_means, jnp.float32)
        scales = jnp.asarray(self.rbf_kernel_scaling, jnp.float32)
        d = jnp.asarray(distances).reshape(-1, 1)       # (E, 1)
        # radial symmetry functions with smooth cutoff (reference
        # ``radial_pooling``): e^{-gamma (d - mu)^2} * fc(d)
        rbf = jnp.exp(-scales[None, :] * (d - means[None, :]) ** 2)  # (E, K)
        fc = jnp.where(
            d < cutoffs[None, :],
            0.5 * (jnp.cos(jnp.pi * d / cutoffs[None, :]) + 1.0),
            0.0,
        )
        e = rbf * fc                                     # (E, K)
        with graph.local_scope() as g:
            if self.features_to_use is not None:
                types = jnp.asarray(self.features_to_use, jnp.float32)
                onehot = (
                    jnp.asarray(feat).reshape(-1, 1) == types[None, :]
                ).astype(jnp.float32)                    # (N, T)
                g.srcdata["t"] = onehot
                g.edata["e"] = e
                # per-edge outer product type x filter, summed to dst
                def msg(edges):
                    return {
                        "m": (
                            edges.src["t"][:, :, None]
                            * edges.data["e"][:, None, :]
                        )
                    }

                g.apply_edges(msg)
                g.update_all(fn.copy_e("m", "x"), fn.sum("x", "out"))
                out = g.dstdata["out"]                   # (N, T, K)
                return out.reshape(out.shape[0], -1)
            g.edata["e"] = e
            g.update_all(fn.copy_e("e", "x"), fn.sum("x", "out"))
            return g.dstdata["out"]


class RadialPooling(nn.Module):
    """Radial-basis pooling over interatomic distances (reference
    ``atomicconv.py:8`` RadialPooling): e_k = exp(-gamma (d - rc_mu)^2),
    gated by the cutoff rc_c."""

    interaction_cutoffs: jnp.ndarray   # (K,)
    rbf_kernel_means: jnp.ndarray      # (K,)
    rbf_kernel_scaling: jnp.ndarray    # (K,)

    def __call__(self, distances):
        d = jnp.asarray(distances)  # (E, 1)
        mu = jnp.asarray(self.rbf_kernel_means)[:, None, None]
        gamma = jnp.asarray(self.rbf_kernel_scaling)[:, None, None]
        rc = jnp.asarray(self.interaction_cutoffs)[:, None, None]
        rbf = jnp.exp(-gamma * (d[None] - mu) ** 2)
        gate = jnp.where(d[None] < rc, 1.0, 0.0)
        return rbf * gate  # (K, E, 1)


def msg_func(edges):
    """Message: distance-weighted source features (reference
    ``atomicconv.py:100``)."""
    return {"m": edges.src["hv"] * edges.data["he"]}


def reduce_func(nodes):
    """Reduce: sum the radial messages (reference ``atomicconv.py:126``)."""
    return {"hv_new": nodes.mailbox["m"].sum(axis=1)}
