"""Directional Graph Network conv (reference
``python/dgl/nn/pytorch/conv/dgnconv.py``): PNA-style multi-aggregator
layer plus directional aggregators along the gradient of Laplacian
eigenvectors (``ndata['eig']`` from ``dgl.lap_pe``)."""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ... import function as fn
from ...base import DGLError


class DGNConv(nn.Module):
    """(reference ``dgnconv.py:99``).

    ``aggregators``: subset of {mean, sum, max, min, dir<k>-av, dir<k>-dx}
    where k indexes a column of the eig features.
    """

    in_feats: int
    out_feats: int
    aggregators: Sequence[str] = ("mean", "dir1-av", "dir1-dx")
    scalers: Sequence[str] = ("identity",)
    delta: float = 1.0
    dropout: float = 0.0
    edge_feat_size: int = 0
    residual: bool = True
    eps: float = 1e-8

    @nn.compact
    def __call__(self, graph, feat, eig=None, edge_feat=None,
                 deterministic: bool = True):
        with graph.local_scope() as g:
            g.srcdata["_h"] = feat
            outs = []
            dir_cache = {}
            for agg in self.aggregators:
                if agg.startswith("dir"):
                    if eig is None:
                        raise DGLError("directional aggregators need eig")
                    head, kind = agg.split("-")
                    k = int(head[3:]) - 1
                    if k not in dir_cache:
                        g.srcdata["_eig"] = eig[:, k : k + 1]
                        g.dstdata["_eig"] = eig[: g.num_dst_nodes(), k : k + 1]
                        g.apply_edges(fn.u_sub_v("_eig", "_eig", "_F"))
                        F_e = g.edata["_F"]            # (E, 1)
                        g.edata["_absF"] = jnp.abs(F_e)
                        g.update_all(fn.copy_e("_absF", "m"),
                                     fn.sum("m", "_normF"))
                        dir_cache[k] = (F_e, g.dstdata["_normF"])
                    F_e, normF = dir_cache[k]
                    w = jnp.abs(F_e) if kind == "av" else F_e
                    g.edata["_w"] = w
                    g.update_all(fn.u_mul_e("_h", "_w", "m"), fn.sum("m", "_o"))
                    outs.append(g.dstdata["_o"] / (normF + self.eps))
                elif agg == "mean":
                    g.update_all(fn.copy_u("_h", "m"), fn.mean("m", "_o"))
                    outs.append(g.dstdata["_o"])
                elif agg == "sum":
                    g.update_all(fn.copy_u("_h", "m"), fn.sum("m", "_o"))
                    outs.append(g.dstdata["_o"])
                elif agg == "max":
                    g.update_all(fn.copy_u("_h", "m"), fn.max("m", "_o"))
                    outs.append(g.dstdata["_o"])
                elif agg == "min":
                    g.update_all(fn.copy_u("_h", "m"), fn.min("m", "_o"))
                    outs.append(g.dstdata["_o"])
                else:
                    raise DGLError(f"Unknown DGN aggregator {agg!r}")
            stacked = jnp.concatenate(outs, axis=-1)
            deg = jnp.maximum(g.in_degrees().astype(stacked.dtype), 1)[:, None]
            scaled = []
            for s in self.scalers:
                if s == "identity":
                    scaled.append(stacked)
                elif s == "amplification":
                    scaled.append(stacked * (jnp.log(deg + 1) / self.delta))
                elif s == "attenuation":
                    scaled.append(stacked * (self.delta / jnp.log(deg + 1)))
                else:
                    raise DGLError(f"Unknown scaler {s!r}")
            combined = jnp.concatenate(scaled, axis=-1)
            n_dst = combined.shape[0]
            inp = jnp.concatenate([feat[:n_dst], combined], axis=-1)
            out = nn.Dense(self.out_feats, name="post_fc")(inp)
            if self.dropout > 0 and not deterministic:
                out = nn.Dropout(self.dropout, deterministic=False)(out)
            if self.residual and self.in_feats == self.out_feats:
                out = out + feat[:n_dst]
            return out


class DGNConvTower(nn.Module):
    """One DGN tower (reference ``dgnconv.py`` DGNConvTower): a
    single-group :class:`DGNConv` without cross-tower mixing."""

    in_size: int
    out_size: int
    aggregators: Sequence[str] = ("mean", "dir1-av", "dir1-dx")
    scalers: Sequence[str] = ("identity",)
    delta: float = 1.0
    dropout: float = 0.0
    edge_feat_size: int = 0

    @nn.compact
    def __call__(self, graph, feat, eig=None, edge_feat=None,
                 deterministic: bool = True):
        return DGNConv(
            self.in_size, self.out_size, tuple(self.aggregators),
            tuple(self.scalers), self.delta, self.dropout,
            edge_feat_size=self.edge_feat_size, residual=False,
        )(graph, feat, eig, edge_feat, deterministic)
