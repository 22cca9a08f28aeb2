"""Principal Neighbourhood Aggregation conv (reference
``python/dgl/nn/pytorch/conv/pnaconv.py``): multiple aggregators x degree
scalers, combined by an MLP tower."""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ... import function as fn
from ...base import DGLError


def _aggregate(g, h_src, aggregator):
    g.srcdata["_pna_h"] = h_src
    if aggregator == "mean":
        g.update_all(fn.copy_u("_pna_h", "m"), fn.mean("m", "_pna_out"))
        return g.dstdata["_pna_out"]
    if aggregator == "sum":
        g.update_all(fn.copy_u("_pna_h", "m"), fn.sum("m", "_pna_out"))
        return g.dstdata["_pna_out"]
    if aggregator == "max":
        g.update_all(fn.copy_u("_pna_h", "m"), fn.max("m", "_pna_out"))
        return g.dstdata["_pna_out"]
    if aggregator == "min":
        g.update_all(fn.copy_u("_pna_h", "m"), fn.min("m", "_pna_out"))
        return g.dstdata["_pna_out"]
    if aggregator in ("var", "std"):
        g.update_all(fn.copy_u("_pna_h", "m"), fn.mean("m", "_mu"))
        g.srcdata["_pna_h2"] = h_src * h_src
        g.update_all(fn.copy_u("_pna_h2", "m"), fn.mean("m", "_mu2"))
        var = jnp.maximum(g.dstdata["_mu2"] - g.dstdata["_mu"] ** 2, 0.0)
        return jnp.sqrt(var + 1e-30) if aggregator == "std" else var
    if aggregator == "moment3":
        return _moment(g, h_src, 3)
    if aggregator == "moment4":
        return _moment(g, h_src, 4)
    if aggregator == "moment5":
        return _moment(g, h_src, 5)
    raise DGLError(f"Unknown PNA aggregator {aggregator!r}")


def _moment(g, h_src, n):
    g.srcdata["_pna_h"] = h_src
    g.update_all(fn.copy_u("_pna_h", "m"), fn.mean("m", "_mu"))
    mu = g.dstdata["_mu"]
    # E[(x - mu)^n] via messages
    g.dstdata["_mu_bcast"] = mu
    g.apply_edges(fn.u_sub_v("_pna_h", "_mu_bcast", "_diff"))
    g.edata["_diffn"] = g.edata["_diff"] ** n
    g.update_all(fn.copy_e("_diffn", "m"), fn.mean("m", "_mn"))
    mn = g.dstdata["_mn"]
    return jnp.sign(mn) * jnp.abs(mn + 1e-30) ** (1.0 / n)


class PNAConv(nn.Module):
    """(reference ``pnaconv.py:83``)."""

    in_feats: int
    out_feats: int
    aggregators: Sequence[str] = ("mean", "max", "min", "std")
    scalers: Sequence[str] = ("identity", "amplification", "attenuation")
    delta: float = 1.0
    dropout: float = 0.0
    num_towers: int = 1
    edge_feat_size: int = 0
    residual: bool = True

    @nn.compact
    def __call__(self, graph, feat, edge_feat=None, deterministic: bool = True):
        with graph.local_scope() as g:
            h = feat
            # per-edge message: concat/linear of (h_u [, e]) like the
            # reference tower pre-net (M = fc(h_u || e))
            if self.edge_feat_size > 0:
                if edge_feat is None:
                    raise DGLError("edge_feat required when edge_feat_size > 0")
                g.srcdata["_h"] = h
                g.edata["_e"] = edge_feat

                def cat_msg(edges):
                    return {
                        "m": jnp.concatenate(
                            [edges.src["_h"], edges.data["_e"]], axis=-1
                        )
                    }

                g.apply_edges(cat_msg)
                msg = nn.Dense(self.in_feats, name="pre_fc")(g.edata["m"])
                msg = jax.nn.leaky_relu(msg)
                g.edata["_m"] = msg
                # aggregate edge messages with each aggregator
                outs = []
                for agg in self.aggregators:
                    red = {"mean": fn.mean, "sum": fn.sum, "max": fn.max,
                           "min": fn.min}.get(agg)
                    if red is None:
                        raise DGLError(
                            f"aggregator {agg!r} unsupported with edge features"
                        )
                    g.update_all(fn.copy_e("_m", "x"), red("x", f"_o_{agg}"))
                    outs.append(g.dstdata[f"_o_{agg}"])
            else:
                outs = [_aggregate(g, h, a) for a in self.aggregators]
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


class PNAConvTower(nn.Module):
    """One PNA tower (reference ``pnaconv.py:97`` PNAConvTower): the
    M -> {aggregate x scale} -> U pipeline over a single feature group —
    :class:`PNAConv` with one tower and no cross-tower mixing."""

    in_size: int
    out_size: int
    aggregators: Sequence[str] = ("mean", "max", "min", "std")
    scalers: Sequence[str] = ("identity", "amplification", "attenuation")
    delta: float = 1.0
    dropout: float = 0.0
    edge_feat_size: int = 0

    @nn.compact
    def __call__(self, graph, feat, edge_feat=None,
                 deterministic: bool = True):
        return PNAConv(
            self.in_size, self.out_size, tuple(self.aggregators),
            tuple(self.scalers), self.delta, self.dropout,
            num_towers=1, edge_feat_size=self.edge_feat_size,
            residual=False,
        )(graph, feat, edge_feat, deterministic)
