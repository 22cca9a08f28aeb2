"""Module (callable) transforms (reference ``python/dgl/transforms/module.py``).

Each transform is a callable object ``t(g) -> g'`` composable with
``Compose`` (reference ``module.py:64``).
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..base import DGLError
from ..graph import Graph
from . import functional as F

__all__ = [
    "BaseTransform",
    "Compose",
    "AddSelfLoop",
    "RemoveSelfLoop",
    "AddReverse",
    "ToSimple",
    "KHopGraph",
    "GCNNorm",
    "FeatMask",
    "RowFeatNormalizer",
    "DropNode",
    "DropEdge",
    "AddEdge",
    "RandomWalkPE",
    "LapPE",
    "GDC",
    "SIGNDiffusion",
]


class BaseTransform:
    """Transform base (reference ``module.py:49``)."""

    def __call__(self, g: Graph) -> Graph:
        raise NotImplementedError

    def __repr__(self):
        return self.__class__.__name__ + "()"


class Compose(BaseTransform):
    """Apply transforms in sequence (reference ``module.py:64``)."""

    def __init__(self, transforms: Sequence[Callable]):
        self.transforms = list(transforms)

    def __call__(self, g):
        for t in self.transforms:
            g = t(g)
        return g


class AddSelfLoop(BaseTransform):
    """(reference ``module.py:101``)."""

    def __init__(self, allow_duplicate=False, new_etypes=False, edge_feat_names=None, fill_data=1.0):
        self.allow_duplicate = allow_duplicate
        self.edge_feat_names = edge_feat_names
        self.fill_data = fill_data

    def __call__(self, g):
        for cet in g.canonical_etypes:
            if cet[0] != cet[2]:
                continue
            if not self.allow_duplicate:
                g = F.remove_self_loop(g, etype=cet)
            g = F.add_self_loop(
                g, edge_feat_names=self.edge_feat_names,
                fill_data=self.fill_data, etype=cet,
            )
        return g


class RemoveSelfLoop(BaseTransform):
    def __call__(self, g):
        for cet in g.canonical_etypes:
            if cet[0] == cet[2]:
                g = F.remove_self_loop(g, etype=cet)
        return g


class AddReverse(BaseTransform):
    """(reference ``module.py:328``)."""

    def __init__(self, copy_edata=False, sym_new_etype=False):
        self.copy_edata = copy_edata

    def __call__(self, g):
        return F.add_reverse_edges(g, copy_edata=self.copy_edata)


class ToSimple(BaseTransform):
    def __init__(self, return_counts="count"):
        self.return_counts = return_counts

    def __call__(self, g):
        return F.to_simple(g, return_counts=self.return_counts)


class KHopGraph(BaseTransform):
    def __init__(self, k: int):
        self.k = k

    def __call__(self, g):
        return F.khop_graph(g, self.k)


class GCNNorm(BaseTransform):
    """Symmetric GCN normalization weights (reference ``module.py:1119``):
    w_uv = 1/sqrt(d_out(u) d_in(v)), stored in ``edata['w']``."""

    def __init__(self, eweight_name: str = "w"):
        self.eweight_name = eweight_name

    def __call__(self, g):
        cet = g.to_canonical_etype(None)
        rel = g._relations[cet]
        if self.eweight_name in g._edge_frames.get(cet, {}):
            w = g._edge_frames[cet][self.eweight_name]
            deg = jax.ops.segment_sum(w, rel.dst, num_segments=rel.num_dst)
            out_deg = jax.ops.segment_sum(w, rel.src, num_segments=rel.num_src)
        else:
            deg = rel.in_degrees().astype(jnp.float32)
            out_deg = rel.out_degrees().astype(jnp.float32)
            w = jnp.ones((rel.num_edges_padded,), jnp.float32)
        dinv = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
        oinv = jnp.where(out_deg > 0, jax.lax.rsqrt(jnp.maximum(out_deg, 1e-12)), 0.0)
        pad_src = jnp.minimum(rel.src, rel.num_src - 1)
        pad_dst = jnp.minimum(rel.dst, rel.num_dst - 1)
        new_w = w * oinv[pad_src] * dinv[pad_dst]
        g._edge_frames.setdefault(cet, {})[self.eweight_name] = new_w
        return g


class FeatMask(BaseTransform):
    """Randomly zero feature columns (reference ``module.py:1576``)."""

    def __init__(self, p=0.5, node_feat_names=None, edge_feat_names=None, seed=0):
        self.p = p
        self.node_feat_names = node_feat_names or []
        self.edge_feat_names = edge_feat_names or []
        self._rng = np.random.default_rng(seed)

    def __call__(self, g):
        for nt, frame in g._node_frames.items():
            for k in list(frame):
                if k in self.node_feat_names:
                    v = frame[k]
                    mask = self._rng.random(v.shape[-1]) < self.p
                    frame[k] = jnp.where(jnp.asarray(mask), 0, v)
        for cet, frame in g._edge_frames.items():
            for k in list(frame):
                if k in self.edge_feat_names:
                    v = frame[k]
                    mask = self._rng.random(v.shape[-1]) < self.p
                    frame[k] = jnp.where(jnp.asarray(mask), 0, v)
        return g


class RowFeatNormalizer(BaseTransform):
    """Row-normalize features to unit sum (reference ``module.py:1662``)."""

    def __init__(self, subtract_min=False, node_feat_names=None, edge_feat_names=None):
        self.subtract_min = subtract_min
        self.node_feat_names = node_feat_names or []
        self.edge_feat_names = edge_feat_names or []

    def _norm(self, v):
        if self.subtract_min:
            v = v - v.min()
        s = v.sum(axis=-1, keepdims=True)
        return v / jnp.where(s == 0, 1, s)

    def __call__(self, g):
        for nt, frame in g._node_frames.items():
            for k in self.node_feat_names:
                if k in frame:
                    frame[k] = self._norm(frame[k])
        for cet, frame in g._edge_frames.items():
            for k in self.edge_feat_names:
                if k in frame:
                    frame[k] = self._norm(frame[k])
        return g


class DropNode(BaseTransform):
    """Randomly drop nodes (reference ``module.py:1474``)."""

    def __init__(self, p=0.5, seed=0):
        self.p = p
        self._rng = np.random.default_rng(seed)

    def __call__(self, g):
        from ..subgraph import node_subgraph

        keep = {
            nt: np.nonzero(self._rng.random(g.num_nodes(nt)) >= self.p)[0]
            for nt in g.ntypes
        }
        return node_subgraph(g, keep)


class DropEdge(BaseTransform):
    """Randomly drop edges (reference ``module.py:1522``)."""

    def __init__(self, p=0.5, seed=0):
        self.p = p
        self._rng = np.random.default_rng(seed)

    def __call__(self, g):
        for cet in g.canonical_etypes:
            n = g.num_edges(cet)
            drop = np.nonzero(self._rng.random(n) < self.p)[0]
            if drop.size:
                g = F.remove_edges(g, drop, etype=cet)
        return g


class AddEdge(BaseTransform):
    """Add random edges (reference ``module.py:1749``)."""

    def __init__(self, ratio=0.2, seed=0):
        self.ratio = ratio
        self._rng = np.random.default_rng(seed)

    def __call__(self, g):
        for cet in g.canonical_etypes:
            n_add = int(g.num_edges(cet) * self.ratio)
            if n_add == 0:
                continue
            u = self._rng.integers(0, g.num_src_nodes(cet[0]), n_add)
            v = self._rng.integers(0, g.num_dst_nodes(cet[2]), n_add)
            g = F.add_edges(g, u, v, etype=cet)
        return g


class RandomWalkPE(BaseTransform):
    """(reference ``module.py:1858``)."""

    def __init__(self, k: int, feat_name: str = "PE", eweight_name=None):
        self.k = k
        self.feat_name = feat_name
        self.eweight_name = eweight_name

    def __call__(self, g):
        g.ndata[self.feat_name] = F.random_walk_pe(g, self.k, self.eweight_name)
        return g


class LapPE(BaseTransform):
    """(reference ``module.py:1908``)."""

    def __init__(self, k: int, feat_name: str = "PE", eigval_name=None, padding=False):
        self.k = k
        self.feat_name = feat_name
        self.eigval_name = eigval_name
        self.padding = padding

    def __call__(self, g):
        if self.eigval_name:
            pe, ev = F.lap_pe(g, self.k, self.padding, return_eigval=True)
            g.ndata[self.feat_name] = pe
            g.ndata[self.eigval_name] = jnp.broadcast_to(
                ev[None, :], (g.num_nodes(), self.k)
            )
        else:
            g.ndata[self.feat_name] = F.lap_pe(g, self.k, self.padding)
        return g


class GDC(BaseTransform):
    """Graph diffusion convolution preprocessing (reference
    ``module.py:1411``): PPR or heat-kernel diffusion + sparsification,
    storing weights in ``edata[eweight_name]``."""

    def __init__(self, diffusion: str = "ppr", alpha: float = 0.15,
                 t: float = 5.0, eps=None, avg_degree: int = 5,
                 eweight_name: str = "w"):
        self.diffusion = diffusion
        self.alpha = alpha
        self.t = t
        self.eps = eps
        self.avg_degree = avg_degree
        self.eweight_name = eweight_name

    def __call__(self, g):
        if self.diffusion == "ppr":
            out = F.ppr(g, alpha=self.alpha, eps=self.eps,
                        avg_degree=self.avg_degree)
        elif self.diffusion == "heat":
            out = F.heat_kernel(g, t=self.t, eps=self.eps,
                                avg_degree=self.avg_degree)
        else:
            raise DGLError(f"Unknown diffusion {self.diffusion!r}")
        if self.eweight_name != "w":
            cet = out.canonical_etypes[0]
            out._edge_frames[cet][self.eweight_name] = (
                out._edge_frames[cet].pop("w")
            )
        return out


class SIGNDiffusion(BaseTransform):
    """(reference ``module.py:1692``)."""

    def __init__(self, k: int, in_feat_name="feat", out_feat_name="out_feat",
                 eweight_name=None, diffuse_op="gcn", alpha=0.2):
        self.k = k
        self.in_feat_name = in_feat_name
        self.out_feat_name = out_feat_name
        self.eweight_name = eweight_name
        self.diffuse_op = diffuse_op
        self.alpha = alpha

    def __call__(self, g):
        return F.sign_diffusion(
            g, self.k, self.in_feat_name, self.out_feat_name,
            self.eweight_name, self.diffuse_op, self.alpha,
        )


class LineGraph(BaseTransform):
    """(reference ``module.py`` ``LineGraph``)."""

    def __init__(self, backtracking: bool = True):
        self.backtracking = backtracking

    def __call__(self, g):
        return F.line_graph(g, backtracking=self.backtracking)


class AddMetaPaths(BaseTransform):
    """Materialize metapath-reachable graphs as new etypes on a hetero
    graph (reference ``module.py`` ``AddMetaPaths``)."""

    def __init__(self, metapaths, keep_orig_edges: bool = True):
        self.metapaths = metapaths
        self.keep_orig_edges = keep_orig_edges

    def __call__(self, g):
        from .. import convert

        data_dict = {}
        num_nodes = {nt: g.num_nodes(nt) for nt in g.ntypes}
        if self.keep_orig_edges:
            for cet in g.canonical_etypes:
                rel = g._relations[cet]
                E = rel.num_edges
                import numpy as np

                data_dict[cet] = (
                    np.asarray(rel.src)[:E], np.asarray(rel.dst)[:E]
                )
        for name, metapath in self.metapaths.items():
            mg = F.metapath_reachable_graph(g, metapath)
            rel = mg._relation(None)
            E = rel.num_edges
            import numpy as np

            st = g.to_canonical_etype(metapath[0])[0]
            dt = g.to_canonical_etype(metapath[-1])[2]
            data_dict[(st, name, dt)] = (
                np.asarray(rel.src)[:E], np.asarray(rel.dst)[:E]
            )
        return convert.heterograph(data_dict, num_nodes, idtype=g.idtype)


class PPR(BaseTransform):
    """(reference ``module.py:1411`` neighborhood; functional ``ppr``)."""

    def __init__(self, alpha: float = 0.15, eweight_name=None, eps=None,
                 avg_degree: int = 5):
        self.kw = dict(alpha=alpha, eweight_name=eweight_name, eps=eps,
                       avg_degree=avg_degree)

    def __call__(self, g):
        return F.ppr(g, **self.kw)


class HeatKernel(BaseTransform):
    def __init__(self, t: float = 5.0, eweight_name=None, eps=None,
                 avg_degree: int = 5):
        self.kw = dict(t=t, eweight_name=eweight_name, eps=eps,
                       avg_degree=avg_degree)

    def __call__(self, g):
        return F.heat_kernel(g, **self.kw)


class NodeShuffle(BaseTransform):
    """Randomly permute node ids (reference ``module.py`` ``NodeShuffle``)."""

    def __init__(self, seed=None):
        import numpy as np

        self._rng = np.random.default_rng(seed)

    def __call__(self, g):
        import numpy as np

        perm = self._rng.permutation(g.num_nodes())
        return F.reorder_graph(
            g, node_permute_algo="custom", permute_config={"nodes_perm": perm}
        )


class LaplacianPE(BaseTransform):
    """Deprecated reference alias of ``LapPE``."""

    def __init__(self, k: int, feat_name: str = "PE", padding: bool = False,
                 eigval_name=None):
        self.k = k
        self.feat_name = feat_name
        self.padding = padding
        self.eigval_name = eigval_name

    def __call__(self, g):
        if self.eigval_name:
            pe, ev = F.lap_pe(g, self.k, padding=self.padding,
                              return_eigval=True)
            g.ndata[self.eigval_name] = ev
        else:
            pe = F.lap_pe(g, self.k, padding=self.padding)
        g.ndata[self.feat_name] = pe
        return g


class SVDPE(BaseTransform):
    """(reference ``module.py`` ``SVDPE``; functional ``svd_pe``)."""

    def __init__(self, k: int, feat_name: str = "svd_pe",
                 padding: bool = False, random_flip: bool = True):
        self.k = k
        self.feat_name = feat_name
        self.padding = padding
        self.random_flip = random_flip

    def __call__(self, g):
        g.ndata[self.feat_name] = F.svd_pe(
            g, self.k, padding=self.padding, random_flip=self.random_flip
        )
        return g


class ToLevi(BaseTransform):
    """(reference ``module.py`` ``ToLevi``; functional ``to_levi``)."""

    def __call__(self, g):
        return F.to_levi(g)


__all__ += [
    "LineGraph",
    "AddMetaPaths",
    "PPR",
    "HeatKernel",
    "NodeShuffle",
    "LaplacianPE",
    "SVDPE",
    "ToLevi",
]
