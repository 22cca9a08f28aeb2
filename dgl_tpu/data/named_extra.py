"""Reference-named dataset tail: KG, RDF, molecular, superpixel, GNN
benchmark, temporal-KG, signed/temporal and misc datasets.

Like the rest of ``dgl_tpu.data`` these default to deterministic
synthetic generators with reference-matching statistics and task
structure (reference modules cited per class); real raw files can be
dropped into ``raw_dir`` where a parser exists.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .dgl_dataset import DGLDataset
from .synthetic import (
    FraudDataset,
    GraphClassificationDataset,
    KnowledgeGraphDataset,
    synthetic_hetero_graph,
)

__all__ = [
    "FB15kDataset", "FB15k237Dataset", "WN18Dataset",
    "AIFBDataset", "MUTAGDataset", "BGSDataset", "AMDataset",
    "QM7bDataset", "QM9Dataset", "QM9EdgeDataset", "ZINCDataset",
    "MNISTSuperPixelDataset", "CIFAR10SuperPixelDataset",
    "PATTERNDataset", "CLUSTERDataset",
    "ICEWS18Dataset", "GDELTDataset",
    "FraudYelpDataset", "FraudAmazonDataset",
    "BitcoinOTCDataset", "SSTDataset", "MovieLensDataset",
    "FakeNewsDataset", "LegacyTUDataset", "LegacyPPIDataset",
]


# -- knowledge graphs (reference ``data/knowledge_graph.py``) ---------------


def _kg(name, ents, rels, triples):
    class _KG(KnowledgeGraphDataset):
        def __init__(self, transform=None, **kwargs):
            super().__init__(
                name=name, num_entities=ents, num_rels=rels,
                num_triples=triples, seed=abs(hash(name)) % 2**31,
                transform=transform, **kwargs,
            )

    _KG.__name__ = name
    return _KG


FB15kDataset = _kg("FB15kDataset", 14951, 1345, 100000)
FB15k237Dataset = _kg("FB15k237Dataset", 14541, 237, 100000)
WN18Dataset = _kg("WN18Dataset", 40943, 18, 80000)


# -- RDF hetero node classification (reference ``data/rdf.py``) -------------


class _RDFDataset(DGLDataset):
    """Hetero entity-classification set with a ``predict_category``."""

    CFG = ()  # (predict_category, num_classes)

    def __init__(self, transform=None, **kwargs):
        cat, c = self.CFG
        self._cat = cat
        self._num_classes = c
        super().__init__(name=type(self).__name__, transform=transform)

    def process(self):
        from .. import convert

        base = synthetic_hetero_graph(num_classes=self._num_classes)
        # rebuild with the labeled type renamed to this RDF set's predict
        # category (a shallow dict rename would leave the graph's cached
        # etype structures stale)
        mapping = {"paper": self._cat}
        data_dict = {}
        for (st, et, dt), rel in base._relations.items():
            E = rel.num_edges
            data_dict[(mapping.get(st, st), et, mapping.get(dt, dt))] = (
                np.asarray(rel.src)[:E], np.asarray(rel.dst)[:E]
            )
        num_nodes = {
            mapping.get(nt, nt): base.num_nodes(nt) for nt in base.ntypes
        }
        g = convert.heterograph(data_dict, num_nodes, idtype=base.idtype)
        for nt, frame in base._node_frames.items():
            g._node_frames.setdefault(mapping.get(nt, nt), {}).update(frame)
        self._g = g

    @property
    def predict_category(self):
        return self._cat

    @property
    def num_classes(self):
        return self._num_classes

    def __getitem__(self, idx):
        assert idx == 0
        return self._apply_transform(self._g)

    def __len__(self):
        return 1


class AIFBDataset(_RDFDataset):
    """(reference ``data/rdf.py`` AIFB: 4-class person affiliation)."""

    CFG = ("Personen", 4)


class MUTAGDataset(_RDFDataset):
    """(reference ``data/rdf.py`` MUTAG RDF: 2-class mutagenicity)."""

    CFG = ("d", 2)


class BGSDataset(_RDFDataset):
    """(reference ``data/rdf.py`` BGS: 2-class lithogenesis)."""

    CFG = ("Lexicon", 2)


class AMDataset(_RDFDataset):
    """(reference ``data/rdf.py`` AM: 11-class artifact category)."""

    CFG = ("proxy", 11)


# -- molecular regression (reference ``data/qm7b.py``, ``qm9.py``,
#    ``qm9_edge.py``; ZINC from ``data/zinc.py``) ---------------------------


class MoleculeRegressionDataset(DGLDataset):
    """Multi-graph regression: molecule-shaped graphs with 3D coordinates
    and per-graph target vectors; targets correlate with planted size and
    feature statistics so models can fit."""

    def __init__(self, name, num_graphs, num_targets, with_coords=True,
                 edge_feat_dim=0, seed=0, transform=None, **kwargs):
        self._cfg = (num_graphs, num_targets, with_coords, edge_feat_dim,
                     seed)
        super().__init__(name=name, transform=transform)

    def process(self):
        from .. import convert

        nb, t, coords, efd, s = self._cfg
        rng = np.random.default_rng(s)
        self._graphs, targets = [], []
        for _ in range(nb):
            n = int(rng.integers(4, 24))
            # chain + random extra bonds: molecule-like sparsity
            chain = np.arange(n - 1)
            extra = rng.integers(0, n, max(1, n // 3))
            src = np.concatenate([chain, chain + 1, extra])
            dst = np.concatenate([chain + 1, chain,
                                  rng.integers(0, n, extra.shape[0])])
            g = convert.graph((src, dst), num_nodes=n)
            z = rng.integers(1, 10, n)  # atomic numbers
            g.ndata["node_type"] = jnp.asarray(z.astype(np.int32))
            if coords:
                pos = rng.normal(size=(n, 3)).astype(np.float32)
                g.ndata["R"] = jnp.asarray(pos)
            if efd:
                E = g._relation(None).num_edges_padded
                g.edata["edge_attr"] = jnp.asarray(
                    rng.normal(size=(E, efd)).astype(np.float32)
                )
            self._graphs.append(g)
            base = np.array([n, z.mean(), z.std() + 1e-3], np.float32)
            w = rng.normal(size=(3, t)).astype(np.float32)
            targets.append(base @ w + rng.normal(size=t).astype(np.float32))
        self.label = jnp.asarray(np.stack(targets))

    def __getitem__(self, idx):
        return self._apply_transform(self._graphs[idx]), self.label[idx]

    def __len__(self):
        return len(self._graphs)


class QM7bDataset(MoleculeRegressionDataset):
    def __init__(self, num_graphs=400, transform=None, **kwargs):
        super().__init__("QM7bDataset", num_graphs, 14, transform=transform)


class QM9Dataset(MoleculeRegressionDataset):
    def __init__(self, label_keys=None, num_graphs=400, transform=None,
                 **kwargs):
        super().__init__("QM9Dataset", num_graphs, 12, transform=transform)


class QM9EdgeDataset(MoleculeRegressionDataset):
    def __init__(self, label_keys=None, num_graphs=400, transform=None,
                 **kwargs):
        super().__init__("QM9EdgeDataset", num_graphs, 19,
                         edge_feat_dim=4, transform=transform)


class ZINCDataset(MoleculeRegressionDataset):
    def __init__(self, mode="train", num_graphs=400, transform=None,
                 **kwargs):
        super().__init__(f"ZINCDataset_{mode}", num_graphs, 1,
                         with_coords=False, transform=transform)


# -- superpixel graph classification (reference ``data/superpixel.py``) ------


class _SuperPixelDataset(GraphClassificationDataset):
    def __init__(self, name, num_graphs, transform=None, **kwargs):
        super().__init__(name=name, num_graphs=num_graphs, num_classes=10,
                         feat_dim=3, transform=transform)


class MNISTSuperPixelDataset(_SuperPixelDataset):
    def __init__(self, num_graphs=500, transform=None, **kwargs):
        super().__init__("MNISTSuperPixelDataset", num_graphs,
                         transform=transform)


class CIFAR10SuperPixelDataset(_SuperPixelDataset):
    def __init__(self, num_graphs=500, transform=None, **kwargs):
        super().__init__("CIFAR10SuperPixelDataset", num_graphs,
                         transform=transform)


# -- GNN benchmark inductive node classification (reference
#    ``data/gnn_benchmark.py`` PATTERN/CLUSTER) ------------------------------


class _InductiveNodeDataset(DGLDataset):
    """Many SBM graphs with node labels (train on some graphs, eval on
    others)."""

    def __init__(self, name, num_graphs=100, num_classes=2, seed=0,
                 transform=None, **kwargs):
        self._cfg = (num_graphs, num_classes, seed)
        self._num_classes = num_classes
        super().__init__(name=name, transform=transform)

    def process(self):
        from .. import convert

        nb, c, s = self._cfg
        rng = np.random.default_rng(s)
        self._graphs = []
        for _ in range(nb):
            n = int(rng.integers(40, 80))
            labels = rng.integers(0, c, n)
            p_in, p_out = 0.2, 0.02
            u = rng.integers(0, n, n * 10)
            v = rng.integers(0, n, n * 10)
            same = labels[u] == labels[v]
            keep = np.where(same, rng.random(n * 10) < p_in * 5,
                            rng.random(n * 10) < p_out * 5)
            g = convert.graph((u[keep], v[keep]), num_nodes=n)
            feat = (
                labels[:, None]
                + rng.normal(0, 2.0, (n, 4))
            ).astype(np.float32)
            g.ndata["feat"] = jnp.asarray(feat)
            g.ndata["label"] = jnp.asarray(labels.astype(np.int32))
            self._graphs.append(g)

    @property
    def num_classes(self):
        return self._num_classes

    def __getitem__(self, idx):
        return self._apply_transform(self._graphs[idx])

    def __len__(self):
        return len(self._graphs)


class PATTERNDataset(_InductiveNodeDataset):
    def __init__(self, mode="train", transform=None, **kwargs):
        super().__init__("PATTERNDataset", num_classes=2,
                         transform=transform)


class CLUSTERDataset(_InductiveNodeDataset):
    def __init__(self, mode="train", transform=None, **kwargs):
        super().__init__("CLUSTERDataset", num_classes=6,
                         transform=transform)


# -- temporal knowledge graphs (reference ``data/icews18.py``,
#    ``data/gdelt.py``) ------------------------------------------------------


class _TemporalKG(KnowledgeGraphDataset):
    def __init__(self, name, ents, rels, triples, num_ts=24, transform=None,
                 **kwargs):
        self._num_ts = num_ts
        super().__init__(name=name, num_entities=ents, num_rels=rels,
                         num_triples=triples,
                         seed=abs(hash(name)) % 2**31, transform=transform)

    def process(self):
        super().process()
        rng = np.random.default_rng(1)
        E = self._g._relation(None).num_edges_padded
        self._g.edata["timestamp"] = jnp.asarray(
            rng.integers(0, self._num_ts, E).astype(np.int32)
        )


class ICEWS18Dataset(_TemporalKG):
    def __init__(self, mode="train", transform=None, **kwargs):
        super().__init__("ICEWS18Dataset", 23033, 256, 60000,
                         transform=transform)


class GDELTDataset(_TemporalKG):
    def __init__(self, mode="train", transform=None, **kwargs):
        super().__init__("GDELTDataset", 7691, 240, 60000,
                         transform=transform)


# -- fraud aliases (reference ``data/fraud.py``) -----------------------------


class FraudYelpDataset(FraudDataset):
    def __init__(self, transform=None, **kwargs):
        super().__init__(name="yelp", transform=transform, **kwargs)


class FraudAmazonDataset(FraudDataset):
    def __init__(self, transform=None, **kwargs):
        super().__init__(name="amazon", transform=transform, **kwargs)


# -- misc ---------------------------------------------------------------------


class BitcoinOTCDataset(DGLDataset):
    """Signed, timestamped trust network as temporal snapshots (reference
    ``data/bitcoin_otc.py``): each item is one time-slice graph with edge
    weights in [-10, 10]."""

    def __init__(self, num_snapshots=10, num_nodes=500, seed=0,
                 transform=None, **kwargs):
        self._cfg = (num_snapshots, num_nodes, seed)
        super().__init__(name="BitcoinOTCDataset", transform=transform)

    def process(self):
        from .. import convert

        k, n, s = self._cfg
        rng = np.random.default_rng(s)
        self._graphs = []
        for _ in range(k):
            e = int(rng.integers(n, n * 3))
            g = convert.graph(
                (rng.integers(0, n, e), rng.integers(0, n, e)), num_nodes=n
            )
            E = g._relation(None).num_edges_padded
            w = np.zeros(E, np.float32)
            w[:e] = rng.integers(-10, 11, e)
            g.edata["h"] = jnp.asarray(w)
            self._graphs.append(g)

    def __getitem__(self, idx):
        return self._apply_transform(self._graphs[idx])

    def __len__(self):
        return len(self._graphs)

    @property
    def is_temporal(self):
        return True


class SSTDataset(DGLDataset):
    """Sentiment trees (reference ``data/tree.py`` SSTDataset): binary
    trees whose nodes carry word ids and 5-way sentiment labels."""

    PAD_WORD = -1

    def __init__(self, mode="tiny", num_trees=200, vocab_size=300, seed=0,
                 transform=None, **kwargs):
        self._cfg = (num_trees, vocab_size, seed)
        super().__init__(name=f"SSTDataset_{mode}", transform=transform)

    def process(self):
        from .. import convert

        nb, vocab, s = self._cfg
        rng = np.random.default_rng(s)
        self._graphs = []
        self.vocab_size = vocab
        for _ in range(nb):
            leaves = int(rng.integers(3, 10))
            n = 2 * leaves - 1
            # child -> parent edges of a left-leaning binary tree
            src, dst = [], []
            next_id = leaves
            frontier = list(range(leaves))
            while len(frontier) > 1:
                a = frontier.pop(0)
                b = frontier.pop(0)
                src += [a, b]
                dst += [next_id, next_id]
                frontier.append(next_id)
                next_id += 1
            g = convert.graph((np.array(src), np.array(dst)), num_nodes=n)
            x = np.full(n, self.PAD_WORD, np.int64)
            x[:leaves] = rng.integers(0, vocab, leaves)
            g.ndata["x"] = jnp.asarray(x.astype(np.int32))
            g.ndata["y"] = jnp.asarray(
                rng.integers(0, 5, n).astype(np.int32)
            )
            g.ndata["mask"] = jnp.asarray(
                (x != self.PAD_WORD).astype(np.int32)
            )
            self._graphs.append(g)

    def __getitem__(self, idx):
        return self._apply_transform(self._graphs[idx])

    def __len__(self):
        return len(self._graphs)

    @property
    def num_classes(self):
        return 5


class MovieLensDataset(DGLDataset):
    """User-movie rating bipartite graph (reference
    ``data/movielens.py``): hetero graph with a rating per edge."""

    def __init__(self, name="ml-100k", num_users=300, num_movies=500,
                 num_ratings=5000, valid_ratio=0.1, test_ratio=0.1, seed=0,
                 transform=None, **kwargs):
        self._cfg = (num_users, num_movies, num_ratings, seed)
        super().__init__(name=f"MovieLensDataset_{name}",
                         transform=transform)

    def process(self):
        from .. import convert

        nu, nm, nr, s = self._cfg
        rng = np.random.default_rng(s)
        u = rng.integers(0, nu, nr)
        m = rng.integers(0, nm, nr)
        g = convert.heterograph(
            {("user", "rates", "movie"): (u, m),
             ("movie", "rated-by", "user"): (m, u)},
            {"user": nu, "movie": nm},
        )
        for cet in g.canonical_etypes:
            E = g._relations[cet].num_edges_padded
            r = np.zeros(E, np.float32)
            r[:nr] = rng.integers(1, 6, nr)
            g._edge_frames.setdefault(cet, {})["rating"] = jnp.asarray(r)
        self._g = g

    def __getitem__(self, idx):
        assert idx == 0
        return self._apply_transform(self._g)

    def __len__(self):
        return 1


class FakeNewsDataset(GraphClassificationDataset):
    """(reference ``data/fakenews.py``: binary graph classification over
    propagation trees)."""

    def __init__(self, name="politifact", feature_name="profile",
                 transform=None, **kwargs):
        super().__init__(name=f"FakeNewsDataset_{name}", num_graphs=150,
                         num_classes=2, feat_dim=10, transform=transform)


class LegacyTUDataset(GraphClassificationDataset):
    """(reference ``data/tu.py`` LegacyTUDataset)."""

    def __init__(self, name="ENZYMES", transform=None, **kwargs):
        super().__init__(name=f"LegacyTUDataset_{name}", num_graphs=120,
                         num_classes=6, feat_dim=18, transform=transform)


class LegacyPPIDataset(DGLDataset):
    """(reference ``data/ppi.py`` LegacyPPIDataset): alias of PPIDataset."""

    def __new__(cls, *args, **kwargs):
        from .synthetic import PPIDataset

        return PPIDataset(*args, **kwargs)
