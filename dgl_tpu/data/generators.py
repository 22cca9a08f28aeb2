"""Synthetic explainability benchmark datasets (reference
``python/dgl/data/synthetic.py``: BAShapeDataset, TreeCycleDataset,
TreeGridDataset — graphs with planted motifs and ground-truth labels)."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .dgl_dataset import DGLDataset

__all__ = ["BAShapeDataset", "TreeCycleDataset", "TreeGridDataset", "MiniGCDataset", "KarateClubDataset", "SBMMixtureDataset"]


def _barabasi_albert(n: int, m: int, rng) -> list:
    edges = []
    targets = list(range(m))
    repeated = []
    for v in range(m, n):
        for t in targets:
            edges.append((v, t))
        repeated.extend(targets)
        repeated.extend([v] * m)
        targets = [repeated[i] for i in rng.integers(0, len(repeated), m)]
    return edges


def _tree(height: int) -> list:
    edges = []
    n = 2 ** (height + 1) - 1
    for v in range(1, n):
        edges.append((v, (v - 1) // 2))
    return edges


class _MotifDataset(DGLDataset):
    def __init__(self, name, seed=0, transform=None, **kwargs):
        self._seed = seed
        super().__init__(name=name, transform=transform)

    def _base_graph(self, rng):
        raise NotImplementedError

    def _motif(self):
        raise NotImplementedError

    def process(self):
        from .. import convert

        rng = np.random.default_rng(self._seed)
        base_edges, num_base = self._base_graph(rng)
        motif_edges, motif_size, motif_labels = self._motif()
        edges = list(base_edges)
        labels = [0] * num_base
        n = num_base
        for _ in range(self.num_motifs):
            attach = int(rng.integers(0, num_base))
            for a, b in motif_edges:
                edges.append((n + a, n + b))
            edges.append((n, attach))
            labels.extend(motif_labels)
            n += motif_size
        src = np.array([a for a, b in edges] + [b for a, b in edges])
        dst = np.array([b for a, b in edges] + [a for a, b in edges])
        g = convert.graph((src, dst), num_nodes=n)
        g.ndata["label"] = jnp.asarray(np.array(labels, np.int32))
        g.ndata["feat"] = jnp.ones((n, 10), jnp.float32)
        self._g = g

    def __getitem__(self, idx):
        assert idx == 0
        return self._apply_transform(self._g)

    def __len__(self):
        return 1


class BAShapeDataset(_MotifDataset):
    """BA graph + house motifs (reference ``data/synthetic.py`` BAShape)."""

    num_motifs = 80

    def __init__(self, **kwargs):
        super().__init__("ba_shape", **kwargs)

    def _base_graph(self, rng):
        return _barabasi_albert(300, 5, rng), 300

    def _motif(self):
        house = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 4), (1, 4)]
        return house, 5, [1, 1, 2, 2, 3]

    @property
    def num_classes(self):
        return 4


class TreeCycleDataset(_MotifDataset):
    """Balanced tree + cycle motifs (reference TreeCycle)."""

    num_motifs = 60

    def __init__(self, **kwargs):
        super().__init__("tree_cycle", **kwargs)

    def _base_graph(self, rng):
        e = _tree(8)
        return e, 2**9 - 1

    def _motif(self):
        cyc = [(i, (i + 1) % 6) for i in range(6)]
        return cyc, 6, [1] * 6

    @property
    def num_classes(self):
        return 2


class TreeGridDataset(_MotifDataset):
    """Balanced tree + 3x3 grid motifs (reference TreeGrid)."""

    num_motifs = 60

    def __init__(self, **kwargs):
        super().__init__("tree_grid", **kwargs)

    def _base_graph(self, rng):
        e = _tree(8)
        return e, 2**9 - 1

    def _motif(self):
        grid = []
        for r in range(3):
            for c in range(3):
                v = r * 3 + c
                if c < 2:
                    grid.append((v, v + 1))
                if r < 2:
                    grid.append((v, v + 3))
        return grid, 9, [1] * 9

    @property
    def num_classes(self):
        return 2


class MiniGCDataset(DGLDataset):
    """Mini graph classification dataset (reference ``data/minigc.py``):
    8 topology classes — cycle, star, wheel, lollipop, hypercube, grid,
    clique, circular ladder."""

    def __init__(self, num_graphs: int, min_num_v: int, max_num_v: int,
                 seed=0, transform=None, **kwargs):
        self.num_graphs = num_graphs
        self.min_num_v = min_num_v
        self.max_num_v = max_num_v
        self._seed = seed
        super().__init__(name="minigc", transform=transform)

    def process(self):
        import networkx as nx

        from .. import convert

        rng = np.random.default_rng(self._seed)
        self.graphs = []
        self.labels = []

        def build(label, n):
            n = max(n, 4)
            if label == 0:
                nxg = nx.cycle_graph(n)
            elif label == 1:
                nxg = nx.star_graph(n - 1)
            elif label == 2:
                nxg = nx.wheel_graph(n - 1)
            elif label == 3:
                m = max(2, n // 2)
                nxg = nx.lollipop_graph(m, n - m)
            elif label == 4:
                d = max(2, int(np.log2(n)))
                nxg = nx.hypercube_graph(d)
                nxg = nx.convert_node_labels_to_integers(nxg)
            elif label == 5:
                r = max(2, int(np.sqrt(n)))
                nxg = nx.grid_2d_graph(r, r)
                nxg = nx.convert_node_labels_to_integers(nxg)
            elif label == 6:
                nxg = nx.complete_graph(min(n, 20))
            else:
                nxg = nx.circular_ladder_graph(max(2, n // 2))
            return nxg

        per = self.num_graphs // 8
        for label in range(8):
            cnt = per if label < 7 else self.num_graphs - 7 * per
            for _ in range(cnt):
                n = int(rng.integers(self.min_num_v, self.max_num_v))
                nxg = build(label, n)
                g = convert.from_networkx(nx.DiGraph(nxg))
                self.graphs.append(g)
                self.labels.append(label)
        self.labels = jnp.asarray(np.array(self.labels, np.int32))

    def __getitem__(self, idx):
        return self._apply_transform(self.graphs[idx]), self.labels[idx]

    def __len__(self):
        return len(self.graphs)

    @property
    def num_classes(self):
        return 8


class KarateClubDataset(DGLDataset):
    """Zachary's karate club (reference ``data/karate.py``) — the real
    34-node graph via networkx, labels = the two factions."""

    def __init__(self, transform=None, **kwargs):
        super().__init__(name="karate_club", transform=transform)

    def process(self):
        import networkx as nx

        from .. import convert

        nxg = nx.karate_club_graph()
        g = convert.from_networkx(nx.DiGraph(nxg))
        labels = np.array(
            [0 if nxg.nodes[i]["club"] == "Mr. Hi" else 1
             for i in range(nxg.number_of_nodes())],
            np.int32,
        )
        g.ndata["label"] = jnp.asarray(labels)
        self._g = g

    def __getitem__(self, idx):
        assert idx == 0
        return self._apply_transform(self._g)

    def __len__(self):
        return 1

    @property
    def num_classes(self):
        return 2


class SBMMixtureDataset(DGLDataset):
    """Symmetric stochastic-block-model mixture (reference
    ``data/sbm.py``): graphs drawn from SBM(n_blocks, p, q) with community
    labels — the line-graph community-detection benchmark."""

    def __init__(self, n_graphs=16, n_nodes=200, n_communities=4,
                 p=0.2, q=0.02, seed=0, transform=None, **kwargs):
        self._cfg = (n_graphs, n_nodes, n_communities, p, q, seed)
        super().__init__(name="sbm_mixture", transform=transform)

    def process(self):
        from .. import convert

        ng, n, k, p, q, s = self._cfg
        rng = np.random.default_rng(s)
        self._graphs = []
        self._labels = []
        size = n // k
        for gi in range(ng):
            labels = np.repeat(np.arange(k), size)
            labels = np.concatenate([labels, rng.integers(0, k, n - labels.size)])
            rng.shuffle(labels)
            src, dst = [], []
            # upper-triangle Bernoulli draws, then symmetrize
            for i in range(n):
                prob = np.where(labels == labels[i], p, q)
                draws = rng.random(n) < prob
                draws[: i + 1] = False
                js = np.nonzero(draws)[0]
                src.extend([i] * js.size)
                dst.extend(js.tolist())
            a = np.array(src, np.int64)
            b = np.array(dst, np.int64)
            g = convert.graph(
                (np.concatenate([a, b]), np.concatenate([b, a])), num_nodes=n
            )
            g.ndata["label"] = jnp.asarray(labels.astype(np.int32))
            self._graphs.append(g)
            self._labels.append(labels)

    def __getitem__(self, idx):
        return self._apply_transform(self._graphs[idx])

    def __len__(self):
        return len(self._graphs)


class BACommunityDataset(_MotifDataset):
    """Two BA-shape communities joined by random inter-community edges
    (reference ``data/synthetic.py`` BACommunityDataset): 8 classes —
    the 4 BAShape roles per community — and community-indicating
    features."""

    num_motifs = 80

    def __init__(self, **kwargs):
        super().__init__("ba_community", **kwargs)

    def process(self):
        from .. import convert

        rng = np.random.default_rng(self._seed)
        halves = []
        offset = 0
        all_src, all_dst, labels = [], [], []
        for comm in range(2):
            base_edges = _barabasi_albert(300, 5, rng)
            num_base = 300
            edges = list(base_edges)
            comm_labels = [0] * num_base
            n = num_base
            house = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 4), (1, 4)]
            for _ in range(self.num_motifs):
                attach = int(rng.integers(0, num_base))
                for a, b in house:
                    edges.append((n + a, n + b))
                edges.append((n, attach))
                comm_labels.extend([1, 1, 2, 2, 3])
                n += 5
            src = np.array(
                [a for a, b in edges] + [b for a, b in edges]
            ) + offset
            dst = np.array(
                [b for a, b in edges] + [a for a, b in edges]
            ) + offset
            all_src.append(src)
            all_dst.append(dst)
            labels.extend([l + 4 * comm for l in comm_labels])
            halves.append((offset, offset + n))
            offset += n
        # sparse random inter-community edges (reference: 0.01 * N)
        k = max(offset // 100, 1)
        inter_a = rng.integers(halves[0][0], halves[0][1], k)
        inter_b = rng.integers(halves[1][0], halves[1][1], k)
        all_src.append(np.concatenate([inter_a, inter_b]))
        all_dst.append(np.concatenate([inter_b, inter_a]))
        g = convert.graph(
            (np.concatenate(all_src), np.concatenate(all_dst)),
            num_nodes=offset,
        )
        lab = np.asarray(labels, np.int32)
        g.ndata["label"] = jnp.asarray(lab)
        # community-indicating gaussian features (reference uses two
        # means)
        feat = rng.normal(size=(offset, 10)).astype(np.float32)
        feat[halves[1][0]:] += 1.0
        g.ndata["feat"] = jnp.asarray(feat)
        self._g = g

    @property
    def num_classes(self):
        return 8


class BA2MotifDataset(DGLDataset):
    """Graph-classification BA-2motif (reference ``data/synthetic.py``
    BA2MotifDataset): 1000 BA base graphs, half attached with a house
    motif, half with a 5-cycle; label = motif type."""

    def __init__(self, num_graphs: int = 1000, seed: int = 0,
                 transform=None, **kwargs):
        self._cfg = (num_graphs, seed)
        super().__init__(name="ba_2motif", transform=transform)

    def process(self):
        from .. import convert

        num_graphs, seed = self._cfg
        rng = np.random.default_rng(seed)
        house = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 4), (1, 4)]
        cycle = [(i, (i + 1) % 5) for i in range(5)]
        self._graphs = []
        self._labels = np.zeros(num_graphs, np.int32)
        for i in range(num_graphs):
            label = int(rng.integers(0, 2))
            motif = house if label == 0 else cycle
            base = _barabasi_albert(20, 1, rng)
            edges = list(base)
            n = 20
            attach = int(rng.integers(0, 20))
            for a, b in motif:
                edges.append((n + a, n + b))
            edges.append((n, attach))
            n += 5
            src = np.array([a for a, b in edges] + [b for a, b in edges])
            dst = np.array([b for a, b in edges] + [a for a, b in edges])
            g = convert.graph((src, dst), num_nodes=n)
            g.ndata["feat"] = jnp.asarray(
                rng.normal(size=(n, 10)).astype(np.float32)
            )
            self._graphs.append(g)
            self._labels[i] = label

    def __getitem__(self, idx):
        return self._apply_transform(self._graphs[idx]), self._labels[idx]

    def __len__(self):
        return len(self._graphs)

    @property
    def num_classes(self):
        return 2


__all__ += ["BACommunityDataset", "BA2MotifDataset"]
