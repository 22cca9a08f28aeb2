#!/usr/bin/env python
"""Preprocess a dataset into the OnDiskDataset layout (reference
``python/dgl/graphbolt/impl/ondisk_dataset.py:321`` preprocess +
``tools/dispatch_data.py``).

Sources:
  --ogb <name>        an OGB node-prediction dataset (requires `ogb`)
  --graph <file.npz>  a graph saved with dgl.save_graphs (features/labels
                      and masks read from ndata)

Usage:
    python tools/ogb_to_ondisk.py --graph g.npz --out ds_dir/
"""
import argparse
import os
import sys


def main():
    p = argparse.ArgumentParser()
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--ogb")
    src.add_argument("--graph")
    p.add_argument("--out", required=True)
    p.add_argument("--name", default=None)
    args = p.parse_args()

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from dgl_tpu.graphbolt import OnDiskDataset

    if args.ogb:
        from dgl_tpu.data.adapter import from_ogb

        g = from_ogb(args.ogb)
        name = args.name or args.ogb
    else:
        from dgl_tpu.data.serialize import load_graphs

        graphs, _ = load_graphs(args.graph)
        g = graphs[0]
        name = args.name or "graph"

    rel = g._relation(None)
    E = rel.num_edges
    feats = {}
    nf = g._node_frames.get(g.ntypes[0], {})
    labels = None
    masks = {}
    for k, v in nf.items():
        arr = np.asarray(v)
        if k == "label":
            labels = arr
        elif k.endswith("_mask"):
            masks[k] = np.nonzero(arr)[0]
        elif not k.startswith("_"):
            feats[k] = arr
    ds = OnDiskDataset.write(
        args.out,
        name=name,
        src=np.asarray(rel.src)[:E],
        dst=np.asarray(rel.dst)[:E],
        num_nodes=g.num_nodes(),
        features=feats,
        labels=labels,
        train_ids=masks.get("train_mask"),
        val_ids=masks.get("val_mask"),
        test_ids=masks.get("test_mask"),
    )
    print(
        f"wrote {args.out}: {ds.graph.num_nodes()} nodes, "
        f"{ds.graph.num_edges()} edges, features {list(feats)}"
    )


if __name__ == "__main__":
    main()
