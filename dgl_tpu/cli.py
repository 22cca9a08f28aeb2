"""Command-line trainer (reference ``dglgo/``: ``dgl configure/train/recipe``).

Usage:
    python -m dgl_tpu recipe list
    python -m dgl_tpu configure nodepred --model gcn --dataset cora > cfg.json
    python -m dgl_tpu train --cfg cfg.json
    python -m dgl_tpu train --pipeline nodepred --model gat --dataset citeseer

Pipelines mirror dglgo's: nodepred (full-graph), nodepred-ns (neighbor
sampling), linkpred.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

RECIPES = {
    "nodepred_gcn_cora": {"pipeline": "nodepred", "model": "gcn", "dataset": "cora", "epochs": 200, "lr": 1e-2, "hidden": 16},
    "nodepred_gat_cora": {"pipeline": "nodepred", "model": "gat", "dataset": "cora", "epochs": 200, "lr": 5e-3, "hidden": 8},
    "nodepred_sage_cora": {"pipeline": "nodepred", "model": "sage", "dataset": "cora", "epochs": 200, "lr": 1e-2, "hidden": 64},
    "nodepred-ns_sage_synthetic": {"pipeline": "nodepred-ns", "model": "sage", "dataset": "synthetic", "epochs": 5, "lr": 1e-3, "hidden": 128, "batch_size": 256, "fanouts": [10, 10]},
    "linkpred_sage_synthetic": {"pipeline": "linkpred", "model": "sage", "dataset": "synthetic", "epochs": 50, "lr": 1e-3, "hidden": 64},
    "graphpred_gin_synthetic": {"pipeline": "graphpred", "model": "gin", "dataset": "graphcls", "epochs": 60, "lr": 5e-3, "hidden": 32},
}


def _load_dataset(name: str):
    from .data import (
        CiteseerGraphDataset, CoraGraphDataset, PubmedGraphDataset,
        SyntheticDataset,
    )

    table = {
        "cora": CoraGraphDataset,
        "citeseer": CiteseerGraphDataset,
        "pubmed": PubmedGraphDataset,
        "synthetic": lambda: SyntheticDataset(
            num_nodes=20_000, num_edges=200_000, num_classes=16, feat_dim=64
        ),
    }
    if name not in table:
        raise SystemExit(f"unknown dataset {name!r}; options: {list(table)}")
    return table[name]()


def _build_model(name: str, in_feats: int, hidden: int, out_feats: int,
                 num_layers: int = 2):
    from .models import GAT, GCN, GraphSAGE

    if name == "gcn":
        return GCN(in_feats, hidden, out_feats, num_layers=num_layers)
    if name == "gat":
        return GAT(in_feats, hidden, out_feats, num_layers=num_layers)
    if name == "sage":
        return GraphSAGE(in_feats, hidden, out_feats, num_layers=num_layers)
    raise SystemExit(f"unknown model {name!r}; options: gcn gat sage")


def _run_nodepred(cfg: dict):
    import jax
    import jax.numpy as jnp
    import optax

    from . import add_self_loop, remove_self_loop

    ds = _load_dataset(cfg["dataset"])
    g = add_self_loop(remove_self_loop(ds[0]))
    feat = g.ndata["feat"]
    labels = g.ndata["label"].astype(jnp.int32)
    train_mask = g.ndata["train_mask"].astype(jnp.float32)
    test_mask = g.ndata["test_mask"]
    model = _build_model(
        cfg["model"], feat.shape[1], cfg.get("hidden", 16), ds.num_classes
    )
    params = model.init(jax.random.PRNGKey(0), g, feat)
    tx = optax.adam(cfg.get("lr", 1e-2))
    opt_state = tx.init(params)
    rng = jax.random.PRNGKey(1)

    @jax.jit
    def step(params, opt_state, rng):
        def loss_fn(p):
            logits = model.apply(
                p, g, feat, deterministic=False, rngs={"dropout": rng}
            )
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
            return (ls * train_mask).sum() / train_mask.sum()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.perf_counter()
    for epoch in range(cfg.get("epochs", 200)):
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, sub)
        if epoch % 20 == 0:
            print(f"epoch {epoch:4d} loss {float(loss):.4f}")
    logits = model.apply(params, g, feat)
    pred = jnp.argmax(logits, -1)
    acc = float(((pred == labels) * test_mask).sum() / test_mask.sum())
    print(
        f"done in {time.perf_counter()-t0:.2f}s; test accuracy {acc:.4f}"
    )
    return acc


def _run_nodepred_ns(cfg: dict):
    import subprocess

    # delegates to the example script logic inline
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from . import dataloading
    from .base import NID

    ds = _load_dataset(cfg["dataset"])
    g = ds[0]
    feats = g.ndata["feat"]
    labels = g.ndata["label"].astype(jnp.int32)
    train_ids = np.nonzero(np.asarray(g.ndata["train_mask"]))[0]
    fanouts = cfg.get("fanouts", [10, 10])
    bs = cfg.get("batch_size", 256)
    sampler = dataloading.FixedShapeNeighborSampler(fanouts, batch_size=bs, seed=0)
    model = _build_model(
        cfg["model"], feats.shape[1], cfg.get("hidden", 128), ds.num_classes,
        num_layers=len(fanouts),
    )
    _, _, blocks0 = sampler.sample_blocks(g, train_ids[:bs])
    params = model.init(
        jax.random.PRNGKey(0), blocks0, feats[blocks0[0].srcdata[NID]]
    )
    tx = optax.adam(cfg.get("lr", 1e-3))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, blocks, x, y, ymask):
        def loss_fn(p):
            logits = model.apply(p, blocks, x)
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return (ls * ymask).sum() / jnp.maximum(ymask.sum(), 1)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for epoch in range(cfg.get("epochs", 5)):
        loader = dataloading.DataLoader(
            g, train_ids, sampler, batch_size=bs, shuffle=True, seed=epoch
        )
        tot, nb = 0.0, 0
        t0 = time.perf_counter()
        for _, _, blocks in loader:
            x = feats[blocks[0].srcdata[NID]] * blocks[0].srcdata["_mask"][:, None]
            y = labels[blocks[-1].dstdata[NID]]
            ymask = blocks[-1].dstdata["_mask"].astype(jnp.float32)
            params, opt_state, loss = step(params, opt_state, blocks, x, y, ymask)
            tot += float(loss)
            nb += 1
        print(f"epoch {epoch} loss {tot/nb:.4f} ({time.perf_counter()-t0:.2f}s)")


def _run_graphpred(cfg: dict):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from flax import linen as fnn

    from .batch import batch as batch_graphs
    from . import readout
    from .data import GraphClassificationDataset
    from .nn.conv import GINConv

    ds = GraphClassificationDataset(num_graphs=96)
    graphs = [ds[i][0] for i in range(len(ds))]
    labels = np.array([int(ds[i][1]) for i in range(len(ds))])
    bg = batch_graphs(graphs)
    x = bg.ndata["feat"]
    y = jnp.asarray(labels)
    hidden = cfg.get("hidden", 32)

    class GIN(fnn.Module):
        @fnn.compact
        def __call__(self, g, h):
            mlp1 = fnn.Sequential([fnn.Dense(hidden), jax.nn.relu, fnn.Dense(hidden)])
            h = GINConv(apply_func=mlp1, aggregator_type="sum", name="gin0")(g, h)
            h = jax.nn.relu(h)
            mlp2 = fnn.Sequential([fnn.Dense(hidden), jax.nn.relu, fnn.Dense(hidden)])
            h = GINConv(apply_func=mlp2, aggregator_type="sum", name="gin1")(g, h)
            with g.local_scope() as gg:
                gg.ndata["h"] = h
                hg = readout.mean_nodes(gg, "h")
            return fnn.Dense(ds.num_classes, name="head")(hg)

    model = GIN()
    params = model.init(jax.random.PRNGKey(0), bg, x)
    tx = optax.adam(cfg.get("lr", 5e-3))
    opt_state = tx.init(params)

    @jax.jit
    def step(p, st):
        loss, grads = jax.value_and_grad(
            lambda p: optax.softmax_cross_entropy_with_integer_labels(
                model.apply(p, bg, x), y
            ).mean()
        )(p)
        u, st = tx.update(grads, st)
        return optax.apply_updates(p, u), st, loss

    for epoch in range(cfg.get("epochs", 60)):
        params, opt_state, loss = step(params, opt_state)
        if epoch % 20 == 0:
            print(f"epoch {epoch} loss {float(loss):.4f}")
    pred = np.asarray(jnp.argmax(model.apply(params, bg, x), -1))
    acc = (pred == labels).mean()
    print(f"graph classification accuracy {acc:.4f}")
    return acc


def _run_linkpred(cfg: dict):
    sys.argv = ["linkpred", "--epochs", str(cfg.get("epochs", 50))]
    import importlib.util
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples", "link_prediction.py",
    )
    spec = importlib.util.spec_from_file_location("linkpred_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()


_EXPORT_TEMPLATE = '''\
"""Standalone {pipeline} training script generated by `dgl_tpu export`
(reference ``dglgo/cli/export_cli.py``: the same config -> script codegen,
without the yaml/typer/jinja stack). Edit freely — it has no dependency on
the CLI."""
import time

import jax
import jax.numpy as jnp
import optax

import dgl_tpu
from dgl_tpu import add_self_loop, remove_self_loop
from dgl_tpu.cli import _build_model, _load_dataset
from dgl_tpu.checkpoint import save_checkpoint

CFG = {cfg!r}


def main():
    ds = _load_dataset(CFG["dataset"])
    g = add_self_loop(remove_self_loop(ds[0]))
    feat = g.ndata["feat"]
    labels = g.ndata["label"].astype(jnp.int32)
    train_mask = g.ndata["train_mask"].astype(jnp.float32)
    test_mask = g.ndata["test_mask"]
    model = _build_model(CFG["model"], feat.shape[1],
                         CFG.get("hidden", 16), ds.num_classes)
    params = model.init(jax.random.PRNGKey(0), g, feat)
    tx = optax.adam(CFG.get("lr", 1e-2))
    opt_state = tx.init(params)
    rng = jax.random.PRNGKey(1)

    @jax.jit
    def step(params, opt_state, rng):
        def loss_fn(p):
            logits = model.apply(p, g, feat, deterministic=False,
                                 rngs={{"dropout": rng}})
            ls = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels)
            return (ls * train_mask).sum() / train_mask.sum()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.perf_counter()
    for epoch in range(CFG.get("epochs", 200)):
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, sub)
        if epoch % 20 == 0:
            print(f"epoch {{epoch:4d}} loss {{float(loss):.4f}}")
    logits = model.apply(params, g, feat)
    pred = jnp.argmax(logits, -1)
    acc = float(((pred == labels) * test_mask).sum() / test_mask.sum())
    print(f"done in {{time.perf_counter()-t0:.2f}}s; "
          f"test accuracy {{acc:.4f}}")
    if CFG.get("checkpoint"):
        save_checkpoint(CFG["checkpoint"], params, step=CFG.get("epochs"))
        print("checkpoint saved to", CFG["checkpoint"])


if __name__ == "__main__":
    main()
'''


def _run_apply(cfg: dict):
    """Inference from a trained checkpoint (reference
    ``dglgo/apply_pipeline/nodepred``): writes per-node predictions and
    prints accuracy on labeled nodes."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from . import add_self_loop, remove_self_loop
    from .checkpoint import load_checkpoint

    ds = _load_dataset(cfg["dataset"])
    g = add_self_loop(remove_self_loop(ds[0]))
    feat = g.ndata["feat"]
    model = _build_model(
        cfg["model"], feat.shape[1], cfg.get("hidden", 16), ds.num_classes
    )
    params = model.init(jax.random.PRNGKey(0), g, feat)
    params, _step = load_checkpoint(cfg["checkpoint"], params,
                                    return_step=True)
    logits = model.apply(params, g, feat)
    pred = np.asarray(jnp.argmax(logits, -1))
    out = cfg.get("output", "predictions.npy")
    np.save(out, pred)
    labels = np.asarray(g.ndata["label"])
    acc = float((pred == labels).mean())
    print(f"predictions for {pred.shape[0]} nodes saved to {out}; "
          f"all-node accuracy {acc:.4f}")
    return out


def main(argv=None):
    p = argparse.ArgumentParser(prog="dgl_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    rp = sub.add_parser("recipe", help="list built-in recipes")
    rp.add_argument("action", choices=["list", "get"])
    rp.add_argument("name", nargs="?")

    cp = sub.add_parser("configure", help="emit a pipeline config JSON")
    cp.add_argument("pipeline", choices=["nodepred", "nodepred-ns", "linkpred", "graphpred"])
    cp.add_argument("--model", default="gcn")
    cp.add_argument("--dataset", default="cora")
    cp.add_argument("--epochs", type=int, default=200)
    cp.add_argument("--lr", type=float, default=1e-2)
    cp.add_argument("--hidden", type=int, default=16)

    tp = sub.add_parser("train", help="run a pipeline")
    tp.add_argument("--cfg", help="config JSON path")
    tp.add_argument("--pipeline", choices=["nodepred", "nodepred-ns", "linkpred", "graphpred"])
    tp.add_argument("--model", default="gcn")
    tp.add_argument("--dataset", default="cora")
    tp.add_argument("--epochs", type=int)
    tp.add_argument("--lr", type=float)
    tp.add_argument("--hidden", type=int)

    ep = sub.add_parser(
        "export", help="generate a standalone training script from a config "
        "(reference dglgo export)")
    ep.add_argument("--cfg", help="config JSON path")
    ep.add_argument("--output", default="script.py")
    ep.add_argument("--checkpoint", help="path the script saves params to")

    ap = sub.add_parser(
        "apply", help="run inference from a trained checkpoint "
        "(reference dglgo apply)")
    ap.add_argument("--cfg", help="config JSON path")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--model", default="gcn")
    ap.add_argument("--dataset", default="cora")
    ap.add_argument("--hidden", type=int, default=16)
    ap.add_argument("--output", default="predictions.npy")

    args = p.parse_args(argv)

    if args.cmd == "recipe":
        if args.action == "list":
            for name in RECIPES:
                print(name)
        else:
            print(json.dumps(RECIPES[args.name], indent=2))
        return

    if args.cmd == "configure":
        print(
            json.dumps(
                {
                    "pipeline": args.pipeline,
                    "model": args.model,
                    "dataset": args.dataset,
                    "epochs": args.epochs,
                    "lr": args.lr,
                    "hidden": args.hidden,
                },
                indent=2,
            )
        )
        return

    if args.cmd == "export":
        if args.cfg:
            with open(args.cfg) as f:
                cfg = json.load(f)
        else:
            cfg = {"pipeline": "nodepred", "model": "gcn",
                   "dataset": "cora"}
        if cfg.get("pipeline", "nodepred") != "nodepred":
            raise SystemExit("export currently supports the nodepred "
                             "pipeline (reference dglgo parity scope)")
        if args.checkpoint:
            cfg["checkpoint"] = args.checkpoint
        with open(args.output, "w") as f:
            f.write(_EXPORT_TEMPLATE.format(
                pipeline=cfg.get("pipeline", "nodepred"), cfg=cfg))
        print(f"standalone script written to {args.output}")
        return

    if args.cmd == "apply":
        cfg = {}
        if args.cfg:
            with open(args.cfg) as f:
                cfg = json.load(f)
        cfg.setdefault("model", args.model)
        cfg.setdefault("dataset", args.dataset)
        cfg.setdefault("hidden", args.hidden)
        cfg["checkpoint"] = args.checkpoint
        cfg["output"] = args.output
        _run_apply(cfg)
        return

    if args.cmd == "train":
        if args.cfg:
            with open(args.cfg) as f:
                cfg = json.load(f)
        else:
            cfg = {
                "pipeline": args.pipeline or "nodepred",
                "model": args.model,
                "dataset": args.dataset,
            }
        for k in ("epochs", "lr", "hidden"):
            v = getattr(args, k, None)
            if v is not None:
                cfg[k] = v
        pipeline = cfg.get("pipeline", "nodepred")
        if pipeline == "nodepred":
            _run_nodepred(cfg)
        elif pipeline == "nodepred-ns":
            _run_nodepred_ns(cfg)
        elif pipeline == "linkpred":
            _run_linkpred(cfg)
        elif pipeline == "graphpred":
            _run_graphpred(cfg)
        else:
            raise SystemExit(f"unknown pipeline {pipeline!r}")


if __name__ == "__main__":
    main()
