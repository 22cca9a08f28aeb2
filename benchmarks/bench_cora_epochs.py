"""GCN/GAT citation-dataset 200-epoch training times on one TPU chip.

The reference's flagship small-model numbers (BASELINE.md /
``docs/source/performance.rst:41-49``): GCN Cora 200 epochs = 0.666 s, GAT
Cora = 1.399 s on a single GPU. Same config here (2-layer, hidden 16 / 8x8
heads, dropout 0.5, Adam 1e-2), the whole 200-epoch loop inside ONE jit
via ``lax.fori_loop`` so the axon tunnel's ~50 ms/dispatch overhead is paid
once, timed by scalar-fetch differencing (k vs 1 epochs — see
memory:axon-tpu-quirks).

Run: timeout 590 python benchmarks/bench_cora_epochs.py [--device cpu]
Prints one JSON line per model.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--device", default=None, choices=[None, "cpu"])
    p.add_argument("--datasets", nargs="+",
                   default=["cora", "citeseer", "pubmed"])
    p.add_argument("--hubs", default="512",
                   help="hub-table size for with_spmm_plans ('auto' or int)")
    p.add_argument("--models", nargs="+", default=["gcn", "gat"])
    p.add_argument("--no-plans", action="store_true",
                   help="skip with_spmm_plans (classic segment path)")
    args = p.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    import optax

    import dgl_tpu as dgl
    from dgl_tpu.data import (
        CiteseerGraphDataset, CoraGraphDataset, PubmedGraphDataset,
    )
    from dgl_tpu.models import GAT, GCN

    # reference single-GPU 200-epoch times, docs/source/performance.rst:41-49
    REF = {("gcn", "cora"): 0.666, ("gat", "cora"): 1.399,
           ("gcn", "citeseer"): 0.674, ("gat", "citeseer"): 1.399,
           ("gcn", "pubmed"): 0.690}
    DSETS = {"cora": CoraGraphDataset, "citeseer": CiteseerGraphDataset,
             "pubmed": PubmedGraphDataset}
    for dname in args.datasets:
        hubs = args.hubs if args.hubs == "auto" else int(args.hubs)
        run_dataset(dname, DSETS[dname](), REF, jax, jnp, np, optax,
                    dgl, GAT, GCN, hubs=hubs, models=args.models,
                    no_plans=args.no_plans)


def run_dataset(dname, ds, REF, jax, jnp, np, optax, dgl, GAT, GCN,
                hubs=512, models=("gcn", "gat"), no_plans=False):
    import json
    import time

    g = dgl.add_self_loop(dgl.remove_self_loop(ds[0]))
    if jax.devices()[0].platform != "cpu" and not no_plans:
        # segment-free SpMM/edge-softmax fast paths (ops/shell_spmm.py);
        # skipped on CPU where the dense-hub matmul has no MXU to run on
        g = g.with_spmm_plans(num_hubs=hubs, weighted=True)
    feat = g.ndata["feat"]
    y = g.ndata["label"].astype(jnp.int32)
    tm = g.ndata["train_mask"].astype(jnp.float32)
    sm = g.ndata["test_mask"]
    C = ds.num_classes

    # optimizer configs follow the reference example scripts: GCN Adam 1e-2
    # (examples/core/gcn/train.py), GAT Adam 5e-3 + weight decay 5e-4 with
    # feat/attn dropout 0.6 active during training (examples/pytorch/gat)
    # GCN uses the exact static-input aggregation cache: A(XW)=(AX)W with
    # constant X, so layer-1's g-SpMM (fwd+bwd) leaves the epoch loop
    # entirely (nn/conv/graphconv.py::precompute_graphconv; measured
    # PubMed 1.673 -> 0.899 ms/epoch on the v5e, probe_r3a "cached")
    from dgl_tpu.nn import precompute_graphconv

    feat_gcn = jax.jit(
        lambda gg, xx: precompute_graphconv(gg, xx))(g, feat)
    configs = {
        "gcn": (GCN(feat.shape[1], 16, C, dropout=0.5,
                    static_input_agg=True),
                REF.get(("gcn", dname)), optax.adam(1e-2), False),
        "gat": (GAT(feat.shape[1], 8, C, heads=8),
                REF.get(("gat", dname)),
                optax.adamw(5e-3, weight_decay=5e-4), False),
    }
    for name, (model, ref_s, tx, train_det) in configs.items():
        if ref_s is None or name not in models:
            continue  # reference publishes no number for this pair
        x_in = feat_gcn if name == "gcn" else feat
        params = model.init(jax.random.PRNGKey(0), g, x_in)
        opt0 = tx.init(params)

        def epoch_body(i, carry):
            params, opt_state, key = carry
            key, sub = jax.random.split(key)

            def loss_fn(p):
                logits = model.apply(
                    p, g, x_in, deterministic=train_det,
                    rngs={"dropout": sub},
                )
                ls = optax.softmax_cross_entropy_with_integer_labels(
                    logits, y
                )
                return (ls * tm).sum() / tm.sum()

            _, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, key

        @jax.jit
        def train(params, opt_state, k):
            params, opt_state, _ = jax.lax.fori_loop(
                0, k, epoch_body, (params, opt_state, jax.random.PRNGKey(1))
            )
            logits = model.apply(params, g, x_in)
            pred = jnp.argmax(logits, -1)
            acc = jnp.where(sm, pred == y, 0).sum() / sm.sum()
            return acc

        def t(k):
            acc = float(train(params, opt0, jnp.int32(k)))  # warm/compile
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(train(params, opt0, jnp.int32(k)))
                best = min(best, time.perf_counter() - t0)
            return best, acc

        t1, _ = t(1)
        t200, acc = t(200)
        dt = t200 - t1  # 199 epochs net of dispatch+eval overhead
        total = dt * 200 / 199
        print(
            json.dumps(
                {
                    "metric": f"{name}_{dname}_200epoch_s",
                    "value": round(total, 4),
                    "unit": "s",
                    "vs_baseline": round(ref_s / total, 2),
                    "detail": {
                        "reference_s": ref_s,
                        "test_acc": round(acc, 4),
                        "device": str(jax.devices()[0].device_kind),
                        "dataset": ds.__class__.__name__,
                    },
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
