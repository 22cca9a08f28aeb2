"""Model speed benchmarks (reference ``benchmarks/benchmarks/model_speed/``):
per-epoch full-graph training time for GCN/GAT/SAGE. One JSON line each."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import json
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-nodes", type=int, default=20_000)
    p.add_argument("--num-edges", type=int, default=200_000)
    p.add_argument("--feat", type=int, default=128)
    p.add_argument("--epochs", type=int, default=10)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    import dgl_tpu as dgl
    from dgl_tpu.models import GAT, GCN, GraphSAGE

    rng = np.random.default_rng(0)
    N, E, F, C = args.num_nodes, args.num_edges, args.feat, 16
    g = dgl.add_self_loop(
        dgl.graph((rng.integers(0, N, E), rng.integers(0, N, E)), num_nodes=N)
    )
    if jax.devices()[0].platform != "cpu":
        # segment-free fast paths (hub matmul + shells); CPU keeps classic
        g = g.with_spmm_plans(weighted=True)
    x = jnp.asarray(rng.normal(size=(N, F)), dtype=jnp.float32)
    y = jnp.asarray(rng.integers(0, C, N), dtype=jnp.int32)

    models = {
        "gcn": GCN(F, 64, C, dropout=0.0),
        "gat": GAT(F, 8, C, heads=8, feat_drop=0.0, attn_drop=0.0),
        "sage": GraphSAGE(F, 64, C, num_layers=2, dropout=0.0),
    }
    for name, model in models.items():
        params = model.init(jax.random.PRNGKey(0), g, x)
        tx = optax.adam(1e-3)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state):
            def loss_fn(pp):
                logits = model.apply(pp, g, x)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, y
                ).mean()

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        params, opt_state, loss = step(params, opt_state)
        float(loss)  # compile + sync
        t0 = time.perf_counter()
        for _ in range(args.epochs):
            params, opt_state, loss = step(params, opt_state)
        float(loss)
        per_epoch = (time.perf_counter() - t0) / args.epochs
        print(
            json.dumps(
                {
                    "bench": f"model_speed_{name}",
                    "num_nodes": N,
                    "num_edges": g.num_edges(),
                    "feat": F,
                    "s_per_epoch": round(per_epoch, 5),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
