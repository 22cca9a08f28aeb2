"""End-to-end accuracy through the BITMAP paths (round-4 verdict weak
#5): the bitmap SpMM/GAT kernels compute in bf16 (expand + MXU); this
pins the end-to-end accuracy effect against the classic per-edge path
on the calibrated synthetics, 200-epoch published recipes.

Writes docs/bitmap_accuracy_r05.json. CPU-runnable (the XLA fallback
uses the same bf16 compute dtype as the Pallas kernel).

Run: nohup python benchmarks/bench_bitmap_acc.py &
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

if not os.environ.get("DGL_TPU_BITMAP_ACC_TPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import optax

import dgl_tpu as dgl
from dgl_tpu.data import CoraGraphDataset


def train_eval(g, model, params_rng, feat, labels, tr, va, te,
               epochs=200, lr=1e-2, wd=5e-4):
    p = model.init(jax.random.PRNGKey(params_rng), g, feat)
    tx = optax.adamw(lr, weight_decay=wd)
    st = tx.init(p)

    @jax.jit
    def step(p, st):
        def loss_fn(p):
            logits = model.apply(p, g, feat)
            ls = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels)
            return (ls * tr).sum() / tr.sum()

        l, gr = jax.value_and_grad(loss_fn)(p)
        up, st = tx.update(gr, st, p)
        return optax.apply_updates(p, up), st, l

    best_va, best_te = 0.0, 0.0
    logits_fn = jax.jit(lambda p: model.apply(p, g, feat))
    for e in range(epochs):
        p, st, l = step(p, st)
        if e % 5 == 4 or e == epochs - 1:
            pred = jnp.argmax(logits_fn(p), -1) == labels
            va_acc = float((pred * va).sum() / va.sum())
            if va_acc >= best_va:
                best_va = va_acc
                best_te = float((pred * te).sum() / te.sum())
    return best_te


def main():
    ds = CoraGraphDataset()
    g0 = dgl.add_self_loop(dgl.remove_self_loop(ds[0]))
    feat = g0.ndata["feat"]
    labels = g0.ndata["label"].astype(jnp.int32)
    tr = g0.ndata["train_mask"].astype(jnp.float32)
    va = g0.ndata["val_mask"].astype(jnp.float32)
    te = g0.ndata["test_mask"].astype(jnp.float32)
    g_bitmap = g0.with_spmm_plans(bitmap=True)
    assert g_bitmap._relation(None).bitmap_plan is not None

    from dgl_tpu.models import GCN
    from dgl_tpu.nn.conv import GATConv

    import flax.linen as nn

    class GAT(nn.Module):
        in_f: int
        classes: int

        @nn.compact
        def __call__(self, g, x):
            h = GATConv(self.in_f, 8, num_heads=8,
                        allow_zero_in_degree=True)(g, x)
            h = nn.elu(h.reshape(h.shape[0], -1))
            h = GATConv(64, self.classes, num_heads=1,
                        allow_zero_in_degree=True)(g, h)
            return h.reshape(h.shape[0], -1)

    out = {"artifact": "bitmap_accuracy_r05",
           "dataset": "cora (calibrated synthetic BoW, published recipe)",
           "epochs": 200,
           "device": str(jax.devices()[0].device_kind),
           "runs": {}}
    for name, model in (
            ("gcn", GCN(feat.shape[1], 16, ds.num_classes, dropout=0.0)),
            ("gat", GAT(feat.shape[1], ds.num_classes))):
        accs_classic, accs_bitmap = [], []
        for seed in range(3):
            t0 = time.time()
            accs_classic.append(train_eval(
                g0, model, seed, feat, labels, tr, va, te))
            accs_bitmap.append(train_eval(
                g_bitmap, model, seed, feat, labels, tr, va, te))
            print(f"{name} seed {seed}: classic {accs_classic[-1]:.4f} "
                  f"bitmap {accs_bitmap[-1]:.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
        out["runs"][name] = {
            "classic_path_acc": round(float(np.mean(accs_classic)), 4),
            "bitmap_path_acc": round(float(np.mean(accs_bitmap)), 4),
            "classic_std": round(float(np.std(accs_classic)), 4),
            "bitmap_std": round(float(np.std(accs_bitmap)), 4),
            "delta": round(float(np.mean(accs_bitmap)
                                 - np.mean(accs_classic)), 4),
        }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "bitmap_accuracy_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print("wrote", path, json.dumps(out["runs"]), flush=True)


if __name__ == "__main__":
    main()
