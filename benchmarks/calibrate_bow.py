"""Calibrate the BoW synthetic citation stand-ins to the published
accuracy bands (reference docs/source/performance.rst:41-49):
GCN cora 0.813 / citeseer 0.710 / pubmed 0.790; GAT cora 0.840 /
citeseer 0.700.

Sweeps (topic_mass, homophily, words_per_doc) per dataset; trains
GCN + GAT with the bench_model_acc recipe (2-layer, h=16 / 8x8 heads,
dropout 0.5/0.6, adam 1e-2, 200 epochs, planetoid split: 20/class train,
500 val, 1000 test). CPU-only.

  python benchmarks/calibrate_bow.py cora 'tm=0.75,hom=0.68,wpd=18'
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(_sys.argv[0] if __name__ == "__main__" else __file__))))
import sys
import zlib

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")  # calibration is CPU-only


STATS = {
    "cora": (2708, 10556, 1433, 7, 18.0),
    "citeseer": (3327, 9228, 3703, 6, 32.0),
    "pubmed": (19717, 88651, 500, 3, 50.0),
}


def build(name, tm, hom, wpd, mix, hub=0.0, comms=0):
    import jax.numpy as jnp
    import dgl_tpu as dgl
    from dgl_tpu.data.synthetic import synthetic_classification_graph
    from dgl_tpu.transforms.functional import to_bidirected

    n, e, d, c, _ = STATS[name]
    g = synthetic_classification_graph(
        n, e, c, d, seed=zlib.crc32(name.encode()) % 2**31,
        homophily=hom, feature_mode="bow", words_per_doc=wpd,
        topic_words=min(96, d // c), topic_mass=tm, topic_mix=mix, noise_hubs=hub,
        num_communities=comms,
    )
    rng = np.random.default_rng(0)
    labels = np.asarray(g.ndata["label"])
    train_mask = np.zeros(n, bool)
    for cls in range(c):
        ids = np.nonzero(labels == cls)[0]
        train_mask[rng.choice(ids, size=min(20, ids.size), replace=False)] = True
    rest = np.nonzero(~train_mask)[0]
    rng.shuffle(rest)
    val_mask = np.zeros(n, bool)
    test_mask = np.zeros(n, bool)
    val_mask[rest[:500]] = True
    test_mask[rest[500:1500]] = True
    g.ndata["train_mask"] = jnp.asarray(train_mask)
    g.ndata["val_mask"] = jnp.asarray(val_mask)
    g.ndata["test_mask"] = jnp.asarray(test_mask)
    feats = dict(g._node_frames.get("_N", {}))
    g = to_bidirected(g, copy_ndata=True)
    g._node_frames["_N"] = feats
    return g, c


def train_eval(model_name, g, num_classes, epochs=200):
    """Published per-model recipe (reference examples/pytorch/{gcn,gat}):
    GCN adam lr 1e-2 wd 5e-4; GAT adam lr 5e-3 wd 5e-4; test accuracy at
    the best-validation epoch (the papers' early-stopping protocol)."""
    import jax
    import jax.numpy as jnp
    import optax
    import dgl_tpu as dgl
    from dgl_tpu.models import GAT, GCN

    g = dgl.add_self_loop(dgl.remove_self_loop(g))
    feat = g.ndata["feat"]
    labels = g.ndata["label"].astype(jnp.int32)
    train_mask = g.ndata["train_mask"].astype(jnp.float32)
    val_mask = np.asarray(g.ndata["val_mask"])
    test_mask = np.asarray(g.ndata["test_mask"])
    model = {
        "gcn": lambda: GCN(feat.shape[1], 16, num_classes),
        "gat": lambda: GAT(feat.shape[1], 8, num_classes, heads=8),
    }[model_name]()
    params = model.init(jax.random.PRNGKey(0), g, feat)
    lr = {"gcn": 1e-2, "gat": 5e-3}[model_name]
    tx = optax.chain(optax.add_decayed_weights(5e-4), optax.adam(lr))
    opt_state = tx.init(params)
    rng = jax.random.PRNGKey(1)

    @jax.jit
    def step(params, opt_state, rng):
        def loss_fn(p):
            logits = model.apply(
                p, g, feat, deterministic=False, rngs={"dropout": rng})
            ls = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels)
            return (ls * train_mask).sum() / train_mask.sum()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    y = np.asarray(labels)
    best_val, best_test = -1.0, 0.0
    for ep in range(epochs):
        rng, sub = jax.random.split(rng)
        params, opt_state, _ = step(params, opt_state, sub)
        if ep % 5 == 4 or ep == epochs - 1:
            pred = np.asarray(jnp.argmax(model.apply(params, g, feat), -1))
            va = float((pred[val_mask] == y[val_mask]).mean())
            if va > best_val:
                best_val = va
                best_test = float((pred[test_mask] == y[test_mask]).mean())
    return best_test


def main():
    name = sys.argv[1]
    for spec in sys.argv[2:]:
        kv = dict(p.split("=") for p in spec.split(","))
        tm = float(kv.get("tm", 0.75))
        hom = float(kv.get("hom", 0.7))
        wpd = float(kv.get("wpd", STATS[name][4]))
        mix = float(kv.get("mix", 0.0))
        hub = float(kv.get("hub", 0.0))
        comms = int(kv.get("comms", 0))
        g, c = build(name, tm, hom, wpd, mix, hub, comms)
        accs = {m: train_eval(m, g, c) for m in ("gcn", "gat")}
        print(f"{name} tm={tm} hom={hom} wpd={wpd} mix={mix} hub={hub} comms={comms}: "
              f"gcn={accs['gcn']:.3f} gat={accs['gat']:.3f}", flush=True)


if __name__ == "__main__":
    main()
