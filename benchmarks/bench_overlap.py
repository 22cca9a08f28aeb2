"""Measure GraphBolt DataLoader overlap: prefetch thread + double-buffered
CopyTo vs a serial pipeline (reference ``graphbolt/dataloader.py:108-191``
gets the same overlap from datapipe rewriting + non_blocking copies).

Consumer simulates a training step with a jit matmul over the fetched
features, so sampling/fetch (host) genuinely overlaps compute.

Run: python benchmarks/bench_overlap.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np

import jax
import jax.numpy as jnp

import dgl_tpu as dgl
from dgl_tpu import graphbolt as gb


def build_pipe(g, store, items, batch_size):
    dp = gb.ItemSampler(items, batch_size=batch_size, shuffle=True, seed=0)
    dp = gb.NeighborSamplerStage(dp, g, [10, 10], batch_size=batch_size,
                                 seed=0)
    dp = gb.FeatureFetcher(dp, store, ["feat"])
    dp = gb.CopyTo(dp)
    return dp


def run(loader, w, steps_per_batch=1):
    @jax.jit
    def step(x, w):
        h = x
        for _ in range(8):
            h = jnp.tanh(h @ w)
        return h.sum()

    t0 = time.perf_counter()
    n = 0
    for mb in loader:
        x = mb.node_features["feat"]
        s = float(step(x, w))
        n += 1
    return n / (time.perf_counter() - t0)


def main():
    rng = np.random.default_rng(0)
    N, E, F, B = 50_000, 500_000, 256, 1024
    g = dgl.graph(
        (rng.integers(0, N, E), rng.integers(0, N, E)), num_nodes=N
    )
    feats = rng.normal(size=(N, F)).astype(np.float32)
    store = gb.FeatureStore({("node", "_N", "feat"): feats})
    items = gb.ItemSet(np.arange(B * 16), names="seeds")
    w = jnp.asarray(rng.normal(size=(F, F)).astype(np.float32) * 0.05)

    modes = {
        "serial": dict(use_prefetch_thread=False),
        "prefetch": dict(use_prefetch_thread=True, overlap_copy=False),
        "prefetch+overlap-copy": dict(use_prefetch_thread=True,
                                      overlap_copy=True),
    }
    results = {}
    for name, kw in modes.items():
        pipe = build_pipe(g, store, items, B)
        run(gb.DataLoader(pipe, **kw), w)  # warm (compile)
        pipe = build_pipe(g, store, items, B)
        results[name] = run(gb.DataLoader(pipe, **kw), w)
        print(f"{name:24s} {results[name]:.2f} batches/s")
    base = results["serial"]
    for name, v in results.items():
        print(f"{name:24s} speedup vs serial: {v / base:.2f}x")


if __name__ == "__main__":
    main()
