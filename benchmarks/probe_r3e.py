"""Round-3 probe E: padded chunk-tree segmented reduction vs sorted segment_sum.

Motivation (Reddit-scale full-graph): the hub plan's shell decomposition
caps at SHELL_CAP=32 levels; on a dense graph (avg in-degree ~500) nearly
every cold edge lands in the RESIDUAL sorted segment-sum, which costs
~14 ns/edge on v5e (the scatter lowering — docs/performance.md). The
chunk tree replaces it: pad each segment's sorted run to a multiple of W,
gather (OOB slots fill 0), reshape to (M/W, W, F) and sum axis=1 — a
contiguous full-bandwidth reduction — then recurse on the chunk sums
until every segment is one slot. Per-edge overhead beyond the mandatory
row gather: the level-k gathers issue M/W^k rows, so ~2.9/W ns/edge
geometric series, plus one streaming pass over the gathered rows.

Modes:
  segsum  E=10M sorted segment_sum baseline (expect ~14 ns/edge)
  tree    same input via chunk tree, W in {8, 16, 32}
  acc     numerical check vs numpy f64 (small E, CPU-safe)

Run: timeout 560 python benchmarks/probe_r3e.py segsum
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


E, N, F = 10_000_000, 233_000, 16


def make_sorted_segments(rng, e=E, n=N, lognormal_sigma=1.0):
    """Sorted segment ids with a lognormal degree profile (Reddit-like)."""
    w = rng.lognormal(0.0, lognormal_sigma, n)
    seg = rng.choice(n, e, p=w / w.sum())
    seg.sort()
    return seg.astype(np.int32)


def build_tree_indices(seg_sorted, n_out, W):
    """Host: per-level gather indices (int32, OOB = len(prev level))."""
    counts = np.bincount(seg_sorted, minlength=n_out).astype(np.int64)
    levels = []
    cur = counts  # runs per segment at this level, data in seg order
    cur_len = int(cur.sum())
    while True:
        padded = np.maximum(-(-cur // W), 1) * W  # >=1 chunk per segment
        m = int(padded.sum())
        # index of element j of segment s at this level -> start[s] + j
        start = np.concatenate(([0], np.cumsum(cur)))[:-1]
        pstart = np.concatenate(([0], np.cumsum(padded)))[:-1]
        idx = np.full(m, cur_len, np.int32)  # OOB -> fill 0
        # for each real element i (level order): segment s, offset o within
        # its run; padded slot = pstart[s] + o
        seg_of = np.repeat(np.arange(n_out, dtype=np.int64), cur)
        off = np.arange(cur_len, dtype=np.int64) - start[seg_of]
        idx[pstart[seg_of] + off] = np.arange(cur_len, dtype=np.int32)
        levels.append(idx)
        cur = padded // W  # chunks per segment after the reshape-sum
        cur_len = m // W
        if int(cur.max()) <= 1:
            break
    return levels


def tree_sum(levels, rows, n_out, W):
    x = rows
    for idx in levels:
        g = jnp.take(x, idx, axis=0, mode="fill", fill_value=0)
        x = g.reshape(-1, W, x.shape[1]).sum(axis=1)
    return x[:n_out]


def chain_time(fn, vals, iters=8):
    """fori_loop k-differencing timer (scalar fetch; axon-safe).

    The carry scalar perturbs the input each iteration so XLA cannot
    hoist ``fn`` out of the loop; the (E, F) add is one streaming pass,
    identical across candidates (compare deltas, or against the ``null``
    mode which measures just that pass).
    """
    @jax.jit
    def run(kk, v):
        def body(i, c):
            return fn(v + c * 1e-30) * 1e-20 + c * 0.5

        return jax.lax.fori_loop(0, kk, body, jnp.float32(1.0))

    def t(k):
        float(run(jnp.int32(k), vals))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(jnp.int32(k), vals))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = t(1)
    tk = t(iters + 1)
    return (tk - t1) / iters


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "segsum"
    rng = np.random.default_rng(0)

    if mode == "acc":
        jax.config.update("jax_platforms", "cpu")
        seg = make_sorted_segments(rng, 200_000, 5_000)
        vals = rng.normal(size=(seg.shape[0], 4)).astype(np.float32)
        ref = np.zeros((5_000, 4), np.float64)
        np.add.at(ref, seg, vals.astype(np.float64))
        for W in (8, 16, 32):
            levels = [jnp.asarray(l) for l in
                      build_tree_indices(seg, 5_000, W)]
            out = np.asarray(tree_sum(levels, jnp.asarray(vals), 5_000, W))
            err = np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-9)
            log(f"W={W}: levels={len(levels)} relerr={err:.2e}")
        return

    log(f"devices: {jax.devices()}")
    seg = make_sorted_segments(rng)
    # generate on device: a single >200 MB host transfer can wedge the
    # remote runtime (memory: axon-tpu-quirks)
    vals = jax.jit(
        lambda: jax.random.normal(jax.random.PRNGKey(0), (E, F), jnp.float32)
    )()
    segd = jnp.asarray(seg)

    if mode == "gather":
        # isolate: take E rows from a small (N, F) table vs from a big
        # (E, F) table — does table size move the issue rate?
        idx_small = jnp.asarray(rng.integers(0, N, E).astype(np.int32))
        table_small = jax.jit(
            lambda: jax.random.normal(jax.random.PRNGKey(1), (N, F))
        )()

        def f_small(v):
            return jnp.take(table_small + v[0, 0], idx_small, axis=0,
                            mode="fill", fill_value=0).sum()

        dt = chain_time(f_small, vals)
        log(f"gather E rows from (N,F): {dt*1e3:.2f} ms "
            f"= {dt/E*1e9:.2f} ns/row")

        idx_big = jnp.asarray(rng.integers(0, E, E).astype(np.int32))

        def f_big(v):
            return jnp.take(v, idx_big, axis=0, mode="fill",
                            fill_value=0).sum()

        dt = chain_time(f_big, vals)
        log(f"gather E rows from (E,F): {dt*1e3:.2f} ms "
            f"= {dt/E*1e9:.2f} ns/row")

        def f_clip(v):
            return jnp.take(v, idx_big, axis=0, mode="clip").sum()

        dt = chain_time(f_clip, vals)
        log(f"gather clip-mode from (E,F): {dt*1e3:.2f} ms "
            f"= {dt/E*1e9:.2f} ns/row")
        return

    if mode == "tree2":
        # realistic integration shape: level-0 gathers from the (N, F)
        # feature table through composed src indices; deeper levels gather
        # from small intermediates
        table = jax.jit(
            lambda: jax.random.normal(jax.random.PRNGKey(1), (N, F))
        )()
        src = rng.integers(0, N, E).astype(np.int32)
        for W in (8, 16, 32):
            counts = np.bincount(seg, minlength=N)
            levels = build_tree_indices(seg, N, W)
            # compose level 0 with src ids (OOB -> N, take-fill zeroes)
            l0 = levels[0]
            composed = np.where(l0 >= E, N, src[np.minimum(l0, E - 1)])
            levels = [jnp.asarray(composed.astype(np.int32))] + [
                jnp.asarray(l) for l in levels[1:]
            ]
            sizes = [int(l.shape[0]) for l in levels]
            log(f"W={W}: level sizes {sizes}")

            def f(t, levels=tuple(levels), W=W):
                x = t
                for idx in levels:
                    g = jnp.take(x, idx, axis=0, mode="fill", fill_value=0)
                    x = g.reshape(-1, W, x.shape[1]).sum(axis=1)
                return x[:N].sum()

            dt = chain_time(f, table)
            log(f"W={W}: {dt*1e3:.2f} ms = {dt/E*1e9:.2f} ns/edge")
        return

    if mode == "segsum":
        def f(v):
            return jax.ops.segment_sum(
                v, segd, num_segments=N, indices_are_sorted=True
            ).sum()

        dt = chain_time(f, vals)
        log(f"sorted segment_sum: {dt*1e3:.2f} ms = {dt/E*1e9:.2f} ns/edge")
    elif mode == "tree":
        for W in (8, 16, 32):
            levels = [jnp.asarray(l) for l in build_tree_indices(seg, N, W)]
            sizes = [int(l.shape[0]) for l in levels]
            log(f"W={W}: level sizes {sizes} "
                f"(pad overhead {sizes[0]/E-1:+.1%})")

            def f(v, levels=tuple(levels), W=W):
                return tree_sum(levels, v, N, W).sum()

            dt = chain_time(f, vals)
            log(f"W={W}: {dt*1e3:.2f} ms = {dt/E*1e9:.2f} ns/edge")
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
