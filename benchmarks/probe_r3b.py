"""Round-3 probe B: narrow-feature gather economics on the v5e.

The PubMed-class epoch is 100% bound by the XLA row-gather issue rate
(~4 ns/row at F=16, probe_r3a). Candidate fixes measured here:

  width   : gather cost vs row width F in {8,16,32,64,128,256} f32 —
            locate the issue-rate -> bandwidth crossover. If a 512 B row
            costs ~2x a 64 B row, packing 8 narrow rows per 128-lane row
            is a ~4x win at density 1.
  packed  : gather from a packed (N/8, 128) table (each fetched row
            carries 8 node rows of F=16) + reshape to (8m, 16) —
            end-to-end packed fetch rate vs the narrow gather.
  countmm : the expand/reduce side for a packed-block SpMM: static int8
            count-matrix (128, BU) @ (BU, 16) block matmuls streaming
            from HBM — measures ns/edge-slot of the MXU reduce.

Each mode runs in its own process (wedge discipline):
  timeout 560 python benchmarks/probe_r3b.py width
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


N = 19720  # pubmed-scale, multiple of 8
E = 108368  # E + self loops, multiple of 8


def chain(fn, x, k):
    """k-iteration dependent chain; time by scalar fetch (axon: no
    block_until_ready). ``fn`` gets a carry-derived int32 scalar it MUST
    fold into its indices so XLA can't hoist the op out of the loop."""

    @jax.jit
    def run(x, kk):
        def body(i, c):
            tweak = (c[0, 0] * 1e-30).astype(jnp.int32)  # always 0, opaque
            return 0.999 * c + fn(c, tweak)

        return jnp.sum(jax.lax.fori_loop(0, kk, body, x))

    def t(kk):
        kk = jnp.int32(kk)
        float(run(x, kk))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x, kk))
            best = min(best, time.perf_counter() - t0)
        return best

    iters = 30
    return (t(1 + iters) - t(1)) / iters


def mode_width():
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N, E).astype(np.int32))
    for F in (8, 16, 32, 64, 128, 256):
        tab = jnp.asarray(rng.normal(size=(N, F)), jnp.float32)

        def gfn(c, tweak, tab=tab, F=F):
            g = jnp.take(tab, idx + tweak, axis=0)  # (E, F)
            return g[:, :8]

        c0 = jnp.zeros((E, 8), jnp.float32)
        dt = chain(gfn, c0, 1)
        log(f"F={F:4d} f32 row={F*4:5d}B: {dt*1e3:8.3f} ms "
            f"= {dt/E*1e9:6.2f} ns/row  {E*F*4/dt/1e9:7.1f} GB/s useful")


def mode_packed():
    rng = np.random.default_rng(0)
    F = 16
    # packed table: 8 node-rows of F=16 per 128-lane row
    tabp = jnp.asarray(rng.normal(size=(N // 8, 128)), jnp.float32)
    for density in (1.0, 0.5, 0.25, 0.125):
        m = int(E * 0.125 / density)  # fetched blocks to cover E node-slots
        bidx = jnp.asarray(rng.integers(0, N // 8, m).astype(np.int32))

        def gfn(c, tweak, m=m, bidx=bidx):
            g = jnp.take(tabp, bidx + tweak, axis=0)  # (m, 128)
            r = g.reshape(m * 8, 16)  # unpack to node rows
            return r[: E, :8][:c.shape[0]]

        c0 = jnp.zeros((min(E, m * 8), 8), jnp.float32)
        dt = chain(gfn, c0, 1)
        log(f"packed density={density:5.3f} blocks={m:7d}: {dt*1e3:8.3f} ms "
            f"= {dt/m*1e9:6.2f} ns/block = {dt/(m*8*density)*1e9:6.2f} ns/useful-row")


def mode_countmm():
    rng = np.random.default_rng(0)
    F = 16
    # block-diagonal count-matrix reduce: (nc, 128, BU) int8 @ (nc, BU, F)
    for BU in (512, 1024, 2048):
        nc = N // 128  # dst chunks
        A = jnp.asarray(
            (rng.random((nc, 128, BU)) < 0.01).astype(np.int8))
        T = jnp.asarray(rng.normal(size=(nc, BU, F)), jnp.bfloat16)

        def gfn(c, tweak, A=A, T=T, nc=nc):
            Ad = jax.lax.dynamic_slice_in_dim(A, tweak, nc, axis=0)
            out = jax.lax.dot_general(
                Ad.astype(jnp.bfloat16), T,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # (nc,128,F)
            return out.reshape(nc * 128, F)[: c.shape[0], :8]

        c0 = jnp.zeros((nc * 128, 8), jnp.float32)
        dt = chain(gfn, c0, 1)
        slots = nc * 128 * BU
        log(f"countmm BU={BU:5d}: {dt*1e3:8.3f} ms  A-bytes={nc*128*BU/1e6:6.1f}MB "
            f"= {nc*128*BU/dt/1e9:6.1f} GB/s A-stream = {dt/slots*1e9*1000:6.2f} ps/slot")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "width"
    log("devices:", jax.devices())
    {"width": mode_width, "packed": mode_packed, "countmm": mode_countmm}[mode]()


if __name__ == "__main__":
    main()
