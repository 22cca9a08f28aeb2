"""Round-4 probe A: bitmap-packed dense SpMM for high-degree graphs.

Reddit-class graphs (N=233k, E=114M, avg degree ~490) break every
gather-based SpMM path: E row-gathers at the measured ~2.9 ns/row issue
floor (probe_r3b) cost 330 ms/pass and scale with E. But at this density
the DENSE formulation scales with N^2, not E: store the adjacency as a
packed BITMAP (N^2/8 bytes = 6.8 GB for Reddit — fits HBM), stream it
tile-by-tile, expand bits -> bf16 on the VPU in VMEM, and matmul on the
MXU. Per-pass cost model: N^2 * (0.15 ps bitmap stream + ~0.8 ps VPU
expand + MXU slot) ~= 60-130 ms — degree-skew INDEPENDENT (the uniform
worst case from round-2 weak #3 runs at identical speed).

Modes (each in its own process, wedge discipline):
  xla     : lax.scan over dst-chunks; expand + dot in plain XLA (the
            expanded (C, N) bf16 tile round-trips HBM — measures how much
            that costs vs pallas).
  pallas  : the real kernel — grid (dst_chunk, src_tile), bits block
            (C, S/8) uint8 -> VMEM, expand to (C, S) bf16 in VMEM, MXU
            dot with the (S, F) X tile, accumulate (C, F) f32 in VMEM.
  gather  : the existing per-edge baseline at the same E (sorted-segment
            path floor: E gathers) for the crossover check.

Usage: timeout 560 python benchmarks/probe_r4a.py pallas [N] [F]
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


def chain_time(run, x0, iters=10):
    """Difference k+1 vs 1 chained calls (fixed overhead cancels)."""
    def t(kk):
        kk = jnp.int32(kk)
        float(run(x0, kk))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x0, kk))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(1 + iters) - t(1)) / iters


def expand_bits_xla(bits_u8, S):
    """(C, S//8) uint8 -> (C, S) bf16 of 0/1, LSB-first."""
    r = jnp.repeat(bits_u8.astype(jnp.int32), 8, axis=1)  # (C, S)
    sh = jax.lax.broadcasted_iota(jnp.int32, r.shape, 1) % 8
    return ((r >> sh) & 1).astype(jnp.bfloat16)


def mode_xla(N, F, C=1024):
    rng = np.random.default_rng(0)
    p = 0.0021  # Reddit density
    bits = jnp.asarray(
        rng.integers(0, 256, (N, N // 8), dtype=np.uint8))
    x = jnp.asarray(rng.normal(size=(N, F)), jnp.bfloat16)

    @jax.jit
    def spmm_chain(x, k):
        def body(_, h):
            def chunk(c, _):
                b = jax.lax.dynamic_slice_in_dim(bits, c * C, C, 0)
                a = expand_bits_xla(b, N)
                return c + 1, jax.lax.dot_general(
                    a, h, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            _, y = jax.lax.scan(chunk, 0, None, length=N // C)
            return (y.reshape(N, F) * 1e-4).astype(jnp.bfloat16)
        return jnp.sum(jax.lax.fori_loop(0, k, body, x))

    dt = chain_time(spmm_chain, x, iters=5)
    log(f"xla N={N} F={F} C={C}: {dt*1e3:8.2f} ms/pass "
        f"= {N*N/dt/1e12:6.2f} Tcell/s  bitmap {N*N/8/dt/1e9:6.1f} GB/s")


def mode_pallas(N, F, C=None, S=4096):
    import dgl_tpu.ops.bitmap_spmm as bs
    from dgl_tpu.ops.bitmap_spmm import (
        _bitmap_matmul_pallas, unpack_host)
    if C is not None:
        bs._C = C
    C = bs._C

    rng = np.random.default_rng(0)
    # bits generated ON DEVICE (the axon tunnel moves ~4 MB/s — a 6.8 GB
    # host bitmap would take ~30 min to upload); timing is independent of
    # bit content (fixed-shape dataflow), correctness is checked on a
    # host-roundtripped slice
    t0 = time.time()
    bits = jax.jit(
        lambda k: jax.random.bits(k, (N, N // 8), jnp.uint8)
    )(jax.random.PRNGKey(0))
    float(jnp.sum(bits[0, :8].astype(jnp.int32)))
    log(f"device gen {bits.nbytes/1e9:.2f} GB in {time.time()-t0:.1f}s")
    bits_np = np.asarray(bits[:64])
    x = jnp.asarray(rng.normal(size=(N, F)), jnp.bfloat16)

    # bits as a jit ARGUMENT: closed over, 6.8 GB of HLO constants
    @jax.jit
    def spmm(bits, h):
        return _bitmap_matmul_pallas(bits, h, jnp.bfloat16)

    @jax.jit
    def spmm_chain(bits, x, k):
        def body(_, h):
            return (_bitmap_matmul_pallas(bits, h, jnp.bfloat16)
                    * 1e-4).astype(jnp.bfloat16)
        return jnp.sum(jax.lax.fori_loop(0, k, body, x))

    # correctness vs numpy on a small slice (plane-packed layout)
    y = spmm(bits, x)
    ref = unpack_host(bits_np).astype(np.float32) @ np.asarray(x, np.float32)
    err = np.abs(np.asarray(y[:64]) - ref).max() / max(np.abs(ref).max(), 1)
    log(f"correctness max rel err (64 rows): {err:.2e}")

    dt = chain_time(lambda x, k: spmm_chain(bits, x, k), x, iters=10)
    log(f"pallas N={N} F={F} C={C} S={S}: {dt*1e3:8.2f} ms/pass "
        f"= {N*N/dt/1e12:6.2f} Tcell/s  bitmap {N*N/8/dt/1e9:6.1f} GB/s")


def mode_gather(N, F):
    rng = np.random.default_rng(0)
    E = int(N * 490)
    idx = jnp.asarray(rng.integers(0, N, E).astype(np.int32))
    seg = jnp.asarray(np.sort(rng.integers(0, N, E)).astype(np.int32))
    x = jnp.asarray(rng.normal(size=(N, F)), jnp.float32)

    @jax.jit
    def run(x, k):
        def body(_, h):
            g = jnp.take(h, idx, axis=0)
            y = jax.ops.segment_sum(g, seg, num_segments=N,
                                    indices_are_sorted=True)
            return y * 1e-4
        return jnp.sum(jax.lax.fori_loop(0, k, body, x))

    dt = chain_time(run, x, iters=3)
    log(f"gather N={N} E={E} F={F}: {dt*1e3:8.2f} ms/pass "
        f"= {dt/E*1e9:5.2f} ns/edge")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "pallas"
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 233_472
    F = int(sys.argv[3]) if len(sys.argv) > 3 else 48
    C = int(sys.argv[4]) if len(sys.argv) > 4 else None
    log("devices:", jax.devices())
    if mode == "pallas":
        mode_pallas(N, F, C)
    else:
        {"xla": mode_xla, "gather": mode_gather}[mode](N, F)


if __name__ == "__main__":
    main()
