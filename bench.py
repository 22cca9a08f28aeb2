"""Headline benchmark: g-SpMM copy_u/sum throughput vs HBM roofline.

Mirrors the reference's kernel tracker
(``benchmarks/benchmarks/kernel/bench_gspmm_copy_u.py:10-29``: edges x feat /
time on an arxiv-scale graph) measured as effective HBM GB/s on one chip.
``vs_baseline`` = fraction of the chip's HBM roofline (the BASELINE.json
"SpMM GB/s vs roofline" target; >= 1.0 would be speed-of-light).

Prints ONE JSON line.
"""
import json
import os
import time

# persistent XLA compile cache: repeated driver runs skip recompilation
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax.numpy as jnp

# per-chip HBM bandwidth roofline (GB/s)
_ROOFLINES = {
    "v5 lite": 819.0,  # TPU v5e
    "v5e": 819.0,
    "v4": 1228.0,
    "v5p": 2765.0,
    "v6": 1640.0,  # v6e (Trillium)
    "cpu": 50.0,
}


def _roofline(device) -> float:
    kind = getattr(device, "device_kind", "cpu").lower()
    for key, bw in _ROOFLINES.items():
        if key in kind:
            return bw
    return _ROOFLINES["cpu"]


def _preflight(timeout_s: int = 90) -> bool:
    """Probe the default (remote TPU) backend in a subprocess with a hard
    timeout — the axon tunnel can wedge, and a hung jax.devices() would
    otherwise hang the whole benchmark run."""
    import subprocess
    import sys

    for _ in range(1):  # single try: a wedged tunnel stays wedged for minutes
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp;"
                 "print(float(jnp.ones((8,8)).sum()))"],
                timeout=timeout_s, capture_output=True,
            )
            if r.returncode == 0 and b"64.0" in r.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
    return False


class _BenchTimeout(Exception):
    pass


def _watchdog(signum, frame):
    raise _BenchTimeout()


def main():
    import subprocess
    import sys

    fallback = os.environ.get("DGL_TPU_BENCH_CPU") == "1"
    child = os.environ.get("DGL_TPU_BENCH_TPU_CHILD") == "1"
    if child:
        # parent supervises with a hard timeout; run straight on the TPU
        _run(False)
        return
    if not fallback and _preflight():
        print("preflight ok; supervising TPU child", file=sys.stderr)
        # A SIGALRM watchdog cannot interrupt a hung C call into the remote
        # runtime, so the TPU attempt runs in a SUBPROCESS the parent can
        # kill. 420s fits a healthy cached run (~4-5 min incl. remote init
        # and transfers) while still bounding a mid-run wedge.
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env={**os.environ, "DGL_TPU_BENCH_TPU_CHILD": "1"},
                timeout=420, capture_output=True,
            )
            out = r.stdout.decode()
            if r.returncode == 0 and '"metric"' in out:
                sys.stdout.write(out[out.index('{"metric"'):])
                return
        except subprocess.TimeoutExpired:
            print("TPU child exceeded 420s; killed", file=sys.stderr)
    # TPU unreachable or the attempt stalled: report from host CPU
    import jax

    jax.config.update("jax_platforms", "cpu")
    _run(True)


def _run(fallback: bool):
    import jax
    import jax.numpy as jnp

    import dgl_tpu
    from dgl_tpu import ops

    # ogbn-arxiv scale: 169k nodes, 1.17M edges, feat 256 (reference tracker's
    # largest feat size)
    N, E, F = 169_343, 1_166_243, 256
    rng = np.random.default_rng(0)
    src = rng.integers(0, N, E)
    dst = rng.integers(0, N, E)
    g = dgl_tpu.graph((src, dst), num_nodes=N)
    # host transfer (not jax.random on device): the transfer path needs no
    # fresh XLA program, so a warm compile cache keeps the TPU benchmark
    # alive even when the remote compile service is wedged; the watchdog in
    # main() covers the remaining hang modes
    x = jnp.asarray(rng.normal(size=(N, F)), dtype=jnp.float32)

    # Chain iterations (output feeds the next input) inside one jit and
    # return a scalar, then time k=1 vs k=1+iters and difference: the fixed
    # dispatch/tunnel overhead cancels. (block_until_ready is unreliable on
    # the remote axon platform, so we force a scalar fetch instead.)
    from functools import partial

    iters = 20

    @jax.jit
    def chained(g, x, k):
        def body(_, h):
            return ops.copy_u_sum(g, h) * 1e-3  # rescale to avoid overflow
        # dynamic trip count -> ONE compile serves both timing points
        return jnp.sum(jax.lax.fori_loop(0, k, body, x))

    float(chained(g, x, 1))  # compile once

    def timed(k, reps=2):
        k = jnp.int32(k)
        float(chained(g, x, k))  # warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chained(g, x, k))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (timed(1 + iters) - timed(1)) / iters

    # effective bytes: read E gathered rows + write N rows (the roofline
    # accounting used for SpMM: gather-dominated traffic)
    bytes_moved = (E + N) * F * 4
    gbps = bytes_moved / dt / 1e9
    roof = _roofline(jax.devices()[0])
    print(
        json.dumps(
            {
                "metric": "gspmm_copy_u_sum_effective_bw",
                "value": round(gbps, 2),
                "unit": "GB/s",
                "vs_baseline": round(gbps / roof, 4),
                "detail": {
                    "graph": "arxiv-scale-random",
                    "N": N,
                    "E": E,
                    "feat": F,
                    "ms_per_iter": round(dt * 1e3, 3),
                    "edges_per_s": round(E / dt),
                    "device": str(jax.devices()[0].device_kind) + (" (tpu-unreachable fallback)" if fallback else ""),
                    "roofline_gbps": roof,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
