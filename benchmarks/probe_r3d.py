"""Round-3 probe D: bf16 features end-to-end on the flagship minibatch.

probe_r3b showed the v5e row gather is issue-rate bound (~2.9 ns/row) for
any row width up to 512 B, so bf16 features (200 B rows at feat=100)
should NOT speed the gather below that width — revising the round-2
assumption that bf16 halves gather cost. This probe measures the full
on-device-sampled epoch at f32 vs bf16 features to record the actual
end-to-end delta (expected ~nil on time; halved feature HBM footprint).

  timeout 560 python benchmarks/probe_r3d.py f32
  timeout 560 python benchmarks/probe_r3d.py bf16
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "f32"
    dtype = {"f32": "float32", "bf16": "bfloat16"}[mode]
    import jax

    import bench
    import dgl_tpu

    print("devices:", jax.devices(), flush=True)
    N, E = 169_343, 1_166_243
    rng = np.random.default_rng(0)
    w = 1.0 / np.arange(1, N + 1)
    src = rng.choice(N, E, p=w / w.sum())
    dst = rng.integers(0, N, E)
    g = dgl_tpu.graph((src, dst), num_nodes=N)
    out = bench._sage_end_to_end(g, rng, iters=3, feat_dtype=dtype)
    print(mode, out, flush=True)


if __name__ == "__main__":
    main()
