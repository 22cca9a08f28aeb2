"""Round-4 scaling artifact (verdict #6): measured virtual-mesh curve
PLUS (a) analytic comm-volume accounting per step, (b) a roofline-style
predicted ICI time and 1->8 scaling efficiency for real v5e hardware,
and (c) a CONTENTION CONTROL quantifying the virtual-mesh harness
artifact (8 XLA programs time-slicing 4 cores).

The round-3 curve (docs/scaling_r03.json) recorded 8.5-14.5% efficiency
with only a caveat; this artifact separates harness contention from real
comm cost:

  - measured: dist_spmm step time at 1/2/4/8 virtual devices (same as
    round 3).
  - control: the SAME 2-device benchmark in a fresh process with only
    2 virtual devices (2 programs on 4 cores, uncontended) — the ratio
    control/contended is the harness artifact factor.
  - predicted: halo all_to_all bytes per chip per step (from the shard
    routing tables — exact, not sampled) divided by v5e ICI bandwidth
    (45 GB/s per link conservative, 4 links = 180 GB/s upper), against
    local-compute time from the driver-verified on-chip SpMM rate
    (BENCH_SELF.json); overlapped (delayed-halo) and serial columns.

Writes docs/scaling_r04.json. Run:
  DGL_TPU_FORCE_CPU=1 XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/bench_scaling_r04.py
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

# v5e ICI assumptions (per chip): 4 links; ~45 GB/s usable per link per
# direction (scaling-book class numbers). All-to-all on a 2D torus uses
# multiple links; we report the conservative 1-link and the 4-link bound.
ICI_LOW, ICI_HIGH = 45e9, 180e9


def build_graph(N, E, kind):
    import dgl_tpu as dgl

    rng = np.random.default_rng(0)
    if kind == "uniform-random":
        # NO cut structure: worst case for partition parallelism (the
        # halo is inherently ~all-to-all)
        return dgl.graph((rng.integers(0, N, E), rng.integers(0, N, E)),
                         num_nodes=N)
    # planted 8-community SBM: the realistic case (real-world graphs
    # partition with small cuts; our partitioner recovers them)
    k = 8
    labels = rng.integers(0, k, N).astype(np.int32)
    src = rng.integers(0, N, E)
    intra = rng.random(E) < 0.9
    order = np.argsort(labels, kind="stable")
    cs = np.searchsorted(labels[order], np.arange(k + 1))
    lo = cs[labels[src]]
    width = cs[labels[src] + 1] - lo
    dst = np.where(intra,
                   order[lo + (rng.random(E) * width).astype(np.int64)],
                   rng.integers(0, N, E))
    return dgl.graph((src, dst), num_nodes=N)


def measured_curve(N, E, F, kind):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from bench_scaling import bench_mesh

    g = build_graph(N, E, kind)
    n_avail = len(jax.devices())
    out = []
    base_dt = None
    for n_dev in [n for n in (1, 2, 4, 8) if n <= n_avail]:
        dt, shards = bench_mesh(g, n_dev, F)
        if base_dt is None:
            base_dt = dt
        # exact per-chip comm accounting from the routing tables
        P = shards.num_parts
        padded_bytes = 2 * P * shards.h_max * F * 4  # sent + received
        useful_rows = float(np.asarray(shards.send_mask).sum()) / max(P, 1)
        useful_bytes = 2 * useful_rows * F * 4
        # local compute traffic model: msgs gather + segment write
        local_bytes = (E / P + N / P) * F * 4
        out.append({
            "n_devices": n_dev,
            "ms_per_iter": round(dt * 1e3, 2),
            "edges_per_s": round(E / dt),
            "scaling_efficiency": round((base_dt / dt) / n_dev, 3),
            "h_max": shards.h_max,
            "comm_bytes_per_chip_padded": int(padded_bytes),
            "comm_bytes_per_chip_useful": int(useful_bytes),
            "local_compute_bytes_per_chip": int(local_bytes),
        })
        print(json.dumps({"graph_kind": kind, **out[-1]}), flush=True)
    return out


def predict(records, F, spmm_gbps):
    """Roofline prediction for real v5e chips over ICI."""
    pred = []
    for r in records:
        t_local = r["local_compute_bytes_per_chip"] / (spmm_gbps * 1e9)
        t_comm_low = r["comm_bytes_per_chip_padded"] / ICI_LOW
        t_comm_high = r["comm_bytes_per_chip_padded"] / ICI_HIGH
        serial = t_local + t_comm_low
        overlapped = max(t_local, t_comm_low)
        overlapped4 = max(t_local, t_comm_high)
        pred.append({
            "n_devices": r["n_devices"],
            "t_local_ms": round(t_local * 1e3, 3),
            "t_ici_ms_1link": round(t_comm_low * 1e3, 3),
            "t_ici_ms_4link": round(t_comm_high * 1e3, 3),
            "t_step_serial_ms": round(serial * 1e3, 3),
            "t_step_overlapped_ms": round(overlapped * 1e3, 3),
            "t_step_overlapped_4link_ms": round(overlapped4 * 1e3, 3),
        })
    t1 = pred[0]["t_local_ms"]  # single chip: no comm
    for p in pred:
        p["pred_efficiency_overlapped"] = round(
            t1 / (p["n_devices"] * p["t_step_overlapped_ms"]), 3)
        p["pred_efficiency_overlapped_4link"] = round(
            t1 / (p["n_devices"] * p["t_step_overlapped_4link_ms"]), 3)
        p["pred_efficiency_serial"] = round(
            t1 / (p["n_devices"] * p["t_step_serial_ms"]), 3)
    return pred


def contention_control(N, E, F):
    """Run the 2-device case in a fresh process with ONLY 2 virtual
    devices (uncontended: 2 programs / 4 cores)."""
    code = (
        "import sys, json; sys.path.insert(0, %r);"
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import numpy as np; import dgl_tpu as dgl;"
        "from bench_scaling import bench_mesh;"
        "rng=np.random.default_rng(0);"
        "g=dgl.graph((rng.integers(0,%d,%d),rng.integers(0,%d,%d)),"
        "num_nodes=%d);"
        "dt,_=bench_mesh(g,2,%d);"
        "print('CTRL', json.dumps({'ms_per_iter': round(dt*1e3,2)}))"
        % (os.path.dirname(os.path.abspath(__file__)), N, E, N, E, N, F)
    )
    env = {**os.environ,
           "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
           "JAX_PLATFORMS": "cpu"}
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, timeout=1200)
    for line in r.stdout.decode().splitlines():
        if line.startswith("CTRL "):
            return json.loads(line[5:])
    return {"error": r.stderr.decode()[-500:]}


def main():
    N, E, F = 100_000, 1_000_000, 128
    spmm_gbps = 329.7  # driver-verified on-chip rate (BENCH_SELF.json)
    try:
        with open(os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "BENCH_SELF.json")) as f:
            spmm_gbps = json.load(f)["value"]
    except (OSError, KeyError, ValueError):
        pass

    curves = {}
    preds = {}
    for kind in ("planted-sbm", "uniform-random"):
        records = measured_curve(N, E, F, kind)
        curves[kind] = records
        preds[kind] = predict(records, F, spmm_gbps)
    ctrl = contention_control(N, E, F)
    two = next((r for r in curves["uniform-random"]
                if r["n_devices"] == 2), None)
    harness_factor = (round(two["ms_per_iter"] / ctrl["ms_per_iter"], 2)
                      if two and "ms_per_iter" in ctrl else None)

    out = {
        "artifact": "scaling_r04",
        "graph": {"N": N, "E": E, "feat": F},
        "measured_virtual_mesh": curves,
        "contention_control_2dev_uncontended": ctrl,
        "harness_contention_factor_2dev": harness_factor,
        "predicted_v5e": {
            "assumptions": {
                "spmm_gbps_onchip": spmm_gbps,
                "ici_gbps_per_chip": [ICI_LOW / 1e9, ICI_HIGH / 1e9],
                "overlap": "delayed-halo path overlaps a2a with local "
                           "SpMM (dist_copy_u_sum_delayed)",
                "note": "comm bytes are EXACT from the shard routing "
                        "tables (padded h_max slots, what actually "
                        "ships); uniform-random is the no-cut worst "
                        "case, planted-sbm the realistic clustered case",
            },
            "records": preds,
        },
        "baseline_target": ">=80% edges/s efficiency 1->N",
    }
    p8 = next((p for p in preds["planted-sbm"]
               if p["n_devices"] == 8), None)
    if p8:
        out["predicted_1to8_efficiency_overlapped_sbm"] = (
            p8["pred_efficiency_overlapped"])
    p8u = next((p for p in preds["uniform-random"]
                if p["n_devices"] == 8), None)
    if p8u:
        out["predicted_1to8_efficiency_overlapped_uniform"] = (
            p8u["pred_efficiency_overlapped"])
    print(json.dumps({k: out[k] for k in
                      ("harness_contention_factor_2dev",
                       "predicted_1to8_efficiency_overlapped_sbm",
                       "predicted_1to8_efficiency_overlapped_uniform")
                      if k in out}), flush=True)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "scaling_r04.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
