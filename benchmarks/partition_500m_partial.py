#!/usr/bin/env python
"""Checkpoint-state artifact for the 500M partition run.

The kway chain is resumable (DGL_TPU_KWAY_WORKDIR): every coarsen level
saves its mapping, the coarsest graph / coarse assignment / per-level
refinements each save as they land. If the full run is cut off by the
round boundary, this script turns the log + workdir into the honest
intermediate artifact: MEASURED per-level seconds (the "measured
per-level budget" of the verdict's done-criterion), completion state,
and the projection for what remains — explicitly labeled partial, to be
overwritten by the completed run's ``partition_500m_r05.json``.

Usage: python benchmarks/partition_500m_partial.py <log> [workdir]
"""
import json
import os
import re
import sys


def main():
    log_path = sys.argv[1] if len(sys.argv) > 1 else "/root/part500m.log"
    workdir = sys.argv[2] if len(sys.argv) > 2 else "/root/kway_500m"
    txt = open(log_path).read()

    levels = []
    for m in re.finditer(r"\[kway\] coarsen (\d+) -> (\d+) nodes "
                         r"\((\d+) nnz\) (\d+)s", txt):
        levels.append({"from_nodes": int(m.group(1)),
                       "to_nodes": int(m.group(2)),
                       "nnz": int(m.group(3)),
                       "seconds": int(m.group(4))})
    refines = []
    for m in re.finditer(r"\[kway\] refine @(\d+) nodes (\d+)s "
                         r"level-cut ([\d,]+)", txt):
        refines.append({"nodes": int(m.group(1)),
                        "seconds": int(m.group(2)),
                        "level_cut": int(m.group(3).replace(",", ""))})
    m = re.search(r"\[kway\] coarse bisection (\d+)s", txt)
    bisect_s = int(m.group(1)) if m else None
    m = re.search(r"built in (\d+)s; planted cut ([\d,]+)", txt)
    build_s = int(m.group(1)) if m else None
    planted = int(m.group(2).replace(",", "")) if m else None
    m = re.search(r"sym_adj (\d+)s nnz=([\d,]+)", txt)
    sym_s = int(m.group(1)) if m else None

    ck = sorted(os.listdir(workdir)) if os.path.isdir(workdir) else []
    stage = ("refinement" if any(f.startswith("parts_lvl") for f in ck)
             else "coarse-bisection" if "coarse_parts.npy" in ck
             else "bisection" if "coarsest.npz" in ck
             else "coarsen-chain")

    out = {
        "artifact": "partition_500m_r05_partial",
        "status": ("PARTIAL: round boundary cut the run; the chain is "
                   "checkpointed and resumes from this workdir state. "
                   "Every number below is MEASURED, not projected."),
        "n_nodes": 50_000_000,
        "n_edges": 500_000_000,
        "k": 16,
        "chain": ("unpruned coarsen (stride-independent: these level "
                  "timings hold for any refinement plan) + native "
                  "OpenMP kway_gains refinement. NOTE: this run was "
                  "launched with refine-stride 2, which subsequently "
                  "FAILED its 100M quality gate (cut ratio 1.5252 vs "
                  "1.0000 full-chain, docs/partition_100m_r05.json) — "
                  "the completed rerun must refine EVERY level "
                  "(stride 1), re-spilling the levels this workdir "
                  "skipped"),
        "build_seconds": build_s,
        "planted_cut": planted,
        "sym_adj_seconds": sym_s,
        "measured_coarsen_levels": levels,
        "coarse_bisection_seconds": bisect_s,
        "measured_refine_levels": refines,
        "completed_stage": stage,
        "workdir_files": len(ck),
        "host": "4-core CPU, shared with the round's TPU benches",
        "supersedes": "docs/partition_500m_r04.json (quality-destroying "
                      "prune, withdrawn)",
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "partition_500m_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print("wrote", path)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
