#!/usr/bin/env python
"""Multi-host launcher (reference ``tools/launch.py`` SSH launcher).

On TPU pods the runtime launches one process per host and
``jax.distributed.initialize()`` discovers peers — no SSH orchestration is
needed. This launcher covers the remaining case: spawning N local processes
to emulate a multi-host run (testing) or launching with an explicit
coordinator for CPU/GPU clusters.

Usage:
    python tools/launch.py --num-procs 4 -- python train_script.py ...
"""
import argparse
import os
import subprocess
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-procs", type=int, required=True)
    p.add_argument("--coordinator", default="127.0.0.1:12355")
    p.add_argument("cmd", nargs=argparse.REMAINDER)
    args = p.parse_args()
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        p.error("no command given after --")

    procs = []
    for rank in range(args.num_procs):
        env = dict(os.environ)
        env.update(
            {
                "DGL_TPU_COORDINATOR": args.coordinator,
                "DGL_TPU_NUM_PROCS": str(args.num_procs),
                "DGL_TPU_PROC_ID": str(rank),
            }
        )
        procs.append(subprocess.Popen(cmd, env=env))
    rc = 0
    for proc in procs:
        rc |= proc.wait()
    sys.exit(rc)


if __name__ == "__main__":
    main()
