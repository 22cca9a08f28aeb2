"""Localhost multi-process distributed tests (the reference's
tests/distributed trick: spawn REAL processes over loopback,
``test_distributed_sampling.py:172-196``)."""
import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import jax
    jax.config.update("jax_platforms", "cpu")
    import dgl_tpu.distributed as dist

    dist.initialize()
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    val = jnp.array([float(dist.get_rank() + 1)])
    total = multihost_utils.process_allgather(val)
    assert total.ravel().tolist() == [1.0, 2.0], total
    print(f"OK rank {dist.get_rank()}")
    """
)


def test_two_process_launch(tmp_path):
    # hang protection comes from the subprocess timeout below (pytest-timeout
    # is not installed, so a mark.timeout would silently not apply)
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # avoid device-count interference
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "launch.py"),
         "--num-procs", "2", "--coordinator", "127.0.0.1:13579", "--",
         sys.executable, str(worker)],
        env=env, capture_output=True, text=True, timeout=170,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert r.stdout.count("OK rank") == 2, r.stdout + r.stderr
