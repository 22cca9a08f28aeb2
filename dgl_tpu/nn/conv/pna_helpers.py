"""PNA/DGN aggregator and scaler functions (reference
``python/dgl/nn/pytorch/conv/pnaconv.py:8-100`` and ``dgnconv.py:11-60``).

These operate on the dense (num_dst, deg, D) stacked-message tensor the
reference's degree-bucketed reduce produces — the same layout our padded
uniform-stride blocks give for free (mask the padding rows before
calling, or use :class:`PNAConv` which fuses them into segment kernels).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "aggregate_mean",
    "aggregate_max",
    "aggregate_min",
    "aggregate_sum",
    "aggregate_var",
    "aggregate_std",
    "aggregate_moment_3",
    "aggregate_moment_4",
    "aggregate_moment_5",
    "aggregate_dir_av",
    "aggregate_dir_dx",
    "scale_identity",
    "scale_amplification",
    "scale_attenuation",
    "get_aggregate_fn",
]


def aggregate_mean(h):
    """(reference ``pnaconv.py:8``)."""
    return jnp.mean(h, axis=1)


def aggregate_max(h):
    return jnp.max(h, axis=1)


def aggregate_min(h):
    return jnp.min(h, axis=1)


def aggregate_sum(h):
    return jnp.sum(h, axis=1)


def aggregate_var(h):
    """(reference ``pnaconv.py:33``)."""
    h_mean_squares = jnp.mean(h * h, axis=1)
    h_mean = jnp.mean(h, axis=1)
    return jnp.maximum(h_mean_squares - h_mean * h_mean, 0.0)


def aggregate_std(h):
    return jnp.sqrt(aggregate_var(h) + 1e-30)


def _aggregate_moment(h, n):
    h_mean = jnp.mean(h, axis=1, keepdims=True)
    h_n = jnp.mean((h - h_mean) ** n, axis=1)
    return jnp.sign(h_n) * jnp.abs(h_n + 1e-30) ** (1.0 / n)


def aggregate_moment_3(h):
    return _aggregate_moment(h, 3)


def aggregate_moment_4(h):
    return _aggregate_moment(h, 4)


def aggregate_moment_5(h):
    return _aggregate_moment(h, 5)


def aggregate_dir_av(h, eig_s, eig_d, eig_idx):
    """Directional average over an eigenvector field (reference
    ``dgnconv.py:11``)."""
    w = jnp.abs(eig_s[:, :, eig_idx] - eig_d[:, :, eig_idx])
    w = w / (jnp.sum(w, axis=1, keepdims=True) + 1e-30)
    return jnp.sum(h * w[..., None], axis=1)


def aggregate_dir_dx(h, eig_s, eig_d, h_in, eig_idx):
    """Directional derivative (reference ``dgnconv.py:34``)."""
    w = eig_s[:, :, eig_idx] - eig_d[:, :, eig_idx]
    w = w / (jnp.sum(jnp.abs(w), axis=1, keepdims=True) + 1e-30)
    return jnp.abs(jnp.sum(h * w[..., None], axis=1) - h_in)


def scale_identity(h, D=None, delta=None):
    """(reference ``pnaconv.py:64``)."""
    return h


def scale_amplification(h, D, delta):
    """(reference ``pnaconv.py:69``)."""
    return h * (jnp.log(D + 1) / delta)[:, None]


def scale_attenuation(h, D, delta):
    """(reference ``pnaconv.py:74``)."""
    return h * (delta / jnp.log(D + 1))[:, None]


AGGREGATORS = {
    "mean": aggregate_mean,
    "max": aggregate_max,
    "min": aggregate_min,
    "sum": aggregate_sum,
    "var": aggregate_var,
    "std": aggregate_std,
    "moment3": aggregate_moment_3,
    "moment4": aggregate_moment_4,
    "moment5": aggregate_moment_5,
}


def get_aggregate_fn(aggregator: str):
    """Name -> dense aggregator (reference ``dgnconv.py`` /
    ``pnaconv.py`` get_aggregate_fn, extended with the directional pair
    via functools.partial on (eig_s, eig_d))."""
    if aggregator in AGGREGATORS:
        return AGGREGATORS[aggregator]
    if aggregator.startswith("dir") and "-" in aggregator:
        kind, idx = aggregator.split("-")
        eig_idx = int(idx)
        if kind == "dir_av" or kind == "dir":
            def f(h, eig_s, eig_d):
                return aggregate_dir_av(h, eig_s, eig_d, eig_idx)
            return f
        if kind == "dir_dx":
            def f(h, eig_s, eig_d, h_in):
                return aggregate_dir_dx(h, eig_s, eig_d, h_in, eig_idx)
            return f
    raise ValueError(f"unknown aggregator {aggregator!r}")
