"""Shared test helpers (reference ``tests/utils/__init__.py:4``
``parametrize_idtype``).

int64 ids on device require JAX's x64 mode; rather than flipping the global
flag (which would change default float widths for every other test), each
int64 case runs inside the scoped ``jax.enable_x64`` context.
"""
import contextlib
import functools

import jax
import jax.numpy as jnp
import pytest

IDTYPES = (jnp.int32, jnp.int64)


def idtype_ctx(idtype):
    """Context manager enabling x64 for int64 cases (no-op for int32)."""
    if jnp.dtype(idtype) == jnp.dtype("int64"):
        return jax.enable_x64(True)
    return contextlib.nullcontext()


def parametrize_idtype(fn):
    """Parametrize a test over graph index dtypes, mirroring the reference's
    ``parametrize_idtype`` (``tests/utils/__init__.py:4``). The wrapped test
    receives ``idtype`` and already runs inside :func:`idtype_ctx`."""

    @pytest.mark.parametrize(
        "idtype", IDTYPES, ids=[jnp.dtype(t).name for t in IDTYPES]
    )
    @functools.wraps(fn)
    def wrapper(*args, idtype, **kwargs):
        with idtype_ctx(idtype):
            return fn(*args, idtype=idtype, **kwargs)

    return wrapper
