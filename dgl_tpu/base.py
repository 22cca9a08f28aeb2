"""Base definitions (reference ``python/dgl/base.py``)."""
from __future__ import annotations

import logging
import os
import warnings


class DGLError(Exception):
    """Framework error (reference ``python/dgl/base.py`` DGLError)."""


class DGLWarning(UserWarning):
    """Framework warning."""


class _All:
    """Sentinel selecting all nodes/edges (reference ``base.py`` ALL)."""

    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __repr__(self):
        return "ALL"


ALL = _All()

# Edge type for self-loop relations in homogeneous conversions.
NTYPE = "_N"
ETYPE = "_E"
NID = "_ID"
EID = "_ID"


def is_all(arg) -> bool:
    return arg is ALL or (isinstance(arg, str) and arg == "__ALL__")


def dgl_warning(msg, category=DGLWarning, stacklevel=2):
    warnings.warn(msg, category=category, stacklevel=stacklevel)


def _get_logger():
    logger = logging.getLogger("dgl-tpu")
    if os.environ.get("DGL_LOG_DEBUG", "0") == "1":
        logger.setLevel(logging.DEBUG)
    return logger


logger = _get_logger()
