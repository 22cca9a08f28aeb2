"""Fused graph ops namespace (reference ``python/dgl/ops/``)."""
from .spmm import *  # noqa: F401,F403
from .sddmm import gsddmm  # noqa: F401
from . import sddmm as _sddmm
from .edge_softmax import edge_softmax  # noqa: F401
from .segment import segment_reduce, segment_softmax, segment_mm  # noqa: F401
from .gather_mm import gather_mm  # noqa: F401
from . import pallas_hub  # noqa: F401  (opt-in hub-cache SpMM)

# re-export generated sddmm names (u_add_v, u_dot_v, ...) except ones that
# clash with spmm exports
import sys as _sys

_mod = _sys.modules[__name__]
for _name in _sddmm.__all__:
    if not hasattr(_mod, _name):
        setattr(_mod, _name, getattr(_sddmm, _name))

from .spmm import __all__ as _spmm_all
from .sddmm import __all__ as _sddmm_all

__all__ = sorted(
    set(_spmm_all)
    | set(_sddmm_all)
    | {
        "edge_softmax",
        "segment_reduce",
        "segment_softmax",
        "segment_mm",
        "gather_mm",
        "gsddmm",
        "gspmm",
    }
)
