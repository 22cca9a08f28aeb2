"""Utilities (reference ``python/dgl/utils/``)."""
from .filter_mod import Filter
from .checks import expand_as_pair, check_eq_shape
from .internal import toindex, relabel

__all__ = ["Filter", "expand_as_pair", "check_eq_shape", "toindex", "relabel"]
