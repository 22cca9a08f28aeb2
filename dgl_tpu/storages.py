"""FeatureStorage abstraction (reference ``python/dgl/storages/base.py:65``)
— alias surface over the graphbolt feature stores."""
from .graphbolt.feature_store import (
    Feature as FeatureStorage,
    NumpyFeature as TensorStorage,
    DiskBasedFeature as NumpyStorage,
    CachedFeature as CachedStorage,
    FeatureStore,
)

__all__ = [
    "FeatureStorage",
    "TensorStorage",
    "NumpyStorage",
    "CachedStorage",
    "FeatureStore",
]
