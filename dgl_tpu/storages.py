"""FeatureStorage abstraction (reference ``python/dgl/storages/base.py:65``)
— alias surface over the graphbolt feature stores.

Reference mapping: ``TensorStorage`` wraps in-memory tensors and
``NumpyStorage`` wraps in-memory numpy arrays (``storages/numpy_storage.py``)
— both are :class:`NumpyFeature` here (one array world in this stack);
``DiskStorage`` is the out-of-core .npy store (the reference keeps that
role in graphbolt's OnDiskNpyArray)."""
from .graphbolt.feature_store import (
    CachedFeature as CachedStorage,
    DiskBasedFeature as DiskStorage,
    Feature as FeatureStorage,
    FeatureStore,
    NumpyFeature as NumpyStorage,
    NumpyFeature as TensorStorage,
)

__all__ = [
    "FeatureStorage",
    "TensorStorage",
    "NumpyStorage",
    "DiskStorage",
    "CachedStorage",
    "FeatureStore",
]
