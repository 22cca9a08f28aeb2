"""Sampling subsystem (reference ``python/dgl/sampling/``).

Host-side samplers producing **fixed-shape padded** structures ready for
jit-compiled device steps — the TPU-native replacement of the reference's
C++ rowwise-pick kernels (``src/array/cpu/rowwise_pick.h``,
``src/graph/sampling/neighbor/neighbor.cc``).
"""
from .neighbor import (
    sample_neighbors,
    sample_neighbors_fixed,
    in_subgraph_sample,
    temporal_sample_neighbors,
    select_topk,
    sample_neighbors_biased,
    sample_etype_neighbors,
    sample_neighbors_fused,
)
from .randomwalks import random_walk, node2vec_random_walk, pack_traces
from .negative import global_uniform_negative_sampling
from .labor import sample_labors
from .pinsage import PinSAGESampler, RandomWalkNeighborSampler
from .utils import EidExcluder
from .device_sampler import (
    DeviceMFG,
    DeviceNeighborSampler,
    device_seed_batches,
)

__all__ = [
    "DeviceMFG",
    "DeviceNeighborSampler",
    "device_seed_batches",
    "sample_neighbors",
    "sample_neighbors_fixed",
    "sample_etype_neighbors",
    "sample_neighbors_fused",
    "EidExcluder",
    "in_subgraph_sample",
    "temporal_sample_neighbors",
    "random_walk",
    "node2vec_random_walk",
    "pack_traces",
    "global_uniform_negative_sampling",
    "sample_labors",
    "PinSAGESampler",
    "RandomWalkNeighborSampler",
]
