"""GraphBolt-shaped data pipeline (reference ``python/dgl/graphbolt/`` +
``graphbolt/`` C++).

Composable stages over a unified ``MiniBatch``: ``ItemSet``/``ItemSampler``
-> ``NeighborSampler`` (fixed-shape MFGs) -> ``FeatureFetcher`` (pluggable
``FeatureStore`` with cache policies / disk-backed npy) -> ``CopyTo``.
The reference's torchdata DataPipes become a plain generator chain driven by
``DataLoader`` with a background prefetch thread.
"""
from .itemset import ItemSet, ItemSetDict
from .item_sampler import ItemSampler
from .minibatch import MiniBatch
from .feature_store import (
    Feature,
    FeatureStore,
    NumpyFeature,
    DiskBasedFeature,
    CachedFeature,
    cache_policies,
)
from .impl.cache_policy import (
    CachePolicy,
    LRUPolicy,
    ClockPolicy,
    SievePolicy,
    S3FifoPolicy,
)
from .impl.fused_csc_sampling_graph import (
    CSCFormatBase,
    SampledSubgraphImpl,
    FusedCSCSamplingGraph,
    fused_csc_sampling_graph,
    from_dglgraph,
)
from .neighbor_sampler_gb import (
    NeighborSamplerStage,
    InSubgraphSampler,
    LayerNeighborSampler,
    UniformNegativeSampler,
    MiniBatchTransformer,
    exclude_seed_edges,
    FeatureFetcher,
    CooperativeFeatureFetcher,
    shard_feature_table,
    CopyTo,
)
from .dataloader import DataLoader
from .ondisk_dataset import OnDiskDataset

__all__ = [
    "ItemSet",
    "ItemSetDict",
    "ItemSampler",
    "MiniBatch",
    "Feature",
    "FeatureStore",
    "NumpyFeature",
    "DiskBasedFeature",
    "CachedFeature",
    "cache_policies",
    "CachePolicy",
    "LRUPolicy",
    "ClockPolicy",
    "SievePolicy",
    "S3FifoPolicy",
    "CSCFormatBase",
    "SampledSubgraphImpl",
    "FusedCSCSamplingGraph",
    "fused_csc_sampling_graph",
    "from_dglgraph",
    "NeighborSamplerStage",
    "InSubgraphSampler",
    "LayerNeighborSampler",
    "UniformNegativeSampler",
    "MiniBatchTransformer",
    "exclude_seed_edges",
    "FeatureFetcher",
    "CooperativeFeatureFetcher",
    "shard_feature_table",
    "CopyTo",
    "DataLoader",
    "OnDiskDataset",
]
