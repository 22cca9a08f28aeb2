"""GNN layer zoo (reference ``python/dgl/nn/pytorch/``), as flax.linen modules."""
from .conv import *  # noqa: F401,F403
from .glob import *  # noqa: F401,F403
from .hetero import HeteroGraphConv  # noqa: F401
from .linear import TypedLinear, HeteroLinear, HeteroEmbedding  # noqa: F401
from .utils_nn import EdgeWeightNorm  # noqa: F401
