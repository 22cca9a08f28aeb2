"""GNN layer zoo (reference ``python/dgl/nn/pytorch/``), as flax.linen modules."""
from .conv import *  # noqa: F401,F403
from .glob import *  # noqa: F401,F403
from .hetero import HeteroGraphConv  # noqa: F401
from .linear import TypedLinear, HeteroLinear, HeteroEmbedding  # noqa: F401
from .utils_nn import (  # noqa: F401
    EdgeWeightNorm,
    Identity,
    Sequential,
    WeightBasis,
    JumpingKnowledge,
    LabelPropagation,
)
from . import gt  # noqa: F401
from .gt import *  # noqa: F401,F403
from . import functional  # noqa: F401
from . import explain  # noqa: F401
from .explain import *  # noqa: F401,F403
from .link import EdgePredictor, TransE, TransR  # noqa: F401
from .factory import KNNGraph, SegmentedKNNGraph, RadiusGraph  # noqa: F401
from .network_emb import DeepWalk, MetaPath2Vec  # noqa: F401
from .sparse_emb import (  # noqa: F401
    NodeEmbedding,
    sparse_adagrad_init,
    sparse_adagrad_update,
    sparse_adam_init,
    sparse_adam_update,
)
