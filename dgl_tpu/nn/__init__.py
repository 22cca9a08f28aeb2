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
from .linear import matmul_maybe_select, bmm_maybe_select  # noqa: F401
from .conv.pna_helpers import (  # noqa: F401
    aggregate_mean,
    aggregate_max,
    aggregate_min,
    aggregate_sum,
    aggregate_var,
    aggregate_std,
    aggregate_moment_3,
    aggregate_moment_4,
    aggregate_moment_5,
    aggregate_dir_av,
    aggregate_dir_dx,
    scale_identity,
    scale_amplification,
    scale_attenuation,
    get_aggregate_fn,
)
from .conv.twirlsconv import (  # noqa: F401
    AX,
    normalized_AX,
    D_power_X,
    D_power_bias_X,
    Propagate,
    PropagateNoPrecond,
    Attention,
    MLP,
)
from .conv.atomicconv import RadialPooling, msg_func, reduce_func  # noqa: F401
from .conv.grouprevres import InvertibleCheckpoint  # noqa: F401
from .gt.spatial_encoder import gaussian  # noqa: F401
from .explain.subgraphx import MCTSNode  # noqa: F401
from .conv.pnaconv import PNAConvTower  # noqa: F401
from .conv.dgnconv import DGNConvTower  # noqa: F401
