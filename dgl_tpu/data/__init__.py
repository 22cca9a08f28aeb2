"""Dataset zoo (reference ``python/dgl/data/``).

``DGLDataset`` lifecycle (download/process/save/load) mirrors the reference
``data/dgl_dataset.py``. Network downloads are gated (this framework targets
air-gapped TPU pods); every built-in dataset supports a deterministic
``synthetic=True`` fallback that generates a structurally-similar graph with
planted class structure, so examples/tests/benchmarks run hermetically.
"""
from .dgl_dataset import DGLDataset, download, extract_archive
from .serialize import save_graphs, load_graphs, save_info, load_info
from .citation import (
    CitationGraphDataset,
    CoraGraphDataset,
    CiteseerGraphDataset,
    PubmedGraphDataset,
)
from .synthetic import (
    synthetic_classification_graph,
    synthetic_hetero_graph,
    SyntheticHeteroDataset,
    SyntheticDataset,
    RedditDataset,
    PPIDataset,
)
from .csv_dataset import CSVDataset
from .adapter import AsNodePredDataset, AsLinkPredDataset, AsGraphPredDataset, from_ogb
from .synthetic import KnowledgeGraphDataset, GraphClassificationDataset, FraudDataset
from .synthetic import (
    CoraFullDataset,
    AmazonCoBuyComputerDataset,
    AmazonCoBuyPhotoDataset,
    CoauthorCSDataset,
    CoauthorPhysicsDataset,
    WikiCSDataset,
    FlickrDataset,
    YelpDataset,
    ActorDataset,
    ChameleonDataset,
    SquirrelDataset,
    CornellDataset,
    TexasDataset,
    WisconsinDataset,
    split_dataset,
)
from .generators import BAShapeDataset, TreeCycleDataset, TreeGridDataset, MiniGCDataset, KarateClubDataset, SBMMixtureDataset

# GIN alias (reference data/gindt.py): synthetic stand-in with planted
# structure; TUDataset is the real-format parser in named_extra
GINDataset = GraphClassificationDataset

from .named_extra import (
    FB15kDataset, FB15k237Dataset, WN18Dataset,
    AIFBDataset, MUTAGDataset, BGSDataset, AMDataset,
    QM7bDataset, QM9Dataset, QM9EdgeDataset, ZINCDataset,
    MNISTSuperPixelDataset, CIFAR10SuperPixelDataset,
    PATTERNDataset, CLUSTERDataset,
    ICEWS18Dataset, GDELTDataset,
    FraudYelpDataset, FraudAmazonDataset,
    BitcoinOTCDataset, SSTDataset, MovieLensDataset,
    FakeNewsDataset, TUDataset, LegacyTUDataset, LegacyPPIDataset,
)
from . import named_extra

# short aliases the reference also exports (``data/__init__.py``)
KarateClub = KarateClubDataset
SBMMixture = SBMMixtureDataset
QM7b = QM7bDataset
QM9 = QM9Dataset
QM9Edge = QM9EdgeDataset
GDELT = GDELTDataset
ICEWS18 = ICEWS18Dataset
SST = SSTDataset
BitcoinOTC = BitcoinOTCDataset
DGLBuiltinDataset = DGLDataset

__all__ = [
    "FB15kDataset",
    "FB15k237Dataset",
    "WN18Dataset",
    "AIFBDataset",
    "MUTAGDataset",
    "BGSDataset",
    "AMDataset",
    "QM7bDataset",
    "QM9Dataset",
    "QM9EdgeDataset",
    "ZINCDataset",
    "MNISTSuperPixelDataset",
    "CIFAR10SuperPixelDataset",
    "PATTERNDataset",
    "CLUSTERDataset",
    "ICEWS18Dataset",
    "GDELTDataset",
    "FraudYelpDataset",
    "FraudAmazonDataset",
    "BitcoinOTCDataset",
    "SSTDataset",
    "MovieLensDataset",
    "FakeNewsDataset",
    "LegacyTUDataset",
    "LegacyPPIDataset",
    "KarateClub",
    "SBMMixture",
    "QM7b",
    "QM9",
    "QM9Edge",
    "GDELT",
    "ICEWS18",
    "SST",
    "BitcoinOTC",
    "DGLBuiltinDataset",

    "DGLDataset",
    "download",
    "extract_archive",
    "save_graphs",
    "load_graphs",
    "save_info",
    "load_info",
    "CitationGraphDataset",
    "CoraGraphDataset",
    "CiteseerGraphDataset",
    "PubmedGraphDataset",
    "synthetic_classification_graph",
    "synthetic_hetero_graph",
    "SyntheticHeteroDataset",
    "SyntheticDataset",
    "RedditDataset",
    "PPIDataset",
    "CSVDataset",
    "AsNodePredDataset",
    "AsLinkPredDataset",
    "AsGraphPredDataset",
    "from_ogb",
    "KnowledgeGraphDataset",
    "GraphClassificationDataset",
    "FraudDataset",
    "CoraFullDataset",
    "AmazonCoBuyComputerDataset",
    "AmazonCoBuyPhotoDataset",
    "CoauthorCSDataset",
    "CoauthorPhysicsDataset",
    "WikiCSDataset",
    "FlickrDataset",
    "YelpDataset",
    "ActorDataset",
    "ChameleonDataset",
    "SquirrelDataset",
    "CornellDataset",
    "TexasDataset",
    "WisconsinDataset",
    "split_dataset",
    "BAShapeDataset",
    "TreeCycleDataset",
    "TreeGridDataset",
    "MiniGCDataset",
    "KarateClubDataset",
    "SBMMixtureDataset",
    "TUDataset",
    "GINDataset",
]
