from .batch import GraphBatch
from .loader import KGQADataset, load_dataset_dir, load_dict
from .vocab import Vocab

__all__ = ["GraphBatch", "KGQADataset", "load_dataset_dir", "load_dict", "Vocab"]
