from .base import (
    BaseDataset,
    ZScoreNormalizeHost,
    get_path,
    host_joint_resize,
    host_zscore,
    load_image_grayscale,
    load_label,
)
from .fugc import FUGCDataset
from .busi import BUSIDataset
from .acdc import ACDCDataset
from .thyroid import TN3KDataset, TG3KDataset
from .la2018 import LA2018Dataset
from .btcv import BTCVDataset
from .common import ExtendableDataset, ImageDataset
from .active import ActiveDataset
from .sampler import TwoStreamBatchSampler
from .loader import BatchLoader, collate
from .utils import SplitDictKeyException

DATASETS = {
    "fugc": FUGCDataset,
    "busi": BUSIDataset,
    "acdc": ACDCDataset,
    "tn3k": TN3KDataset,
    "tg3k": TG3KDataset,
    "la2018": LA2018Dataset,
    "btcv": BTCVDataset,
}

__all__ = [
    "BaseDataset",
    "ZScoreNormalizeHost",
    "get_path",
    "host_joint_resize",
    "host_zscore",
    "load_image_grayscale",
    "load_label",
    "FUGCDataset",
    "BUSIDataset",
    "ACDCDataset",
    "TN3KDataset",
    "TG3KDataset",
    "LA2018Dataset",
    "BTCVDataset",
    "ExtendableDataset",
    "ImageDataset",
    "ActiveDataset",
    "TwoStreamBatchSampler",
    "BatchLoader",
    "SplitDictKeyException",
    "collate",
    "DATASETS",
]
