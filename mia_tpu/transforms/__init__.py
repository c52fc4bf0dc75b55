from .common import (
    Transform,
    RandomTransform,
    RandomChoiceTransform,
    ComposeTransform,
    Identity,
    batch_apply,
)
from .image import (
    RandomGamma,
    RandomContrast,
    RandomBrightness,
    RandomGaussianNoise,
    RandomGaussianBlur,
    SimulateLowRes,
)
from .joint import (
    FusedRandomAffines,
    JointResize,
    RandomRotation90,
    MirrorTransform,
    RandomRotation,
    RandomCrop2D,
    RandomAffine,
)
from .normalization import ZScoreNormalize, zscore_normalize
from .recipes import get_train_transform, get_valid_transform

__all__ = [
    "Transform",
    "RandomTransform",
    "RandomChoiceTransform",
    "ComposeTransform",
    "Identity",
    "batch_apply",
    "RandomGamma",
    "RandomContrast",
    "RandomBrightness",
    "RandomGaussianNoise",
    "RandomGaussianBlur",
    "SimulateLowRes",
    "FusedRandomAffines",
    "JointResize",
    "RandomRotation90",
    "MirrorTransform",
    "RandomRotation",
    "RandomCrop2D",
    "RandomAffine",
    "ZScoreNormalize",
    "zscore_normalize",
    "get_train_transform",
    "get_valid_transform",
]
