from .resize import resize, resize_longest_side
from .warp import affine_inverse_matrix, affine_warp, rotate_warp
from .filters import gaussian_blur, simulate_low_res
from .morphology import (
    connected_components,
    dilate,
    erode,
    fill_hole,
    remove_cc,
    remove_small_regions,
)
from .distance import pairwise_distances, surface_distances

__all__ = [
    "resize",
    "resize_longest_side",
    "affine_warp",
    "rotate_warp",
    "affine_inverse_matrix",
    "gaussian_blur",
    "simulate_low_res",
    "dilate",
    "erode",
    "fill_hole",
    "remove_cc",
    "connected_components",
    "remove_small_regions",
    "pairwise_distances",
    "surface_distances",
]
