from .common import LayerNorm2d, MLPBlock
from .image_encoder import ImageEncoderViT, window_partition, window_unpartition
from .prompt_encoder import (
    PositionEmbeddingRandom,
    PromptEncoder,
    PromptEncoderPromptClass,
)
from .transformer import TwoWayTransformer
from .mask_decoder import MaskDecoder, MaskDecoderPromptLarge
from .sam import (
    Sam,
    SamDualmask,
    postprocess_masks,
    preprocess_image,
)
from .prompt_generation import prompt_generate_random_fast
from .build_sam import (
    build_sam_vit_b_dualmask,
    import_torch_sam_encoder,
    sam_model_registry,
)
from .lora import (
    freeze_wrt_mask,
    load_lora_bytes,
    load_lora_state_dict,
    lora_state_dict,
    lora_trainable_mask,
    save_lora_bytes,
)

__all__ = [
    "LayerNorm2d",
    "MLPBlock",
    "ImageEncoderViT",
    "window_partition",
    "window_unpartition",
    "PositionEmbeddingRandom",
    "PromptEncoder",
    "PromptEncoderPromptClass",
    "TwoWayTransformer",
    "MaskDecoder",
    "MaskDecoderPromptLarge",
    "Sam",
    "SamDualmask",
    "postprocess_masks",
    "preprocess_image",
    "prompt_generate_random_fast",
    "sam_model_registry",
    "build_sam_vit_b_dualmask",
    "import_torch_sam_encoder",
    "freeze_wrt_mask",
    "lora_trainable_mask",
    "lora_state_dict",
    "load_lora_state_dict",
    "save_lora_bytes",
    "load_lora_bytes",
]

from .predictor import SamPredictor
from .transforms import ResizeLongestSide
from .amg import (
    MaskData,
    SamAutomaticMaskGenerator,
    batched_mask_to_box,
    build_point_grid,
    calculate_stability_score,
    mask_to_rle,
    rle_to_mask,
)
from .validation import test_single_volume, test_single_volume_mean

__all__ += [
    "SamPredictor",
    "ResizeLongestSide",
    "MaskData",
    "SamAutomaticMaskGenerator",
    "batched_mask_to_box",
    "build_point_grid",
    "calculate_stability_score",
    "mask_to_rle",
    "rle_to_mask",
    "test_single_volume",
    "test_single_volume_mean",
]
