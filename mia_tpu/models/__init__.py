from .unet import UNet, UNetConfig
from .processor import UnetProcessor
from .torch_port import import_torch_unet_checkpoint

__all__ = [
    "UNet",
    "UNetConfig",
    "UnetProcessor",
    "import_torch_unet_checkpoint",
]
