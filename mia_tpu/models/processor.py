"""Pre/post-processing around the UNet, fully on device.

Parity target: ``src/models/unet/unet_processor.py`` — bilinear resize to the
model size, nearest resize back, and the optional morphological denoise
(pad, closing fill-hole, opening remove-cc, Gaussian blur+threshold boundary
smoothing, iterative class-priority refill). The reference runs the denoise
per mask on the host with cv2 (``unet_processor.py:72-164``); here it is an
XLA program built from ``mia_tpu.ops.morphology`` reduce-window kernels, so
it can stay fused with the model's forward pass and be vmapped per batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import resize
from ..ops.morphology import dilate, erode, gaussian_blur_threshold_smooth


class UnetProcessor:
    def __init__(
        self,
        image_size: tuple[int, int] | list[int] | int | None = None,
        dilate_size: int = 5,
        erode_size: int = 5,
        smooth_kernel: int = 7,
        num_denoise_classes: int = 2,
    ):
        if image_size is not None:
            if isinstance(image_size, int):
                image_size = (image_size, image_size)
            image_size = tuple(image_size)
            if len(image_size) < 2:
                image_size = image_size * 2
        self.image_size = image_size
        self.dilate_size = dilate_size
        self.erode_size = erode_size
        self.smooth_kernel = smooth_kernel
        # The reference hardcodes num_classes = 2 in denoise_one_mask
        # (``unet_processor.py:102``); parametrized here.
        self.num_denoise_classes = num_denoise_classes

    def preprocess(self, images: jnp.ndarray) -> jnp.ndarray:
        """Resize ``(..., H, W, C)`` to the model input size (bilinear)."""
        x = images
        if self.image_size is not None and x.shape[-3:-1] != self.image_size:
            x = resize(x, self.image_size, "bilinear", antialias=True)
        if x.ndim == 3:
            x = x[None]
        return x

    def postprocess(
        self,
        pred: jnp.ndarray,
        ori_shape: tuple[int, int],
        do_denoise: bool = False,
    ) -> jnp.ndarray:
        """Nearest-resize class maps ``(..., H, W)`` back and optionally denoise."""
        masks = pred
        squeeze = masks.ndim == 2
        if squeeze:
            masks = masks[None]
        if masks.shape[-2:] != tuple(ori_shape):
            masks = resize(masks[..., None], tuple(ori_shape), "nearest")[..., 0]
        if do_denoise:
            masks = jax.vmap(self.denoise_one_mask)(masks)
        if squeeze:
            masks = masks[0]
        return masks.astype(pred.dtype)

    def _clean(self, binary: jnp.ndarray) -> jnp.ndarray:
        """fill-hole (closing) then remove-cc (opening) on a 0/255 mask."""
        filled = erode(dilate(binary, self.dilate_size), self.erode_size)
        opened = dilate(erode(filled, self.erode_size), self.dilate_size)
        return opened

    def denoise_one_mask(self, mask: jnp.ndarray) -> jnp.ndarray:
        """Denoise one (H, W) class map, reference ``denoise_one_mask``."""
        pad = max(self.dilate_size, self.erode_size)
        num_classes = self.num_denoise_classes

        def clean_binary(binary_bool):
            m = jnp.pad(binary_bool, pad, constant_values=False)
            m = (m > 0).astype(jnp.float32) * 255.0
            m = self._clean(m)
            m = m[pad:-pad, pad:-pad]
            return gaussian_blur_threshold_smooth(m, self.smooth_kernel)

        object_final = clean_binary(mask > 0)
        class_masks = [object_final == 0]  # background
        for c in range(1, num_classes):
            class_masks.append(clean_binary(mask == c) > 0)

        out = jnp.full_like(mask, num_classes)
        c = num_classes - 1
        for class_mask in class_masks[::-1]:
            out = jnp.where(class_mask, c, out)
            c -= 1
        return out
