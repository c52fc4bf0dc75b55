"""LoRA plumbing for the SAM image encoder.

The reference wraps every encoder block's ``qkv`` module with rank-r A/B
adapters at runtime and freezes the encoder
(``sam_lora_image_encoder.py:45-104``). In flax the adapters are parameters
declared by the encoder itself (``Attention(lora_rank=r)``); this module
supplies the functional counterparts:

- ``lora_trainable_mask``: an optax mask freezing everything in the image
  encoder EXCEPT the LoRA adapters (the reference trains adapters + prompt
  encoder + decoders + heads, ``sam_lora_image_encoder.py:79-80``).
- ``lora_state_dict`` / ``load_lora_state_dict``: checkpoint only the
  adapters + everything outside the frozen encoder
  (``sam_lora_image_encoder.py:107-207``).
"""

from __future__ import annotations

from typing import Any

import jax
from flax import serialization, traverse_util


def _is_lora(path: tuple[str, ...]) -> bool:
    return any(k.startswith("lora_a_") or k.startswith("lora_b_") for k in path)


def _in_encoder(path: tuple[str, ...]) -> bool:
    return path and path[0] == "image_encoder"


def lora_trainable_mask(params) -> Any:
    """Pytree of bools: True = trainable (optax.masked / multi_transform)."""
    flat = traverse_util.flatten_dict(params)
    mask = {p: (not _in_encoder(p)) or _is_lora(p) for p in flat}
    return traverse_util.unflatten_dict(mask)


def lora_state_dict(params) -> dict:
    """Adapters + all non-encoder params (LoRA checkpoint content)."""
    flat = traverse_util.flatten_dict(params)
    kept = {p: v for p, v in flat.items() if (not _in_encoder(p)) or _is_lora(p)}
    return traverse_util.unflatten_dict(kept)


def load_lora_state_dict(params, lora_params) -> Any:
    """Merge a LoRA checkpoint into full params (frozen encoder untouched)."""
    flat = traverse_util.flatten_dict(params)
    update = traverse_util.flatten_dict(lora_params)
    flat.update(update)
    return traverse_util.unflatten_dict(flat)


def save_lora_bytes(params) -> bytes:
    return serialization.to_bytes(lora_state_dict(params))


def load_lora_bytes(params, data: bytes) -> Any:
    target = lora_state_dict(params)
    loaded = serialization.from_bytes(target, data)
    return load_lora_state_dict(params, loaded)


def freeze_wrt_mask(tx, mask_tree):
    """optax transform applying ``tx`` only where mask is True, zero
    elsewhere (frozen)."""
    import optax

    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()},
        jax.tree_util.tree_map(lambda m: "train" if m else "freeze", mask_tree),
    )
