"""Joint geometric transforms (image + label), parity with
``src/transforms/joint_transform.py``.

All geometric ops share the single gather-based inverse warp in
``mia_tpu.ops.warp`` (torchvision conventions: center pivot, NEAREST default
interpolation for ``F.affine``/``F.rotate``, zero fill).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ..ops import affine_inverse_matrix, affine_warp, resize, rotate_warp
from .common import Transform


class JointResize(Transform):
    """Bilinear image / nearest label resize (``joint_transform.py:11-38``)."""

    def __init__(self, image_size):
        if isinstance(image_size, int):
            image_size = (image_size, image_size)
        image_size = tuple(image_size)
        if len(image_size) < 2:
            image_size = image_size * 2
        self.image_size = image_size

    def apply(self, rng, image, label):
        image = resize(image, self.image_size, "bilinear", antialias=True)
        label = resize(label[..., None], self.image_size, "nearest")[..., 0]
        return image, label

    def get_params_dict(self):
        return {"JointResize": {"image_size": list(self.image_size)}}


class RandomRotation90(Transform):
    """k ~ U{0..3} quarter-turns (``joint_transform.py:40-66``)."""

    def apply(self, rng, image, label):
        k = jax.random.randint(rng, (), 0, 4)
        branches_i = [lambda x, k=k: jnp.rot90(x, k, (0, 1)) for k in range(4)]
        image = jax.lax.switch(k, branches_i, image)
        label = jax.lax.switch(k, branches_i, label)
        return image, label

    def get_params_dict(self):
        return {"RandomRotation90": {"axes": [0, 1]}}


def _hwc_axes(axes) -> tuple[int, ...]:
    """Map the reference's CHW axis indices (-2 = H, -1 = W) to HWC."""
    if not isinstance(axes, Sequence):
        axes = (axes,)
    out = []
    for a in axes:
        out.append({-2: 0, -1: 1, 0: 0, 1: 1}[int(a)])
    return tuple(out)


class MirrorTransform(Transform):
    """Deterministic flip over given axes (``joint_transform.py:68-98``);
    randomness comes from the combinators."""

    def __init__(self, axes):
        self.axes = _hwc_axes(axes)

    def apply(self, rng, image, label):
        if len(self.axes) == 0:
            return image, label
        return jnp.flip(image, self.axes), jnp.flip(label, self.axes)

    def get_params_dict(self):
        return {"MirrorTransform": {"allowed_axes": list(self.axes)}}


class RandomRotation(Transform):
    """angle ~ U(degrees); torchvision ``F.rotate`` default NEAREST for both
    image and label (``joint_transform.py:100-126``)."""

    def __init__(self, degrees):
        if not isinstance(degrees, Sequence):
            degrees = [-degrees, degrees]
        self.degrees = [float(degrees[0]), float(degrees[1])]

    def apply(self, rng, image, label):
        angle = jax.random.uniform(
            rng, (), jnp.float32, self.degrees[0], self.degrees[1]
        )
        image = rotate_warp(image, angle, "nearest")
        label = rotate_warp(label[..., None], angle, "nearest")[..., 0]
        return image, label

    def get_params_dict(self):
        return {"RandomRotation": {"degrees": self.degrees}}


class RandomCrop2D(Transform):
    """Uniform top-left crop (``joint_transform.py:129-154``). Output shape
    is static (th, tw) — do not wrap in RandomTransform (shape change)."""

    def __init__(self, crop):
        if not isinstance(crop, (list, tuple)):
            crop = (crop, crop)
        self.crop = (int(crop[0]), int(crop[1]))

    def apply(self, rng, image, label):
        th, tw = self.crop
        h, w = image.shape[0], image.shape[1]
        ri, rj = jax.random.split(rng)
        i = jax.random.randint(ri, (), 0, max(h - th + 1, 1))
        j = jax.random.randint(rj, (), 0, max(w - tw + 1, 1))
        image = jax.lax.dynamic_slice(image, (i, j, 0), (th, tw, image.shape[2]))
        label = jax.lax.dynamic_slice(label, (i, j), (th, tw))
        return image, label

    def get_params_dict(self):
        return {"RandomCrop2D": {"crop": list(self.crop)}}


class RandomAffine(Transform):
    """torchvision ``RandomAffine.get_params`` sampling + ``F.affine``
    (NEAREST, zero fill) on both image and label
    (``joint_transform.py:157-206``)."""

    def __init__(self, degrees=0.0, translate=None, scale=None, shear=None):
        if not isinstance(degrees, Sequence):
            degrees = [-degrees, degrees]
        self.degrees = [float(degrees[0]), float(degrees[1])]
        self.translate = list(translate) if translate else None
        self.scale = list(scale) if scale else None
        if shear:
            if not isinstance(shear, Sequence):
                shear = [-shear, shear]
            self.shear = [float(s) for s in shear]
        else:
            self.shear = None

    def _sample_matrix(self, rng, h, w, center):
        """Sample torchvision get_params and return the 2x3 inverse matrix."""
        r_angle, r_tx, r_ty, r_scale, r_shx, r_shy = jax.random.split(rng, 6)
        angle = jax.random.uniform(
            r_angle, (), jnp.float32, self.degrees[0], self.degrees[1]
        )
        if self.translate is not None:
            max_dx = self.translate[0] * w
            max_dy = self.translate[1] * h
            tx = jnp.round(jax.random.uniform(r_tx, (), jnp.float32, -max_dx, max_dx))
            ty = jnp.round(jax.random.uniform(r_ty, (), jnp.float32, -max_dy, max_dy))
        else:
            tx = ty = jnp.float32(0.0)
        if self.scale is not None:
            scale = jax.random.uniform(
                r_scale, (), jnp.float32, self.scale[0], self.scale[1]
            )
        else:
            scale = jnp.float32(1.0)
        shx = shy = jnp.float32(0.0)
        if self.shear is not None:
            shx = jax.random.uniform(
                r_shx, (), jnp.float32, self.shear[0], self.shear[1]
            )
            if len(self.shear) == 4:
                shy = jax.random.uniform(
                    r_shy, (), jnp.float32, self.shear[2], self.shear[3]
                )
        return affine_inverse_matrix(angle, (tx, ty), scale, (shx, shy), center)

    def apply(self, rng, image, label):
        h, w = image.shape[0], image.shape[1]
        center = ((w - 1) * 0.5, (h - 1) * 0.5)
        m = self._sample_matrix(rng, h, w, center)
        image = affine_warp(image, m, "nearest")
        label = affine_warp(label[..., None], m, "nearest")[..., 0]
        return image, label

    def get_params_dict(self):
        return {
            "RandomAffine": {
                "degrees": self.degrees,
                "translate": self.translate,
                "scale": self.scale,
                "shear": self.shear,
            }
        }


class FusedRandomAffines(Transform):
    """Several Bernoulli-gated RandomAffines composed into ONE warp.

    Under ``vmap`` a ``lax.cond`` gate computes both branches, so a recipe
    with two gated affines always pays two full image warps. Composing the
    (gate-conditional) inverse matrices — identity when a gate misses —
    costs one warp total. Exact for 0 or 1 firing gates (an identity
    nearest warp is a true no-op); when several fire simultaneously the
    single composed resample replaces the reference's sequential
    double-resample (fewer rounding artifacts; distribution-level parity
    per SURVEY §7).
    """

    def __init__(self, affines_with_p: list):
        self.affines_with_p = [(a, float(p)) for a, p in affines_with_p]
        # the einsum-based two-pass warp needs the map to stay far from a
        # 90° axis swap; recipe ranges are static, so decide here
        max_rot = 0.0
        max_shear = 0.0
        min_scale = 1.0
        for a, _ in self.affines_with_p:
            max_rot += max(abs(a.degrees[0]), abs(a.degrees[1]))
            if a.shear:
                max_shear += max(abs(s) for s in a.shear)
            if a.scale:
                min_scale = min(min_scale, a.scale[0])
        self._use_twopass = max_rot + max_shear <= 45.0 and min_scale >= 0.4

    def apply(self, rng, image, label):
        import jax as _jax

        from ..ops.warp import (
            affine_warp_pallas,
            affine_warp_pallas_supported,
            affine_warp_twopass,
        )

        h, w = image.shape[0], image.shape[1]
        center = ((w - 1) * 0.5, (h - 1) * 0.5)
        # output -> input matrices compose left-to-right: applying A then B
        # to the image means sampling source = M_A(M_B(out)), i.e. M_A @ M_B
        m = jnp.eye(3, dtype=jnp.float32)
        identity = jnp.eye(3, dtype=jnp.float32)
        for affine, p in self.affines_with_p:
            rng, gate_rng, p_rng = jax.random.split(rng, 3)
            mi = jnp.concatenate(
                [affine._sample_matrix(p_rng, h, w, center),
                 jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)],
                axis=0,
            )
            fire = jax.random.uniform(gate_rng) < p
            mi = jnp.where(fire, mi, identity)
            m = m @ mi
        matrix = m[:2]
        is_identity = jnp.all(jnp.abs(m - identity) < 1e-12)

        if self._use_twopass:
            # image+label share the same nearest sampling — one warp of a
            # stacked (H, W, C+1) tensor halves the one-hot einsum work
            stacked = jnp.concatenate(
                [image.astype(jnp.float32), label[..., None].astype(jnp.float32)],
                axis=-1,
            )
            c = stacked.shape[-1]
            if _jax.default_backend() == "tpu" and affine_warp_pallas_supported(
                h, w, c
            ):
                # VMEM-resident kernel: exact for axis-aligned maps, <=1 px
                # from the twopass einsums on rotations (docs/PERF.md)
                warped = affine_warp_pallas(stacked, matrix, "nearest")
            else:
                warped = affine_warp_twopass(stacked, matrix, "nearest")
            warped_img = warped[..., :-1].astype(image.dtype)
            warped_lbl = jnp.round(warped[..., -1]).astype(label.dtype)
        else:
            warped_img = affine_warp(image, matrix, "nearest")
            warped_lbl = affine_warp(label[..., None], matrix, "nearest")[..., 0]
        image = jnp.where(is_identity, image, warped_img)
        label = jnp.where(is_identity, label, warped_lbl)
        return image, label

    def get_params_dict(self):
        return {
            "FusedRandomAffines": {
                "affines": [
                    {"p": p, "transform": a.get_params_dict()}
                    for a, p in self.affines_with_p
                ]
            }
        }
