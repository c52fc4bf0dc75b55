"""Image-only (photometric) transforms, parity with
``src/transforms/image_transform.py``.

All parameters are sampled from the provided key with traced values feeding
fixed-shape kernels, so one compiled program covers every draw.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops import gaussian_blur, simulate_low_res
from .common import Transform


def _uniform(rng, lo, hi):
    return jax.random.uniform(rng, (), jnp.float32, lo, hi)


def _as_range(v, centered: bool = False):
    if isinstance(v, (tuple, list)):
        return [float(v[0]), float(v[1])]
    v = float(v)
    if centered:
        return [max(1.0 - v, 0.0), 1.0 + v]
    return [v, v]


def _contrast_blend(image, factor):
    """torchvision ``adjust_contrast``: blend with the grayscale mean.

    3-channel: ITU-R 601 luma; 1-channel: the image itself. Clamp [0, 1].
    """
    if image.shape[-1] == 3:
        gray = (
            0.2989 * image[..., 0] + 0.587 * image[..., 1] + 0.114 * image[..., 2]
        )
    else:
        gray = jnp.mean(image, axis=-1)
    mean = jnp.mean(gray)
    return jnp.clip(factor * image + (1.0 - factor) * mean, 0.0, 1.0)


class RandomGamma(Transform):
    """``image ** gamma``, gamma ~ U(range) (``image_transform.py:15-44``)."""

    def __init__(self, gamma):
        self.gamma = _as_range(gamma)

    def apply(self, rng, image, label):
        g = _uniform(rng, self.gamma[0], self.gamma[1])
        return jnp.power(image, g), label

    def get_params_dict(self):
        return {"RandomGamma": {"gamma": self.gamma}}


class RandomContrast(Transform):
    """ColorJitter(contrast): factor ~ U(max(1-c,0), 1+c)
    (``image_transform.py:47-75``)."""

    def __init__(self, contrast):
        self.contrast = _as_range(contrast, centered=True)

    def apply(self, rng, image, label):
        f = _uniform(rng, self.contrast[0], self.contrast[1])
        return _contrast_blend(image, f), label

    def get_params_dict(self):
        return {"RandomContrast": {"contrast": self.contrast}}


class RandomBrightness(Transform):
    """Reference bug preserved behind a flag: ``RandomBrightness`` constructs
    ``ColorJitter(contrast=brightness)`` (``image_transform.py:87``), i.e. it
    applies CONTRAST. ``contrast_compat=True`` (default) matches that
    behavior; ``False`` applies true brightness (``factor * image``).
    """

    def __init__(self, brightness, contrast_compat: bool = True):
        self.brightness = _as_range(brightness, centered=True)
        self.contrast_compat = contrast_compat

    def apply(self, rng, image, label):
        f = _uniform(rng, self.brightness[0], self.brightness[1])
        if self.contrast_compat:
            return _contrast_blend(image, f), label
        return jnp.clip(f * image, 0.0, 1.0), label

    def get_params_dict(self):
        return {
            "RandomBrightness": {
                "brightness": self.brightness,
                "contrast_compat": self.contrast_compat,
            }
        }


class RandomGaussianNoise(Transform):
    """Additive N(0, sigma), sigma ~ U(range), clip [0,1]
    (``image_transform.py:109-142``)."""

    def __init__(self, sigma):
        self.sigma = _as_range(sigma)

    def apply(self, rng, image, label):
        s_rng, n_rng = jax.random.split(rng)
        sigma = _uniform(s_rng, self.sigma[0], self.sigma[1])
        noise = sigma * jax.random.normal(n_rng, image.shape, jnp.float32)
        return jnp.clip(image + noise, 0.0, 1.0), label

    def get_params_dict(self):
        return {"RandomGaussianNoise": {"sigma": self.sigma}}


def _round_to_odd(x: float) -> int:
    c = math.ceil(x)
    return c if c % 2 else c - 1


class RandomGaussianBlur(Transform):
    """sigma ~ U(range); kernel = odd(ceil(4*sigma + 0.5))
    (``image_transform.py:145-193``). The static max kernel comes from
    sigma_max; the effective size is masked at runtime.
    """

    def __init__(self, sigma):
        self.sigma = _as_range(sigma)
        self.max_kernel = _round_to_odd(self.sigma[1] * 4.0 + 0.5)

    def apply(self, rng, image, label):
        sigma = _uniform(rng, self.sigma[0], self.sigma[1])
        # torch _round_to_odd(ceil(4s+0.5)): ceil then subtract 1 if even
        c = jnp.ceil(4.0 * sigma + 0.5)
        kernel = jnp.where(jnp.mod(c, 2) == 1, c, c - 1).astype(jnp.int32)
        out = gaussian_blur(image, sigma, kernel, max_kernel_size=self.max_kernel)
        return out, label

    def get_params_dict(self):
        return {"RandomGaussianBlur": {"sigma": self.sigma}}


class SimulateLowRes(Transform):
    """Per-axis scale ~ U(range): nearest-exact down, bilinear up
    (``image_transform.py:196-236``)."""

    def __init__(self, scale):
        self.scale = _as_range(scale)

    def apply(self, rng, image, label):
        scales = jax.random.uniform(
            rng, (2,), jnp.float32, self.scale[0], self.scale[1]
        )
        return simulate_low_res(image, scales), label

    def get_params_dict(self):
        return {"SimulateLowRes": {"scale": self.scale}}
