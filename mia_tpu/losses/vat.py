"""Virtual adversarial training (reference ``src/losses/adv_loss.py:29-129``).

Functional VAT: power iteration on (image or image-embedding) noise via
``jax.grad`` of the Dice distance between ensembled decoder softmaxes. The
whole procedure stays inside one jitted program (the reference does
``backward``/``zero_grad`` per iteration on the host schedule).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .dice import soft_dice_loss


def _l2_normalize(d: jnp.ndarray) -> jnp.ndarray:
    """Per-sample L2 norm over all non-batch dims (``adv_loss.py:11-14``)."""
    flat = d.reshape(d.shape[0], -1)
    norm = jnp.linalg.norm(flat, axis=1).reshape((-1,) + (1,) * (d.ndim - 1))
    return d / (norm + 1e-8)


def _ensemble_softmax(logits_list) -> jnp.ndarray:
    pred = 0.0
    n = 0
    for m in logits_list:
        if m is None:
            continue
        pred = pred + jax.nn.softmax(m.astype(jnp.float32), axis=-1)
        n += 1
    return pred / max(n, 1)


def vat_loss(
    rng: jax.Array,
    forward_fn: Callable,
    x: jnp.ndarray,
    xi: float = 10.0,
    epi: float = 6.0,
    ip: int = 1,
    clean_logits_list=None,
    dice_kwargs: dict | None = None,
) -> jnp.ndarray:
    """``forward_fn(x_perturbed) -> list of decoder logits`` (channel-last).

    ``x`` is whatever the noise applies to — the input image or the image
    embeddings (``adv_loss.py:79-94``). ``clean_logits_list`` may carry the
    unperturbed outputs to avoid recomputing them.
    """
    dice_kwargs = dice_kwargs or dict(do_bg=True)

    if clean_logits_list is None:
        clean_logits_list = forward_fn(x)
    pred = jax.lax.stop_gradient(_ensemble_softmax(clean_logits_list))

    d = jax.random.uniform(rng, x.shape, jnp.float32) - 0.5
    d = _l2_normalize(d)

    def adv_distance(d_in):
        out = forward_fn(x + d_in * xi)
        pred_hat = _ensemble_softmax(out)
        # reference feeds softmax outputs to DiceLoss(softmax=True) — the
        # extra softmax is part of its behavior; preserved via softmax=True
        return soft_dice_loss(pred_hat, pred, softmax=True, **dice_kwargs)

    for _ in range(ip):
        grad = jax.grad(adv_distance)(d)
        d = _l2_normalize(jax.lax.stop_gradient(grad))

    out = forward_fn(x + d * epi)
    pred_hat = _ensemble_softmax(out)
    return soft_dice_loss(pred_hat, pred, softmax=True, **dice_kwargs)
