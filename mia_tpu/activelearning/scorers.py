"""Jitted pool-scoring programs.

The reference sweeps the pool with a fresh DataLoader per selector, running
``model(image).softmax(1)`` under ``no_grad`` batch-by-batch
(``entropy_selector.py:24-54``) and, for BADGE, one backward pass PER IMAGE
(``badge_selector.py:56-98``). Here each acquisition math is one jitted
program; BADGE's per-image gradient becomes ``vmap(grad)`` w.r.t. the seg
head. Final batches are padded to the batch size so every sweep reuses one
compiled program regardless of pool size (SURVEY §7 fixed-shape stance).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..losses import cross_entropy, soft_dice_loss


def entropy_score(probs: jnp.ndarray, smooth: float = 1e-8) -> jnp.ndarray:
    """Mean over classes of -p·log2(p+eps), spatial mean → (B,)
    (``entropy_selector.py:44-54``)."""
    ent = jnp.mean(-probs * jnp.log2(probs + smooth), axis=-1)
    return jnp.mean(ent, axis=(-2, -1))


def confidence_score(probs: jnp.ndarray) -> jnp.ndarray:
    """Least confidence: spatial mean of -max_c p (``confidence_selector.py:44-52``)."""
    return jnp.mean(-jnp.max(probs, axis=-1), axis=(-2, -1))


def margin_score(probs: jnp.ndarray) -> jnp.ndarray:
    """-(top1 - top2) spatial mean (``margin_selector.py:44-53``)."""
    top2 = jax.lax.top_k(probs, 2)[0]
    return jnp.mean(-(top2[..., 0] - top2[..., 1]), axis=(-2, -1))


_SCORES = {
    "entropy": entropy_score,
    "confidence": confidence_score,
    "margin": margin_score,
}


class ModelScorer:
    """Bundles the jitted scoring endpoints over a (model, TrainState).

    The AL trainer rebuilds the state per round; the compiled programs key on
    the model apply fn + shapes, so rounds reuse them.
    """

    def __init__(self, model, state, mesh=None, normalize=False):
        # ``state`` is anything exposing .params and .batch_stats
        # (mia_tpu.training.TrainState or a lightweight stand-in).
        # With ``mesh``, every sweep shards its batch over the mesh's
        # ``data`` axis with replicated params — the AL round's "one device
        # program per pool sweep" over all chips (SURVEY §5).
        # ``normalize``: z-score each image INSIDE the sweep program — the
        # reference's pool dataset carries ZScoreNormalize when
        # ``do_normalize`` (``al_trainer.py:623`` + ``:721-734``), so
        # selection must score normalized inputs; here the host pipeline
        # stays raw (native decode fast path) and the device does it.
        self.model = model
        self.state = state
        self.mesh = mesh
        self.normalize = normalize

        def variables(params, batch_stats):
            v = {"params": params}
            if jax.tree_util.tree_leaves(batch_stats):
                v["batch_stats"] = batch_stats
            return v

        def prep(images):
            # uint8 wire format (lossless for byte-sourced datasets — see
            # ``BatchLoader.quantize_images='auto'``): cast back in-program
            if images.dtype == jnp.uint8:
                images = images.astype(jnp.float32) / 255.0
            if not normalize:
                return images
            from ..transforms.normalization import zscore_normalize

            return jax.vmap(zscore_normalize)(images)

        def probs_fn(params, batch_stats, images):
            logits = model.apply(
                variables(params, batch_stats), prep(images), train=False
            )
            return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

        def enc_fn(params, batch_stats, images):
            return model.apply(
                variables(params, batch_stats),
                prep(images),
                train=False,
                method=model.enc_feature,
            ).astype(jnp.float32)

        def uncertainty_fn(params, batch_stats, images, kind):
            return _SCORES[kind](probs_fn(params, batch_stats, images))

        def badge_fn(params, batch_stats, images):
            # vmap(grad wrt seg-head kernel) — per-image pseudo-label loss
            # gradient embedding (badge_selector.py:19-34, 75-98)
            images = prep(images)

            def one_image(image):
                def loss_of_head(kernel):
                    p = dict(params)
                    p["decoder"] = dict(p["decoder"])
                    p["decoder"]["seg_output"] = dict(p["decoder"]["seg_output"])
                    p["decoder"]["seg_output"]["kernel"] = kernel
                    logits = model.apply(
                        variables(p, batch_stats), image[None], train=False
                    )
                    preds = jax.lax.stop_gradient(jnp.argmax(logits, axis=-1))
                    ce = cross_entropy(logits, preds)
                    dice = soft_dice_loss(logits, preds, do_bg=True)
                    return ce + dice

                kernel = params["decoder"]["seg_output"]["kernel"]
                return jax.grad(loss_of_head)(kernel).reshape(-1)

            return jax.vmap(one_image)(images)

        self.data_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            data = NamedSharding(mesh, P("data"))
            # exported so sweep loaders can device_put straight into the
            # batch-sharded layout instead of committing to device 0 and
            # paying a reshard on every pool batch
            self.data_sharding = data
            self._probs = jax.jit(
                probs_fn, in_shardings=(repl, repl, data), out_shardings=data
            )
            self._enc = jax.jit(
                enc_fn, in_shardings=(repl, repl, data), out_shardings=data
            )
            self._uncertainty = jax.jit(
                uncertainty_fn,
                static_argnums=3,
                in_shardings=(repl, repl, data),
                out_shardings=data,
            )
            self._badge = jax.jit(
                badge_fn, in_shardings=(repl, repl, data), out_shardings=data
            )
        else:
            self._probs = jax.jit(probs_fn)
            self._enc = jax.jit(enc_fn)
            self._uncertainty = jax.jit(uncertainty_fn, static_argnums=3)
            self._badge = jax.jit(badge_fn)

    def probs(self, images) -> jnp.ndarray:
        return self._probs(self.state.params, self.state.batch_stats, images)

    def enc_feature(self, images) -> jnp.ndarray:
        return self._enc(self.state.params, self.state.batch_stats, images)

    def uncertainty(self, images, kind: str) -> jnp.ndarray:
        return self._uncertainty(self.state.params, self.state.batch_stats, images, kind)

    def badge_grad_embedding(self, images) -> jnp.ndarray:
        return self._badge(self.state.params, self.state.batch_stats, images)


def sweep_pool(
    dataset,
    batch_size: int,
    fn,
    image_size=None,
    sharding=None,
) -> tuple[np.ndarray, list[str]]:
    """Run a jitted per-batch ``fn(images) -> (B, ...)`` over a whole dataset
    with fixed-shape batches (final batch padded by repetition).

    Returns (stacked outputs [N, ...], case names [N]).
    """
    from ..data.loader import BatchLoader

    outputs, names = [], []
    # thread-prefetching loader: native decode + the shared decoded-sample
    # cache overlap host I/O with the device sweep (the former per-sample
    # ``get_sample`` host loop dominated the AL round wall clock)
    loader = BatchLoader(
        dataset,
        batch_size,
        shuffle=False,
        drop_last=False,
        device_put=True,
        sharding=sharding,
    )
    valids = []
    for batch in loader:
        images = jnp.asarray(batch["image"])
        valid = images.shape[0]
        if valid < batch_size:  # pad the final batch: one compiled program
            reps = jnp.concatenate(
                [images] + [images[-1:]] * (batch_size - valid), axis=0
            )
            images = reps
        # keep outputs on device: one D2H fetch for the whole sweep below,
        # so per-batch dispatch runs ahead of the TPU tunnel instead of
        # serializing on a round-trip every batch
        outputs.append(fn(images))
        valids.append(valid)
        names.extend(batch["case_name"][:valid])
    outputs = jax.device_get(outputs)
    outputs = [out[:v] for out, v in zip(outputs, valids)]
    return np.concatenate(outputs, axis=0), names
