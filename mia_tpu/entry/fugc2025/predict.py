"""``fugc2025_predict``: k-fold ensemble inference with FUGC lip-class
morphological postprocessing.

Contract from the reference (``src/entry/fugc2025/predict.py:16-245``, a
stale file that nevertheless defines the competition inference shape):
``model(image_size, folds).load(work_dir)`` then per PNG
``preprocess (/255, resize) → Σ_fold softmax(UNet(x)) → argmax →
nearest-resize back → fill-hole / remove-cc / boundary-smooth per lip class
with class-priority refill``. Here the whole ensemble + postprocess is ONE
jitted program built on ``mia_tpu.ops`` reduce-window morphology instead of
host cv2 loops.

Checkpoints: ``fold_<i>/checkpoint_best.pth`` (legacy torch ``_UNet``) load
via ``import_legacy_torch_checkpoint``; ``fold_<i>/model.msgpack``
(mia_tpu LegacyUNet) load natively.
"""

from __future__ import annotations

from argparse import ArgumentParser
from pathlib import Path

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from mia_tpu.utils.common import draw_mask


class model:
    """Ensemble wrapper; name kept for the competition API."""

    def __init__(self, image_size=None, folds=(0, 1, 2, 3, 4)):
        from mia_tpu.models.legacy_unet import LegacyUNet, LegacyUNetConfig
        from mia_tpu.models.processor import UnetProcessor
        from mia_tpu.ops import resize

        self.dilate_size = 5
        self.erode_size = 5
        self.smooth_kernel = 7
        self.folds = list(folds)
        if image_size and len(image_size) < 2:
            image_size = list(image_size) * 2
        self.image_size = tuple(image_size) if image_size else None

        self.net = LegacyUNet(LegacyUNetConfig(n_channels=3, n_classes=3))
        self.variables: list = []
        self._processor = UnetProcessor(
            image_size=self.image_size,
            dilate_size=self.dilate_size,
            erode_size=self.erode_size,
            smooth_kernel=self.smooth_kernel,
        )

        net = self.net
        img_size = self.image_size
        processor = self._processor

        def ensemble(variables_list, x):
            """x (1, H, W, 3) in [0,1] → denoised (H, W) class map."""
            h, w = x.shape[1], x.shape[2]
            xi = resize(x, img_size, "bilinear", antialias=True) if img_size else x
            prob = None
            for variables in variables_list:
                logits = net.apply(variables, xi, train=False)
                p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
                prob = p if prob is None else prob + p
            mask = jnp.argmax(prob, axis=-1).astype(jnp.int32)
            if img_size and img_size != (h, w):
                mask = resize(mask[..., None], (h, w), "nearest")[..., 0]
            # FUGC class-priority denoise (predict.py:57-90): clean the
            # object mask and the anterior-lip mask, refill posterior
            return _fugc_denoise(mask[0], processor)

        def _fugc_denoise(mask, processor):
            pad = max(processor.dilate_size, processor.erode_size)
            from mia_tpu.ops.morphology import gaussian_blur_threshold_smooth

            def clean(binary):
                m = jnp.pad(binary, pad, constant_values=False)
                m = (m > 0).astype(jnp.float32) * 255.0
                m = processor._clean(m)
                m = m[pad:-pad, pad:-pad]
                return gaussian_blur_threshold_smooth(m, processor.smooth_kernel)

            final_object = clean(mask > 0)
            final_ant = clean(mask == 1)
            final_ant = jnp.where(final_object == 0, 0.0, final_ant)

            out = jnp.where(final_object > 0, 2, 0)
            out = jnp.where(final_ant > 0, 1, out)
            return out.astype(jnp.int32)

        self._ensemble = jax.jit(ensemble)

    def load(self, path="./"):
        from flax import serialization

        from mia_tpu.models.legacy_unet import import_legacy_torch_checkpoint

        self.variables = []
        for fold in self.folds:
            base = Path(path) / f"fold_{fold}"
            msgpack = base / "model.msgpack"
            pth = base / "checkpoint_best.pth"
            if msgpack.is_file():
                size = self.image_size or (64, 64)
                target = self.net.init(
                    jax.random.PRNGKey(0), jnp.zeros((1, *size, 3)), train=False
                )
                self.variables.append(
                    serialization.from_bytes(target, msgpack.read_bytes())
                )
            elif pth.is_file():
                import torch

                sd = torch.load(pth, map_location="cpu")
                if "model" in sd:
                    sd = sd["model"]
                self.variables.append(import_legacy_torch_checkpoint(sd))
            else:
                raise FileNotFoundError(f"no checkpoint under {base}")
        return self

    def predict(self, X, no_normalization: bool = True) -> np.ndarray:
        """X: (3, H, W) uint8 (competition layout) or (H, W, 3)."""
        X = np.asarray(X)
        if X.ndim == 3 and X.shape[0] in (1, 3) and X.shape[-1] not in (1, 3):
            X = X.transpose(1, 2, 0)
        x = jnp.asarray(X, jnp.float32)[None] / 255.0
        mask = self._ensemble(self.variables, x)
        return np.asarray(mask)

    def save(self, path="./"):
        pass


def parse_args(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--work-dir", default=".", type=str)
    parser.add_argument("--device", default="tpu", type=str)
    parser.add_argument("--images", required=True, type=str)
    parser.add_argument("--output-dir", type=str)
    parser.add_argument("--visualize-dir", type=str)
    parser.add_argument("--run-model", action="store_true")
    parser.add_argument("--image-size", nargs="+", type=int)
    parser.add_argument("--show", action="store_true")
    parser.add_argument("--folds", nargs="+", type=int, default=[0, 1, 2, 3, 4])
    parser.add_argument("--batch-size", default=32, type=int)
    parser.add_argument("--no-normalization", action="store_true")
    return parser.parse_args(argv)


def predict_entry(argv=None):
    args = parse_args(argv)
    images_path = Path(args.images)
    output_dir = Path(args.output_dir) if args.output_dir else None
    visualize_dir = Path(args.visualize_dir) if args.visualize_dir else None
    for d in (output_dir, visualize_dir):
        if d:
            d.mkdir(parents=True, exist_ok=True)

    m = None
    if args.run_model:
        m = model(args.image_size, folds=args.folds).load(args.work_dir)

    images_iter = (
        sorted(images_path.glob("*.png")) if images_path.is_dir() else [images_path]
    )
    for image_path in images_iter:
        image_np = np.array(Image.open(image_path).convert("RGB"))
        if args.run_model:
            pred = m.predict(image_np.transpose(2, 0, 1), args.no_normalization)
            if output_dir:
                Image.fromarray(pred.astype(np.uint8)).save(output_dir / image_path.name)
        elif output_dir:
            pred = np.array(Image.open(output_dir / image_path.name))
        else:
            raise ValueError("Either output-dir or run-model must be specified")

        visualized = Image.fromarray(draw_mask(image_np, pred))
        if visualize_dir:
            visualized.save(visualize_dir / image_path.name)
        if args.show:
            visualized.show()


def main():
    predict_entry()


if __name__ == "__main__":
    main()
