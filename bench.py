"""Benchmark: UNet train-step throughput (images/sec/chip).

Primary metric per BASELINE.md: images/sec/chip on the AL-path UNet
(FUGC config, 256x256). ``vs_baseline`` compares against the reference
PyTorch train step measured on the same host when available (falls back to
1.0 — the reference publishes no numbers, BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np


# batch 128 is the measured throughput knee on a v5e chip (post gather-free
# CE: 1098 img/s at batch 128; pre-fix curve was 16→309, 64→407, 128→536)
BATCH = 128
IMAGE_SIZE = 256
WARMUP = 3
ITERS = 20


def bench_train_step():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import FLAGSHIP_KWARGS
    from mia_tpu.losses import DiceAndCELoss
    from mia_tpu.models.unet import UNet, UNetConfig
    from mia_tpu.schedule import poly_warmup_schedule
    from mia_tpu.training import create_train_state, make_optimizer, make_train_step

    cfg = UNetConfig(**{**FLAGSHIP_KWARGS, "compute_dtype": jnp.bfloat16})
    model = UNet(cfg)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((BATCH, IMAGE_SIZE, IMAGE_SIZE, 3), np.float32))
    labels = jnp.asarray(rng.integers(0, 3, (BATCH, IMAGE_SIZE, IMAGE_SIZE)), jnp.int32)

    lr = poly_warmup_schedule(1e-3, max_steps=1000, warmup_steps=100)
    tx = make_optimizer("adam", lr, grad_clip=10.0)
    state = create_train_state(model, jax.random.PRNGKey(0), images[:1], tx)
    step = make_train_step(DiceAndCELoss(dice_weight=0.5, ce_weight=0.5), lr)
    key = jax.random.PRNGKey(1)

    # NOTE: through the TPU tunnel, block_until_ready returns immediately;
    # only a D2H fetch (float()) actually waits for execution. Time by
    # fetching the final loss scalar.
    for _ in range(WARMUP):
        state, metrics = step(state, images, labels, key)
    float(metrics["loss"])

    start = time.perf_counter()
    for _ in range(ITERS):
        state, metrics = step(state, images, labels, key)
    float(metrics["loss"])
    elapsed = time.perf_counter() - start
    return BATCH * ITERS / elapsed


def bench_torch_reference():
    """Reference-equivalent torch train step, images/sec.

    The reference stack is torch-only and this image has no CUDA, so its
    only runnable form is torch CPU — measured with the same architecture
    (tests/torch_ref.TorchUNet mirrors the reference UNet), same image
    size, Dice+CE, adam, grad-clip 10. ``vs_baseline`` is therefore
    ours-on-TPU / reference-on-host for this machine.
    """
    try:
        import sys

        sys.path.insert(0, "tests")
        import torch
        from torch_ref import TorchUNet
    except Exception:
        return None

    torch.set_num_threads(max(torch.get_num_threads(), 8))
    batch, iters, warmup = 8, 5, 2
    model = TorchUNet(3, 3, [32, 64, 128, 256, 512])
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    rng = np.random.default_rng(0)
    images = torch.from_numpy(
        rng.random((batch, 3, IMAGE_SIZE, IMAGE_SIZE), np.float32)
    )
    labels = torch.from_numpy(
        rng.integers(0, 3, (batch, IMAGE_SIZE, IMAGE_SIZE)).astype(np.int64)
    )

    def dice_ce(logits, y):
        ce = torch.nn.functional.cross_entropy(logits, y)
        probs = torch.softmax(logits, 1)
        onehot = torch.nn.functional.one_hot(y, logits.shape[1]).permute(0, 3, 1, 2).float()
        inter = (probs * onehot).sum((2, 3))
        dice = 1 - (2 * inter + 1e-5) / (probs.sum((2, 3)) + onehot.sum((2, 3)) + 1e-5)
        return 0.5 * ce + 0.5 * dice.mean()

    def step():
        opt.zero_grad()
        loss = dice_ce(model(images), labels)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 10.0)
        opt.step()

    for _ in range(warmup):
        step()
    start = time.perf_counter()
    for _ in range(iters):
        step()
    return batch * iters / (time.perf_counter() - start)


def main():
    value = bench_train_step()
    baseline = bench_torch_reference()
    vs = value / baseline if baseline else 1.0
    print(
        json.dumps(
            {
                "metric": "unet_train_images_per_sec_per_chip",
                "value": round(value, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
