"""SAM ViT-B/512 encoder micro-benchmark (fwd and fwd+bwd img/s + MFU).

Usage: python scripts/bench_sam_encoder.py [--dtype bf16|f32] [--batch N]
       [--fused auto|never] [--iters N]

MFU basis: ViT-B at 512^2 with window-14 attention is ~176 GFLOPs/img fwd
(patch embed + 12 blocks + neck, counting attention at padded window sizes);
bwd ~2x fwd. Peak for a v5e chip: 197 TFLOP/s bf16, ~49 TFLOP/s fp32.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


FWD_GFLOPS_PER_IMG = 176.0  # ViT-B @ 512, see module docstring


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--fused", default="auto", choices=["auto", "never"])
    ap.add_argument("--lnw", default="auto", choices=["auto", "always", "never"],
                    help="fused LayerNorm+window-partition kernel")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--mode", default="both", choices=["fwd", "bwd", "both"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mia_tpu.models.sam.image_encoder import ImageEncoderViT

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    enc = ImageEncoderViT(
        img_size=512,
        embed_dim=768,
        depth=12,
        num_heads=12,
        use_rel_pos=True,
        window_size=14,
        global_attn_indexes=(2, 5, 8, 11),
        dtype=dtype,
        fused=args.fused,
        fuse_ln_window=args.lnw,
    )
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(
        np.random.default_rng(0).random((args.batch, 512, 512, 3), np.float32)
    )
    variables = jax.eval_shape(lambda: enc.init(rng, x[:1]))
    variables = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables
    )

    fwd = jax.jit(lambda v, x: enc.apply(v, x))

    def loss(v, x):
        return jnp.sum(enc.apply(v, x).astype(jnp.float32) ** 2)

    bwd = jax.jit(jax.grad(loss))

    peak_tflops = 197.0 if args.dtype == "bf16" else 49.0

    def run(fn, name, flops_per_img):
        out = fn(variables, x)
        jax.block_until_ready(out)
        # tunnel: a D2H fetch is the only reliable sync
        leaf = jax.tree.leaves(out)[0]
        float(jnp.sum(leaf.astype(jnp.float32)))
        start = time.perf_counter()
        for _ in range(args.iters):
            out = fn(variables, x)
        leaf = jax.tree.leaves(out)[0]
        float(jnp.sum(leaf.astype(jnp.float32)))
        dt = time.perf_counter() - start
        ips = args.batch * args.iters / dt
        mfu = ips * flops_per_img * 1e9 / (peak_tflops * 1e12)
        print(f"{name}: {ips:.1f} img/s  ({mfu*100:.1f}% MFU @ {peak_tflops:.0f} TF/s peak)")
        return ips

    if args.mode in ("fwd", "both"):
        run(fwd, "encoder fwd", FWD_GFLOPS_PER_IMG)
    if args.mode in ("bwd", "both"):
        run(bwd, "encoder fwd+bwd", 3 * FWD_GFLOPS_PER_IMG)


if __name__ == "__main__":
    main()
