"""Benchmark: production-path throughput (images/sec/chip).

Headline metric per VERDICT r1 / BASELINE.md: the PRODUCTION AL train step —
UNet + fused on-device augmentation recipe (FUGC recipe) + Dice+CE + adam +
global-norm clip at batch 128, 256x256 — i.e. the program `ALTrainer`
actually runs every iteration (al_trainer.py `_make_programs`), not the bare
step. Extra metrics ride along in the same JSON line:

- ``unet_train_bare``: the step without augmentation (round-1 headline)
- ``unet_train_mfu_pct``: XLA-reported FLOPs / wall-clock vs chip peak
- ``cpcsam_phase1`` / ``cpcsam_phase2``: CPC-SAM ViT-B/512 train steps
- ``al_round_seconds``: full AL round (50 iters batch 12 + entropy pool
  sweep over 200 synthetic FUGC images + valid) wall clock

``vs_baseline`` compares the headline against the reference PyTorch train
step measured on the same host (torch CPU — its only runnable form here;
the reference publishes no numbers, BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", extras...}.
"""

from __future__ import annotations

import json
import os
import statistics
import time
import traceback

import numpy as np


BATCH = 128
IMAGE_SIZE = 256
WARMUP = 3
ITERS = 20
REPEATS = 3  # median-of-N timed windows per metric (VERDICT r4 weak #6)

V5E_PEAK_BF16 = 197e12


def _median_spread(vals):
    """(median, spread_pct) over timed windows — same-session noise band
    so round-over-round artifact deltas are interpretable outside the
    6-10%% cross-session chip noise (docs/PERF.md §20)."""
    med = statistics.median(vals)
    spread = (max(vals) - min(vals)) / med * 100 if med else 0.0
    return round(med, 2), round(spread, 1)


def _sync(x):
    """Through the TPU tunnel block_until_ready returns immediately; only a
    D2H fetch actually waits, so time by fetching a scalar."""
    import jax.numpy as jnp

    return float(jnp.sum(x.astype(jnp.float32)))


def _build_unet_step(augmented: bool):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import FLAGSHIP_KWARGS
    from mia_tpu.losses import DiceAndCELoss
    from mia_tpu.models.unet import UNet, UNetConfig
    from mia_tpu.schedule import poly_warmup_schedule
    from mia_tpu.training import create_train_state, make_optimizer, make_train_step
    from mia_tpu.transforms import batch_apply, get_train_transform, zscore_normalize

    cfg = UNetConfig(**{**FLAGSHIP_KWARGS, "compute_dtype": jnp.bfloat16})
    model = UNet(cfg)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((BATCH, IMAGE_SIZE, IMAGE_SIZE, 3), np.float32))
    labels = jnp.asarray(rng.integers(0, 3, (BATCH, IMAGE_SIZE, IMAGE_SIZE)), jnp.int32)

    lr = poly_warmup_schedule(1e-3, max_steps=1000, warmup_steps=100)
    tx = make_optimizer("adam", lr, grad_clip=10.0)
    state = create_train_state(model, jax.random.PRNGKey(0), images[:1], tx)

    preprocess = None
    if augmented:
        recipe = get_train_transform("fugc", True)

        def preprocess(rng, images, labels):
            images, labels = batch_apply(recipe, rng, images, labels)
            return jax.vmap(zscore_normalize)(images), labels

    step = make_train_step(
        DiceAndCELoss(dice_weight=0.5, ce_weight=0.5), lr, preprocess_fn=preprocess
    )
    return step, state, images, labels


def _time_step(step, state, images, labels, iters=ITERS, warmup=WARMUP,
               repeats=REPEATS):
    """Median img/s over ``repeats`` timed windows (+ spread_pct)."""
    import jax

    key = jax.random.PRNGKey(1)
    for _ in range(warmup):
        state, metrics = step(state, images, labels, key)
    _sync(metrics["loss"])
    windows = []
    for _ in range(repeats):
        start = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, images, labels, key)
        _sync(metrics["loss"])
        windows.append(images.shape[0] * iters / (time.perf_counter() - start))
    return _median_spread(windows)


def bench_unet(augmented: bool):
    step, state, images, labels = _build_unet_step(augmented)
    return _time_step(step, state, images, labels)


def bench_unet_infer():
    """UNet inference (jitted predict: forward + softmax + argmax), img/s
    at batch 64 — BASELINE.md's second half of the primary metric."""
    import jax
    import jax.numpy as jnp

    from mia_tpu.training import make_predict_fn

    step, state, images, labels = _build_unet_step(False)
    del step, labels
    predict = make_predict_fn()
    x = images[:64]
    probs, pred = predict(state, x)
    _sync(pred)
    iters = 20
    windows = []
    for _ in range(REPEATS):
        start = time.perf_counter()
        for _ in range(iters):
            probs, pred = predict(state, x)
        _sync(pred)
        windows.append(x.shape[0] * iters / (time.perf_counter() - start))
    med, spread = _median_spread(windows)
    return {"img_per_sec": med, "spread_pct": spread}


def bench_unet_mfu():
    """Bare-step MFU from XLA's own cost analysis."""
    import jax

    step, state, images, labels = _build_unet_step(False)
    ips, spread = _time_step(step, state, images, labels)
    try:
        key = jax.random.PRNGKey(1)
        cost = jax.jit(step).lower(state, images, labels, key).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops_per_step = float(cost.get("flops", 0.0))
        mfu = (ips / images.shape[0]) * flops_per_step / V5E_PEAK_BF16 * 100
        return ips, spread, round(mfu, 1)
    except Exception:
        return ips, spread, None


def bench_cpcsam_steps():
    """CPC-SAM ViT-B/512 phase-1 and phase-2 train steps (the real
    `CPCSAMTrainer` programs: dual-mask forward, LoRA-masked adam, prompt
    self-generation on device in phase 2)."""
    import jax
    import jax.numpy as jnp

    from mia_tpu.memories import init_feature_memory
    from mia_tpu.training.cpcsam_trainer import CPCSAMConfig, CPCSAMTrainer

    cfg = CPCSAMConfig(
        batch_size=8,
        labeled_batch_ratio=0.5,
        image_size=512,
        num_classes=3,
        compute_dtype="bfloat16",
        max_iter=1000,
        warmup_iter=10,
        use_contrastive_loss=False,
        use_adv_loss=False,
    )
    trainer = CPCSAMTrainer(
        work_path="/tmp/bench_cpcsam", config=cfg, verbose=False
    )
    trainer.initialize()  # logger + model build
    trainer._setup_loss()
    trainer._setup_optimizer()
    trainer._make_programs()
    trainer.memory = init_feature_memory(cfg.num_classes, 2 * (256 // 16))

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((cfg.batch_size, 512, 512, 3), np.float32))
    labels = jnp.asarray(
        rng.integers(0, cfg.num_classes + 1, (cfg.batch_size, 512, 512)), jnp.int32
    )

    out = {}
    for name, fn in (("phase1", trainer._step_phase1), ("phase2", trainer._step_phase2)):
        # the step donates params/opt_state — give each phase its own copies
        params, opt_state, memory = jax.tree.map(
            jnp.copy, (trainer.params, trainer.opt_state, trainer.memory)
        )
        key = jax.random.PRNGKey(0)
        for i in range(2):
            params, opt_state, memory, metrics = fn(
                params, opt_state, memory, images, labels, key, jnp.asarray(i)
            )
        _sync(metrics["loss"])
        iters = 5
        windows = []
        # one throwaway window first: the phase programs' first timed
        # window repeatedly lands 10-30% slow (dispatch queue/cache warmup
        # beyond the 2 warmup steps — seen in the §25/§27 A/B arms),
        # inflating the reported spread
        for w in range(REPEATS + 1):
            start = time.perf_counter()
            for i in range(iters):
                params, opt_state, memory, metrics = fn(
                    params, opt_state, memory, images, labels, key, jnp.asarray(i)
                )
            _sync(metrics["loss"])
            if w > 0:
                windows.append(
                    cfg.batch_size * iters / (time.perf_counter() - start)
                )
        ips, spread = _median_spread(windows)
        out[name] = ips
        out[f"{name}_spread_pct"] = spread
        # MFU from XLA's own cost analysis so phase-program regressions are
        # tracked like the UNet/encoder numbers (VERDICT r3 weak #2)
        try:
            cost = fn.lower(
                params, opt_state, memory, images, labels, key, jnp.asarray(0)
            ).compile().cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            flops = float(cost.get("flops", 0.0))
            out[f"{name}_mfu_pct"] = round(
                (ips / cfg.batch_size) * flops / V5E_PEAK_BF16 * 100, 1
            )
        except Exception:
            out[f"{name}_mfu_pct"] = None
    return out


def bench_al_round(tmp_root="/tmp/bench_al_round"):
    """Full AL-round wall clock: 200-image synthetic FUGC pool at 384x512,
    50 train iters batch 12 + entropy acquisition sweep + valid epoch.

    TWO rounds, ``verbose=False`` (VERDICT r4 #1: the r4 three-round
    verbose run blew the driver's wall-clock budget and erased the whole
    artifact). Round 0 pays the train/eval program compilations; round 1
    pays the first pool-sweep compilation when the persistent compilation
    cache (default-ON, ``mia_tpu.utils.compile_cache``) is cold, and is
    the steady state when it is warm. The result separates
    {compile_included, steady_state}; docs must quote whichever matches
    their claim (VERDICT r2 weak #5)."""
    import shutil
    import sys
    from pathlib import Path

    sys.path.insert(0, "tests")
    from synth_data import make_fugc

    root = Path(tmp_root)
    shutil.rmtree(root, ignore_errors=True)
    root.mkdir(parents=True)
    make_fugc(root / "data", n_train=200, n_val=4, n_test=2, size=(384, 512))

    from mia_tpu.training.al_trainer import ALTrainer

    round_times = []

    class TimedALTrainer(ALTrainer):
        def on_round_start(self):
            self._bench_round_t0 = time.perf_counter()
            super().on_round_start()

        def on_round_end(self):
            super().on_round_end()
            round_times.append(time.perf_counter() - self._bench_round_t0)

    trainer = TimedALTrainer(
        work_path=root / "work",
        config=dict(
            dataset="fugc",
            data_path=str(root / "data"),
            in_channels=3,
            num_classes=2,
            image_size=256,
            batch_size=12,
            valid_batch_size=1,
            active_learning=True,
            num_rounds=2,
            budget=20,
            active_selector_name="entropy",
            num_iters=50,
            valid_freq_iter=50,
            do_augment=True,
            do_normalize=True,
            do_oversample=True,
            compute_dtype="bfloat16",
        ),
        # verbose=False per VERDICT r4 #1 (wall-clock budget); the
        # verbose=True logging-cadence cost was measured in r4 dev runs
        # (docs/PERF.md §20) and is not re-paid here.
        verbose=False,
    )
    trainer.initialize()
    trainer.run_training()
    return {
        "compile_included": round(round_times[0], 1),
        "steady_state": round(round_times[-1], 1),
    }


def bench_sam_encoder():
    """SAM ViT-B/512 encoder fwd and fwd+bwd img/s (bf16, batch 8) — the
    CPC-SAM FLOPs hot spot, exercising the packed Pallas attention
    kernels."""
    import jax
    import jax.numpy as jnp

    from mia_tpu.models.sam.image_encoder import ImageEncoderViT

    enc = ImageEncoderViT(
        img_size=512, embed_dim=768, depth=12, num_heads=12,
        use_rel_pos=True, window_size=14, global_attn_indexes=(2, 5, 8, 11),
        dtype=jnp.bfloat16,
    )
    batch = 8
    x = jnp.asarray(
        np.random.default_rng(0).random((batch, 512, 512, 3), np.float32)
    )
    variables = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(lambda: enc.init(jax.random.PRNGKey(0), x[:1])),
    )
    fwd = jax.jit(lambda v, x: enc.apply(v, x))
    bwd = jax.jit(jax.grad(lambda v, x: jnp.sum(enc.apply(v, x).astype(jnp.float32) ** 2)))

    out = {}
    for name, fn in (("fwd", fwd), ("fwd_bwd", bwd)):
        o = fn(variables, x)
        _sync(jax.tree.leaves(o)[0])
        iters = 10
        windows = []
        for _ in range(REPEATS):
            start = time.perf_counter()
            for _ in range(iters):
                o = fn(variables, x)
            _sync(jax.tree.leaves(o)[0])
            windows.append(batch * iters / (time.perf_counter() - start))
        out[name], out[f"{name}_spread_pct"] = _median_spread(windows)
    return out


def bench_sam_predictor():
    """Interactive serving path (BASELINE must-run config 5, the demo's
    predictor loop): SAM ViT-B/512 embed latency for ``set_image`` plus the
    steady-state prompt→mask latency of ``SamPredictor.predict`` (jitted
    prompt-encoder+decoder program, point prompt, multimask)."""
    import jax
    import jax.numpy as jnp

    from mia_tpu.models.sam.build_sam import sam_model_registry
    from mia_tpu.models.sam.predictor import SamPredictor

    model, _ = sam_model_registry["vit_b"](
        image_size=512, num_classes=1, compute_dtype=jnp.bfloat16
    )
    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, (512, 512, 3), np.uint8)
    variables = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(
            lambda: model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 512, 512, 3), jnp.float32),
                True,
                512,
            )
        ),
    )
    import jax.numpy as jnp_

    def wait_ready(arr):
        # set_image is async by design (predictor.py): the honest latency
        # is "embedding computed and usable". Through the tunnel
        # ``is_ready`` is only truthful for arrays with a pending host
        # copy (docs/PERF.md §19), so fence with a tiny scalar consumer +
        # async copy + spin — this costs one relay round trip on top of
        # the true completion, which is the tightest honest fence the
        # tunnel admits.
        s = jnp_.sum(arr[..., 0, 0])
        s.copy_to_host_async()
        while not s.is_ready():
            time.sleep(2e-4)
        np.asarray(s)

    predictor = SamPredictor(model, variables)
    predictor.set_image(image)  # compile embed
    wait_ready(predictor.features)
    pts = np.array([[256.0, 256.0], [128.0, 300.0]], np.float32)
    lbl = np.array([1, 1], np.int32)
    predictor.predict(point_coords=pts, point_labels=lbl)  # compile decode

    embed_windows, predict_windows = [], []
    for _ in range(REPEATS):
        start = time.perf_counter()
        embed_iters = 5
        for _ in range(embed_iters):
            predictor.set_image(image)
            wait_ready(predictor.features)
        embed_windows.append((time.perf_counter() - start) / embed_iters * 1e3)

        start = time.perf_counter()
        iters = 20
        for _ in range(iters):
            predictor.predict(point_coords=pts, point_labels=lbl)
        predict_windows.append((time.perf_counter() - start) / iters * 1e3)
    embed_ms, embed_spread = _median_spread(embed_windows)
    predict_ms, predict_spread = _median_spread(predict_windows)
    return {
        "set_image_ms": embed_ms,
        "set_image_spread_pct": embed_spread,
        "predict_ms": predict_ms,
        "predict_spread_pct": predict_spread,
    }


def bench_amg():
    """Automatic mask generation (reference
    ``automatic_mask_generator.py:35-372``): 32x32 point grid on a 512^2
    image through the batched chunk pipeline (64-point programs, on-device
    thresholding/packing, survivor-only D2H). Reports wall-clock per image
    and candidate masks evaluated per second, plus an on-chip A/B of the
    batched chunk vs the reference-shaped per-point loop at 64 points
    (VERDICT r3 #2)."""
    import jax
    import jax.numpy as jnp

    from mia_tpu.models.sam import SamAutomaticMaskGenerator
    from mia_tpu.models.sam.build_sam import sam_model_registry
    from mia_tpu.models.sam.predictor import SamPredictor

    model, _ = sam_model_registry["vit_b"](
        image_size=512, num_classes=1, compute_dtype=jnp.bfloat16
    )
    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, (512, 512, 3), np.uint8)
    variables = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(
            lambda: model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 512, 512, 3), jnp.float32),
                True,
                512,
            )
        ),
    )
    predictor = SamPredictor(model, variables)

    def timed(gen, iters=3):
        gen.generate(image)  # compile
        windows = []
        for _ in range(iters):
            start = time.perf_counter()
            gen.generate(image)
            windows.append((time.perf_counter() - start) * 1e3)
        return _median_spread(windows)

    # headline: the reference's default 32x32 grid in 64-point chunks
    amg = SamAutomaticMaskGenerator(
        predictor, points_per_side=32, points_per_batch=64
    )
    ms, ms_spread = timed(amg)
    # candidate masks per point = the decoder's multimask count, which Sam
    # wires to num_classes (sam.py:142); the flax module attr is only
    # readable under init/apply — reading it unbound was the r4 bench
    # crash (VERDICT r4 weak #1a)
    n_candidates = 32 * 32 * model.num_classes

    # A/B at 64 points: batched chunk vs per-point loop (points_per_batch=1
    # is exactly the reference's per-point dispatch granularity)
    ab = {}
    for name, ppb in (("batched_64pt_ms", 64), ("per_point_64pt_ms", 1)):
        gen = SamAutomaticMaskGenerator(
            predictor, points_per_side=8, points_per_batch=ppb
        )
        ab[name] = timed(gen, iters=2)[0]

    return {
        "ms_per_image_32x32": round(ms, 1),
        "ms_spread_pct": ms_spread,
        "candidate_masks_per_sec": round(n_candidates / (ms / 1e3), 1),
        **ab,
    }


def bench_torch_reference():
    """Reference-equivalent torch train step, images/sec (torch CPU — the
    reference stack is torch-only and this image has no CUDA). Same
    architecture (tests/torch_ref.TorchUNet mirrors the reference UNet),
    image size, Dice+CE, adam, grad-clip 10.

    Cached to /tmp between runs (VERDICT r4 #1: time-boxed so the torch
    loop can never eat the driver's budget — the torch baseline does not
    change round over round)."""
    from pathlib import Path

    cache = Path("/tmp/mia_bench_torch_ref.json")
    if cache.exists():
        try:
            return float(json.loads(cache.read_text())["img_per_sec"])
        except Exception:
            pass
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

    # time-box: one timed warmup step; if the host is slow, shrink the
    # measurement window (the number only needs O(10%) accuracy — it is
    # 3 orders of magnitude below the TPU value)
    t0 = time.perf_counter()
    step()
    first = time.perf_counter() - t0
    if first > 15.0:
        iters, warmup = 2, 0
    for _ in range(warmup):
        step()
    start = time.perf_counter()
    for _ in range(iters):
        step()
    ips = batch * iters / (time.perf_counter() - start)
    try:
        cache.write_text(json.dumps({"img_per_sec": ips}))
    except OSError:
        pass
    return ips


def main():
    """Run every bench under an internal wall-clock budget, persisting a
    partial result after each section, and print ONE JSON line.

    VERDICT r4 weak #1: the r4 run hit the driver's timeout and, because
    JSON was only printed at the very end, the whole artifact was lost.
    Now (a) the budget (env ``BENCH_BUDGET_S``, default 1500 s) skips
    remaining sections rather than overrun, (b) ``BENCH.partial.json`` is
    written after every section, and (c) a SIGTERM handler prints the
    partial JSON line so even a driver kill leaves a parseable stdout."""
    import signal

    from mia_tpu.utils import maybe_enable_compilation_cache

    maybe_enable_compilation_cache()  # default-ON on TPU: warm repeat runs

    t0 = time.monotonic()
    # 2100 s: a congested-tunnel session measured 1450 s for the pre-amg
    # sections alone (2026-08-21); a driver kill at any outer timeout still
    # leaves a parseable artifact via the SIGTERM partial-emit below
    budget = float(os.environ.get("BENCH_BUDGET_S", "2100"))
    result = {
        "metric": "al_train_step_augmented_images_per_sec_per_chip",
        "value": None,
        "unit": "images/sec/chip",
        "vs_baseline": None,
    }

    def emit():
        print(json.dumps(result), flush=True)

    def on_term(signum, frame):
        result["timed_out"] = True
        emit()
        raise SystemExit(1)

    signal.signal(signal.SIGTERM, on_term)

    def save_partial():
        try:
            with open("BENCH.partial.json", "w") as f:
                json.dump(result, f)
        except OSError:
            pass

    def time_left():
        return budget - (time.monotonic() - t0)

    baseline = None
    try:
        baseline = bench_torch_reference()
    except Exception:
        traceback.print_exc()

    try:
        value, spread = bench_unet(augmented=True)
        result["value"] = value
        result["value_spread_pct"] = spread
        result["vs_baseline"] = round(value / baseline, 3) if baseline else 1.0
    except Exception:
        traceback.print_exc()
    save_partial()

    # amg/predictor run BEFORE al_round: al_round has the most variable
    # wall cost (host-bound, compile-sensitive), so it takes the budget
    # skip rather than starving the serving-path metrics (r4's crash site)
    for key, fn, min_left in (
        ("unet_train_bare_img_per_sec", bench_unet_mfu, 60),
        ("unet_infer_img_per_sec", bench_unet_infer, 45),
        ("cpcsam_img_per_sec", bench_cpcsam_steps, 240),
        ("sam_encoder_img_per_sec", bench_sam_encoder, 120),
        ("sam_predictor_latency_ms", bench_sam_predictor, 90),
        ("amg", bench_amg, 120),
        ("al_round_seconds", bench_al_round, 180),
    ):
        if time_left() < min_left:
            result[key] = "skipped_budget"
            save_partial()
            continue
        try:
            result[key] = fn()
        except Exception:
            result[key] = None
            traceback.print_exc()
        save_partial()
    if isinstance(result.get("unet_train_bare_img_per_sec"), tuple):
        bare, spread, mfu = result.pop("unet_train_bare_img_per_sec")
        result["unet_train_bare_img_per_sec"] = round(bare, 2)
        result["unet_train_bare_spread_pct"] = spread
        result["unet_train_bare_mfu_pct"] = mfu

    result["bench_seconds"] = round(time.monotonic() - t0, 1)
    save_partial()
    emit()


if __name__ == "__main__":
    main()
