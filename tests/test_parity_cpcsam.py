"""Cross-framework numeric parity for the CPC-SAM dual-mask stack.

The UNet path has an end-to-end torch harness (test_parity_e2e.py); this is
its CPC-SAM counterpart (reference ``src/training/cpcsam_trainer.py:1075-1330``
loss composition, ``sam_dualmask_same_prompt_class_random_large.py:271-338``
dual-mask ensembling): the REAL jitted phase-1 trainer program and a tiny
PyTorch mirror (tests/torch_sam_ref.py) train from IDENTICAL weights on
identical batches — loss curves must track; plus one prompt-FIXED phase-2
composition (injected prompts bypass RNG divergence) must agree across
frameworks. Measured numbers are recorded in PARITY.md.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, "tests")

torch = pytest.importorskip("torch")

from torch_sam_ref import TorchSamDualmask, torch_dice_ce  # noqa: E402

SIZE = 64
BATCH = 4
LBS = 2
STEPS = 50
LR = 1e-3
WARMUP = 10
DICE_W = 0.8
CLASSES = 3  # foreground classes; logits have CLASSES+1 channels


def _make_batches(rng, n_batches):
    yy, xx = np.mgrid[0:SIZE, 0:SIZE]
    images = np.zeros((n_batches, BATCH, SIZE, SIZE, 3), np.float32)
    labels = np.zeros((n_batches, BATCH, SIZE, SIZE), np.int64)
    for b in range(n_batches):
        for i in range(BATCH):
            for c in (1, 2, 3):
                cy, cx = rng.uniform(10, SIZE - 10, 2)
                r = rng.uniform(5, 10)
                mask = (yy - cy) ** 2 + (xx - cx) ** 2 < r**2
                labels[b, i][mask] = c
                images[b, i, :, :, (c - 1) % 3][mask] = 200.0
            images[b, i] += rng.normal(60, 20, (SIZE, SIZE, 3)).astype(np.float32)
    return images, np.clip(labels, 0, CLASSES)


def _build_trainer(tmp_path):
    """Real CPCSAMTrainer on synthetic ACDC with a tiny ViT."""
    import mia_tpu.models.sam.build_sam as bs
    from mia_tpu.training import cpcsam_trainer as ct
    from mia_tpu.training.cpcsam_trainer import CPCSAMTrainer

    sys.path.insert(0, "tests")
    from synth_data import make_acdc

    make_acdc(tmp_path / "data", n_slices=8, n_vols=1, size=(SIZE, SIZE), depth=2)
    config = dict(
        seed=11,
        num_classes=CLASSES,
        image_size=SIZE,
        batch_size=BATCH,
        labeled_batch_ratio=0.5,
        labeled_num=1,
        data_path=str(tmp_path / "data"),
        min_iter=STEPS,
        max_iter=STEPS,
        warmup_iter=STEPS,
        valid_freq_iter=10 * STEPS,
        lr_warmup_iter=WARMUP,
        start_lr=LR,
        num_epochs=1,
        lora_rank=2,
        dice_weight=DICE_W,
        promptmode=["point"],
    )
    orig = bs._VIT_SPECS["vit_b"]
    bs._VIT_SPECS["vit_b"] = dict(embed_dim=32, depth=2, num_heads=2, global_idx=(1,))
    ct.PATIENTS_TO_SLICES["ACDC"]["1"] = 4
    trainer = CPCSAMTrainer(work_path=tmp_path / "work", config=config, verbose=False)
    try:
        trainer.initialize()
        trainer.on_train_start()
    finally:
        bs._VIT_SPECS["vit_b"] = orig
        ct.PATIENTS_TO_SLICES["ACDC"]["1"] = 32
    return trainer


def _torch_mirror(trainer):
    return TorchSamDualmask(
        jax.device_get(trainer.params),
        img_size=SIZE,
        num_classes=CLASSES,
        num_decoders=3,
        encoder_depth=2,
        encoder_num_heads=2,
        encoder_global_attn_indexes=(1,),
        lora_rank=2,
        window_size=14,
    )


@pytest.mark.slow
def test_cpcsam_phase1_loss_parity(tmp_path):
    rng = np.random.default_rng(7)
    images, labels = _make_batches(rng, STEPS)

    trainer = _build_trainer(tmp_path)
    tmodel = _torch_mirror(trainer)

    # forward parity from identical weights before any training
    x0 = torch.from_numpy(images[0])
    with torch.no_grad():
        t_out = tmodel.forward_train(x0, SIZE)
    j_out = trainer.model.apply(
        {"params": trainer.params}, jnp.asarray(images[0]), True, SIZE, -1,
        None, rngs={"prompt": jax.random.PRNGKey(0)},
    )
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(j_out["low_res_logits"][i]),
            t_out["low_res_logits"][i].numpy(),
            rtol=1e-3, atol=2e-4,
        )

    # --- torch phase-1 run ------------------------------------------------
    for key, prm in tmodel.p.p.items():
        prm.requires_grad = ("image_encoder" not in key) or ("lora" in key)
    topt = torch.optim.AdamW(
        [prm for prm in tmodel.p.p.values() if prm.requires_grad],
        lr=LR, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0,
    )
    lr_fn = trainer.lr_schedule
    t_losses = []
    for s in range(STEPS):
        for g in topt.param_groups:
            g["lr"] = float(lr_fn(s))
        xb = torch.from_numpy(images[s])
        yb = torch.from_numpy(labels[s][:LBS])
        topt.zero_grad()
        out = tmodel.forward_train(xb, SIZE)
        loss = sum(
            torch_dice_ce(out["low_res_logits"][i][:LBS], yb, DICE_W, CLASSES + 1)
            for i in range(3)
        )
        loss.backward()
        topt.step()
        t_losses.append(float(loss))

    # --- jax run through the REAL jitted phase-1 program ------------------
    params, opt_state, memory = trainer.params, trainer.opt_state, trainer.memory
    j_losses = []
    key = jax.random.PRNGKey(0)
    for s in range(STEPS):
        params, opt_state, memory, metrics = trainer._step_phase1(
            params, opt_state, memory,
            jnp.asarray(images[s]), jnp.asarray(labels[s], jnp.int32),
            key, jnp.asarray(s),
        )
        j_losses.append(float(metrics["loss"]))

    print(f"\nCPCSAM PARITY torch_final={t_losses[-1]:.4f} jax_final={j_losses[-1]:.4f}")
    corr = np.corrcoef(t_losses, j_losses)[0, 1]
    print(f"CPCSAM PARITY corr={corr:.5f}")
    assert corr > 0.99
    assert abs(t_losses[-1] - j_losses[-1]) < 0.02
    # both runs actually learned (loss moved meaningfully)
    assert t_losses[-1] < t_losses[0] and j_losses[-1] < j_losses[0]


@pytest.mark.slow
def test_cpcsam_phase2_fixed_prompt_composition_parity(tmp_path):
    """One supervised phase-2 composition (sup2 + sup2_r + consistency
    terms) with INJECTED prompts — identical across frameworks."""
    rng = np.random.default_rng(3)
    images, labels = _make_batches(rng, 1)
    trainer = _build_trainer(tmp_path)
    tmodel = _torch_mirror(trainer)
    cfg = trainer.config

    b = BATCH
    c = CLASSES + 1
    coords = rng.uniform(5, SIZE - 5, (b, c * 2, 2)).astype(np.float32)
    plabels = np.tile(np.repeat(np.arange(c), 2)[None], (b, 1)).astype(np.int32)
    boxes = np.tile(
        np.asarray([[[8.0, 8.0], [50.0, 50.0]]], np.float32)[None], (b, c - 1, 1, 1)
    )
    box_labels = np.zeros((b, c - 1), np.int32)
    mask_prompt = rng.random((b, 16, 16, 1)).astype(np.float32)

    def to_j(t):
        return jax.tree.map(jnp.asarray, t)

    prompts = (
        (coords, plabels), (coords + 2.0, plabels),
        (boxes, box_labels), (boxes * 1.1, box_labels), mask_prompt,
    )

    lbs = LBS
    y = labels[0][:lbs]

    # --- jax side ---------------------------------------------------------
    jp = to_j(prompts)
    j_outs = [
        trainer.model.apply(
            {"params": trainer.params}, jnp.asarray(images[0]), True, SIZE,
            p, ["point"], prompts=jp,
            rngs={"prompt": jax.random.PRNGKey(1)},
        )
        for p in range(3)
    ]
    from mia_tpu.losses import DiceAndCELoss

    sup_loss = DiceAndCELoss(dice_weight=DICE_W, ce_weight=1 - DICE_W,
                             smooth=1e-5, do_bg=True)

    def j_sup(logits, lbl):
        return sup_loss(logits, jnp.asarray(lbl), dice_weight=DICE_W,
                        ce_weight=1 - DICE_W)[0]

    def j_cons(logits, pseudo):
        return sup_loss(logits, pseudo, dice_weight=0.5, ce_weight=0.5)[0]

    j_terms = []
    for p in range(3):
        out2 = j_outs[p]
        lrl_p = out2["low_res_logits"][p]
        lrl_pr = out2["low_res_logits_r"][p]
        sup2 = j_sup(lrl_p[:lbs], y)
        sup2_r = j_sup(lrl_pr[:lbs], y)
        ens = (jax.nn.softmax(lrl_p.astype(jnp.float32), -1)
               + jax.nn.softmax(lrl_pr.astype(jnp.float32), -1)) / 2.0
        pseudo = jnp.argmax(ens[lbs:], -1)
        cons2 = sum(
            j_cons(out2["low_res_logits"][o][lbs:], pseudo)
            for o in range(3) if o != p
        )
        cons2_r = j_cons(lrl_pr[lbs:], pseudo)
        j_terms.append([float(sup2), float(sup2_r), float(cons2), float(cons2_r)])

    # --- torch side -------------------------------------------------------
    tp = (
        (torch.from_numpy(coords), torch.from_numpy(plabels)),
        (torch.from_numpy(coords + 2.0), torch.from_numpy(plabels)),
        (torch.from_numpy(boxes), torch.from_numpy(box_labels)),
        (torch.from_numpy(boxes * 1.1), torch.from_numpy(box_labels)),
        torch.from_numpy(mask_prompt),
    )
    yb = torch.from_numpy(y)
    t_terms = []
    with torch.no_grad():
        for p in range(3):
            out2 = tmodel.forward_train(
                torch.from_numpy(images[0]), SIZE, prompt_idx=p, prompts=tp,
                prompt_mode="point",
            )
            lrl_p = out2["low_res_logits"][p]
            lrl_pr = out2["low_res_logits_r"][p]
            sup2 = torch_dice_ce(lrl_p[:lbs], yb, DICE_W, CLASSES + 1)
            sup2_r = torch_dice_ce(lrl_pr[:lbs], yb, DICE_W, CLASSES + 1)
            ens = (lrl_p.permute(0, 3, 1, 2).softmax(1)
                   + lrl_pr.permute(0, 3, 1, 2).softmax(1)) / 2.0
            pseudo = ens[lbs:].argmax(1)
            cons2 = sum(
                torch_dice_ce(out2["low_res_logits"][o][lbs:], pseudo, 0.5,
                              CLASSES + 1)
                for o in range(3) if o != p
            )
            cons2_r = torch_dice_ce(lrl_pr[lbs:], pseudo, 0.5, CLASSES + 1)
            t_terms.append([float(sup2), float(sup2_r), float(cons2),
                            float(cons2_r)])

    np.testing.assert_allclose(
        np.asarray(j_terms), np.asarray(t_terms), rtol=5e-3, atol=1e-3
    )
