"""CPC-SAM trainer smoke test on synthetic ACDC with a tiny dual-mask SAM,
plus contrastive/VAT/memory unit checks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mia_tpu.losses import prototype_contrastive_loss, vat_loss
from mia_tpu.memories import init_feature_memory, update_feature_memory

from synth_data import make_acdc


def test_feature_memory_update(rng):
    mem = init_feature_memory(num_classes=2, feat_dim=4, elements_per_class=3)
    feats = jnp.asarray(rng.random((10, 4)), jnp.float32)
    labels = jnp.asarray([1, 1, 1, 1, 2, 2, -1, -1, -1, -1])
    scores = jnp.asarray(rng.random((3, 10)), jnp.float32)
    mem2 = update_feature_memory(mem, feats, labels, scores)
    assert int(mem2.valid[1].sum()) == 3  # 4 candidates, keep 3 lowest-score
    assert int(mem2.valid[2].sum()) == 2
    assert int(mem2.valid[0].sum()) == 0  # class 0 had no rows → unchanged
    # lowest-scored selection for class 1
    cls1_scores = np.asarray(scores[1][:4])
    kept = set(np.argsort(cls1_scores)[:3])
    for row in np.asarray(mem2.bank[1]):
        matches = [i for i in range(4) if np.allclose(row, np.asarray(feats[i]))]
        assert matches and matches[0] in kept


def test_contrastive_loss_finite(rng):
    mem = init_feature_memory(num_classes=2, feat_dim=4, elements_per_class=3)
    feats = jnp.asarray(rng.random((10, 4)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 3, 10))
    scores = jnp.asarray(rng.random((3, 10)), jnp.float32)
    mem = update_feature_memory(mem, feats, labels, scores)
    loss = prototype_contrastive_loss(
        feats,
        labels,
        jnp.ones(10, bool),
        mem,
        scores,
        jnp.asarray(rng.random((3, 3)), jnp.float32),
        num_classes=2,
    )
    assert np.isfinite(float(loss))
    assert float(loss) >= 0.0


def test_vat_loss(rng):
    w = jnp.asarray(rng.random((3, 4)), jnp.float32)

    def forward(x):
        return [x @ w]  # (B, 8, 8, 3) -> fake logits over last dim

    x = jnp.asarray(rng.random((2, 8, 8, 3)), jnp.float32)
    loss = vat_loss(jax.random.PRNGKey(0), forward, x, xi=1.0, epi=0.5, ip=1)
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_cpcsam_trainer_end_to_end(tmp_path):
    from mia_tpu.training.cpcsam_trainer import CPCSAMTrainer, patients_to_slices

    assert patients_to_slices("ACDC", 7) == 136

    make_acdc(tmp_path / "data", n_slices=8, n_vols=1, size=(32, 32), depth=2)

    config = dict(
        seed=3,
        num_classes=3,
        image_size=32,
        batch_size=4,
        labeled_batch_ratio=0.5,
        labeled_num=1,
        data_path=str(tmp_path / "data"),
        min_iter=2,
        max_iter=2,
        warmup_iter=1,  # phase 2 kicks in on iter 1
        valid_freq_iter=10,
        lr_warmup_iter=1,
        num_epochs=2,
        lora_rank=2,
        promptmode=["point", "box"],
        use_contrastive_loss=True,
        contrastive_weight=0.1,
        loss3_weight_rampup_iter=2,
    )
    trainer = CPCSAMTrainer(work_path=tmp_path / "work", config=config, verbose=False)
    # shrink the ViT for test speed
    import mia_tpu.models.sam.build_sam as bs

    orig = bs._VIT_SPECS["vit_b"]
    bs._VIT_SPECS["vit_b"] = dict(embed_dim=32, depth=2, num_heads=2, global_idx=(1,))
    try:
        # labeled table needs a tiny override too
        from mia_tpu.training import cpcsam_trainer as ct

        ct.PATIENTS_TO_SLICES["ACDC"]["1"] = 4
        trainer.initialize()
        trainer.run_training()
    finally:
        bs._VIT_SPECS["vit_b"] = orig
        ct.PATIENTS_TO_SLICES["ACDC"]["1"] = 32

    work = trainer.work_path
    assert (work / "final_model/lora.msgpack").is_file()
    assert (work / "config.json").is_file()
    assert (work / "test_mean.csv").is_file()
    # LoRA checkpoint round-trips
    trainer.load_state_dict(work / "final_model")


def test_vat_phase_program_builds(tmp_path):
    """use_adv_loss: the VAT power iteration compiles inside the phase-1
    program (noise on image embeddings, adv_loss_kwargs plumbed)."""
    from mia_tpu.training.cpcsam_trainer import CPCSAMTrainer

    make_acdc(tmp_path / "data", n_slices=8, n_vols=1, size=(32, 32), depth=2)
    config = dict(
        seed=5,
        num_classes=3,
        image_size=32,
        batch_size=4,
        labeled_num=1,
        data_path=str(tmp_path / "data"),
        min_iter=1,
        max_iter=1,
        warmup_iter=100,  # stay in phase 1
        valid_freq_iter=100,
        lr_warmup_iter=1,
        num_epochs=1,
        lora_rank=2,
        use_adv_loss=True,
        adv_loss_kwargs={"xi": 1.0, "epi": 0.5, "ip": 1},
    )
    import mia_tpu.models.sam.build_sam as bs
    from mia_tpu.training import cpcsam_trainer as ct

    orig = bs._VIT_SPECS["vit_b"]
    bs._VIT_SPECS["vit_b"] = dict(embed_dim=32, depth=1, num_heads=2, global_idx=(0,))
    ct.PATIENTS_TO_SLICES["ACDC"]["1"] = 4
    try:
        trainer = CPCSAMTrainer(work_path=tmp_path / "w", config=config, verbose=False)
        trainer.initialize()
        trainer.on_train_start()
        trainer.epoch_train_outputs = []
        batch = next(iter(trainer._train_loader()))
        trainer.train_step(batch)
        trainer._flush_train_logs()  # per-iter logging runs one iter behind
        losses = trainer.epoch_train_outputs[0]["loss"]
        assert np.isfinite(losses[0])
        assert losses[3] != 0.0  # adv term contributed to loss3
    finally:
        bs._VIT_SPECS["vit_b"] = orig
        ct.PATIENTS_TO_SLICES["ACDC"]["1"] = 32


def test_cpcsam_step_sharded(tmp_path):
    """The CPC-SAM train step compiles and runs data-parallel over the
    8-virtual-device mesh (params/memory replicated, batch sharded)."""
    from mia_tpu.parallel import make_mesh
    from mia_tpu.training.cpcsam_trainer import CPCSAMTrainer

    make_acdc(tmp_path / "data", n_slices=8, n_vols=1, size=(32, 32), depth=2)
    config = dict(
        seed=5,
        num_classes=3,
        image_size=32,
        batch_size=8,
        labeled_num=1,
        data_path=str(tmp_path / "data"),
        min_iter=1,
        max_iter=1,
        warmup_iter=100,
        valid_freq_iter=100,
        lr_warmup_iter=1,
        num_epochs=1,
        lora_rank=2,
    )
    import mia_tpu.models.sam.build_sam as bs
    from mia_tpu.training import cpcsam_trainer as ct

    orig = bs._VIT_SPECS["vit_b"]
    bs._VIT_SPECS["vit_b"] = dict(embed_dim=32, depth=1, num_heads=2, global_idx=(0,))
    ct.PATIENTS_TO_SLICES["ACDC"]["1"] = 4
    try:
        mesh = make_mesh(("data",))
        trainer = CPCSAMTrainer(
            work_path=tmp_path / "w", config=config, verbose=False, mesh=mesh
        )
        trainer.initialize()
        trainer.on_train_start()
        trainer.epoch_train_outputs = []
        batch = next(iter(trainer._train_loader()))
        trainer.train_step(batch)
        trainer._flush_train_logs()  # per-iter logging runs one iter behind
        assert np.isfinite(trainer.epoch_train_outputs[0]["loss"][0])
    finally:
        bs._VIT_SPECS["vit_b"] = orig
        ct.PATIENTS_TO_SLICES["ACDC"]["1"] = 32


def test_wandb_alerts_on_improvement_and_stagnation():
    """Alert parity with the reference's live wandb block
    (cpcsam_trainer.py:1029-1059), driven through on_valid_epoch_end with a
    stub runner."""
    import logging

    import numpy as np

    from mia_tpu.training.cpcsam_trainer import CPCSAMConfig, CPCSAMTrainer

    trainer = CPCSAMTrainer.__new__(CPCSAMTrainer)
    trainer.config = CPCSAMConfig(early_stop_max_patience=4)
    trainer.config.maximum_save_metric = True
    trainer.logger = logging.getLogger("test_cpcsam_alerts")
    trainer.current_iter = 7
    trainer.current_epoch = 1
    trainer.current_patience = 0
    trainer._best_valid_metric = 0.5
    trainer.work_path = __import__("pathlib").Path("/tmp/cpcsam_alert_test")
    trainer.save_state_dict = lambda *a, **k: None

    alerts = []

    class StubRunner:
        def alert(self, title, text, level):
            alerts.append((title, text, level))

    trainer.wandb_runner = StubRunner()

    # improvement -> INFO alert with the metric text
    trainer.epoch_valid_outputs = [
        {"metric": np.array([[0.9, 3.0], [0.8, 4.0]]), "loss": 0.1}
    ]
    trainer.on_valid_epoch_end()
    assert alerts and alerts[-1][0] == "Improved Performance"
    assert "average_dsc=0.8500" in alerts[-1][1]
    assert alerts[-1][2] == "INFO"

    # stagnation: patience crosses half of early_stop_max_patience -> WARN
    trainer.epoch_valid_outputs = [
        {"metric": np.array([[0.1, 30.0], [0.1, 30.0]]), "loss": 0.9}
    ]
    trainer.on_valid_epoch_end()  # patience 1 < 2, no alert
    n_alerts = len(alerts)
    trainer.on_valid_epoch_end()  # patience 2 >= 2 -> WARN
    assert len(alerts) == n_alerts + 1
    assert alerts[-1] == (
        "Performance Stagnation",
        "Performance is not improved for 2 step",
        "WARN",
    )

    # alerts must never raise without a runner
    trainer.wandb_runner = None
    trainer.epoch_valid_outputs = [
        {"metric": np.array([[0.95, 2.0], [0.9, 2.5]]), "loss": 0.05}
    ]
    trainer.on_valid_epoch_end()


def test_eval_depth_bucketing_exact(rng, monkeypatch):
    """Depth bucketing pads slices into the heavy model program and slices
    them back off — results must be identical to the unbucketed path."""
    import jax
    import jax.numpy as jnp

    from mia_tpu.models.sam import Sam
    from mia_tpu.models.sam.validation import test_single_volume

    model = Sam(
        img_size=32,
        num_classes=3,
        encoder_embed_dim=32,
        encoder_depth=1,
        encoder_num_heads=2,
        encoder_global_attn_indexes=(0,),
    )
    v = model.init(
        jax.random.PRNGKey(0), jnp.ones((1, 32, 32, 3), jnp.float32), True, 32
    )

    shapes = []

    def apply_fn(x):
        shapes.append(x.shape[0])
        return model.apply(v, x, True, 32)

    img = rng.random((5, 32, 32, 3)).astype(np.float32)  # D=5 → pads to 8
    lbl = rng.integers(0, 4, (5, 32, 32)).astype(np.int32)

    monkeypatch.setenv("MIA_EVAL_DEPTH_BUCKET", "8")
    m_bucket, _ = test_single_volume(img, lbl, apply_fn, classes=4, patch_size=(32, 32))
    monkeypatch.setenv("MIA_EVAL_DEPTH_BUCKET", "0")
    m_exact, _ = test_single_volume(img, lbl, apply_fn, classes=4, patch_size=(32, 32))
    assert shapes == [8, 5]  # bucketed then exact
    np.testing.assert_allclose(
        np.asarray(m_bucket, np.float32), np.asarray(m_exact, np.float32),
        rtol=1e-6, atol=1e-6,
    )


def test_cpcsam_valid_epoch_sharded_matches_single_device(tmp_path):
    """A FULL CPC-SAM valid epoch (volume slice-stacks,
    reference ``validation.py:29-79``) under the 8-device mesh produces the
    same per-case metrics and losses as the single-device path — the
    padding/partial-stack integration layer (depth_multiple) is exact
    (VERDICT r3 #6). Volume depths (3, 5) deliberately do NOT divide the
    mesh's data axis."""
    from mia_tpu.parallel import make_mesh
    from mia_tpu.training.cpcsam_trainer import CPCSAMTrainer

    make_acdc(tmp_path / "data", n_slices=8, n_vols=2, size=(32, 32), depth=3)
    # second volume with a different depth: rewrite one valid volume to 5
    import h5py

    vol_dir = tmp_path / "data" / "ACDC"
    lists = (vol_dir / "val.list").read_text().split()
    with h5py.File(vol_dir / "data" / f"{lists[-1]}.h5", "r+") as f:
        img = f["image"][...]
        lab = f["label"][...]
        del f["image"], f["label"]
        f["image"] = np.concatenate([img, img[:2]], axis=0)
        f["label"] = np.concatenate([lab, lab[:2]], axis=0)

    config = dict(
        seed=7,
        num_classes=3,
        image_size=32,
        batch_size=8,
        labeled_num=1,
        data_path=str(tmp_path / "data"),
        min_iter=1,
        max_iter=1,
        warmup_iter=100,
        valid_freq_iter=100,
        lr_warmup_iter=1,
        num_epochs=1,
        lora_rank=2,
    )
    import mia_tpu.models.sam.build_sam as bs
    from mia_tpu.training import cpcsam_trainer as ct

    orig = bs._VIT_SPECS["vit_b"]
    bs._VIT_SPECS["vit_b"] = dict(embed_dim=32, depth=1, num_heads=2, global_idx=(0,))
    ct.PATIENTS_TO_SLICES["ACDC"]["1"] = 4

    def run_valid_epoch(mesh):
        trainer = CPCSAMTrainer(
            work_path=tmp_path / ("mesh" if mesh else "single"),
            config=config, verbose=False, mesh=mesh,
        )
        trainer.initialize()
        trainer.on_train_start()
        trainer.epoch_valid_outputs = []
        for batch in trainer.valid_dataloader:
            trainer.valid_step(batch)
        outs = jax.device_get(trainer.epoch_valid_outputs)
        return [(np.asarray(o["metric"]), float(o["loss"])) for o in outs]

    try:
        single = run_valid_epoch(None)
        sharded = run_valid_epoch(make_mesh(("data",)))
    finally:
        bs._VIT_SPECS["vit_b"] = orig
        ct.PATIENTS_TO_SLICES["ACDC"]["1"] = 32

    assert len(single) == len(sharded) == 2
    for (m1, l1), (m2, l2) in zip(single, sharded):
        np.testing.assert_allclose(m1, m2, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(l1, l2, rtol=1e-4, atol=1e-5)


def test_phase1_labeled_only_matches_full_batch(tmp_path):
    """The labeled-slice phase programs (phase1_labeled_only=True, the
    default) produce the SAME losses and parameter updates as the
    reference-shaped full-batch programs — the unlabeled half of the
    phase-1 forward (and of phase-2's first unprompted pass) is provably
    dead compute (reference ``cpcsam_trainer.py:1099-1121``)."""
    import tempfile

    import mia_tpu.models.sam.build_sam as bs
    from mia_tpu.memories import init_feature_memory
    from mia_tpu.training.cpcsam_trainer import CPCSAMTrainer

    orig = bs._VIT_SPECS["vit_b"]
    bs._VIT_SPECS["vit_b"] = dict(embed_dim=32, depth=1, num_heads=2, global_idx=(0,))
    try:
        def build(labeled_only):
            trainer = CPCSAMTrainer(
                work_path=tmp_path / f"w_{labeled_only}",
                config=dict(
                    seed=0,
                    image_size=32,
                    batch_size=4,
                    labeled_batch_ratio=0.5,
                    num_classes=3,
                    lora_rank=2,
                    max_iter=10,
                    warmup_iter=0,
                    lr_warmup_iter=1,
                    phase1_labeled_only=labeled_only,
                ),
                verbose=False,
            )
            trainer.initialize()
            trainer._setup_loss()
            trainer._setup_optimizer()
            trainer._make_programs()
            trainer.memory = init_feature_memory(3, 2 * (256 // 16))
            return trainer

        t_sliced = build(True)
        t_full = build(False)
        # identical weights on both arms
        t_full.params = jax.tree.map(jnp.copy, t_sliced.params)
        t_full.opt_state = t_full.tx.init(t_full.params)

        rng = np.random.default_rng(0)
        images = jnp.asarray(rng.random((4, 32, 32, 3), np.float32))
        labels = jnp.asarray(rng.integers(0, 4, (4, 32, 32)), jnp.int32)
        key = jax.random.PRNGKey(7)

        for phase_name in ("_step_phase1", "_step_phase2"):
            ps, os_, ms, mets_s = getattr(t_sliced, phase_name)(
                jax.tree.map(jnp.copy, t_sliced.params),
                t_sliced.tx.init(t_sliced.params),
                t_sliced.memory, images, labels, key, jnp.asarray(0),
            )
            pf, of_, mf, mets_f = getattr(t_full, phase_name)(
                jax.tree.map(jnp.copy, t_full.params),
                t_full.tx.init(t_full.params),
                t_full.memory, images, labels, key, jnp.asarray(0),
            )
            np.testing.assert_allclose(
                float(mets_s["loss1"]), float(mets_f["loss1"]), rtol=1e-5
            )
            if phase_name == "_step_phase2":
                np.testing.assert_allclose(
                    float(mets_s["loss2"]), float(mets_f["loss2"]), rtol=1e-4
                )
            # post-adam params: the sliced/full programs reassociate f32
            # reductions differently (different fusion shapes), and adam's
            # g/(sqrt(v)+eps) normalization amplifies near-zero-grad noise
            # to update scale (a first-step update is +-lr = 1e-3; a grad
            # whose sign path differs moves an element by up to 2*lr).
            # Observed: <=1 element per half-million off by ~3e-5. The
            # sharp dead-compute assertion is the loss equality above;
            # params get a 0.1*lr atol, which still catches any systematic
            # (whole-tensor) divergence
            for a, b in zip(jax.tree.leaves(ps), jax.tree.leaves(pf)):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
                )
    finally:
        bs._VIT_SPECS["vit_b"] = orig
