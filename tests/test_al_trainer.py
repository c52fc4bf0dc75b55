"""End-to-end ALTrainer test: deterministic-seed AL rounds on a synthetic
FUGC pool (SURVEY §4 test strategy)."""

import json

import numpy as np
import pytest

from mia_tpu.training import ALConfig, ALTrainer

from synth_data import make_fugc


@pytest.fixture(scope="module")
def fugc_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("fugc_data")
    make_fugc(root, n_train=8, n_val=2, n_test=2, size=(32, 32))
    return root


def _config(root, **over):
    base = dict(
        seed=7,
        dataset="fugc",
        data_path=str(root),
        in_channels=3,
        num_classes=2,
        image_size=32,
        batch_size=2,
        valid_batch_size=1,
        valid_mode="slice",
        active_learning=True,
        num_rounds=2,
        budget=2,
        active_selector_name="entropy",
        num_iters=3,
        valid_freq_iter=2,
        lr_warmup_iter=1,
        start_lr=1e-3,
        do_augment=True,
        do_normalize=True,
        do_oversample=True,
        optimizer_name="adam",
        dropout_prob=0.0,
    )
    base.update(over)
    return base


def _tiny_trainer(root, tmp_path, **over):
    trainer = ALTrainer(work_path=tmp_path, config=_config(root, **over), verbose=False)
    # shrink the UNet for test speed
    trainer._unet_config_full = trainer._unet_config

    def small_cfg():
        cfg = trainer._unet_config_full()
        import dataclasses

        return dataclasses.replace(cfg, channels_list=(4, 8))

    trainer._unet_config = small_cfg
    return trainer


def test_al_training_end_to_end(fugc_root, tmp_path):
    trainer = _tiny_trainer(fugc_root, tmp_path)
    trainer.initialize()
    trainer.run_training()

    work = trainer.work_path
    # round layout (al_trainer.py:1044-1181)
    for r in range(2):
        assert (work / f"round_{r}/data_list.json").is_file()
        assert (work / f"round_{r}/best_model/model.msgpack").is_file()
        assert (work / f"round_{r}/final_model/model.msgpack").is_file()
        assert (work / f"test_mean_round_{r}.csv").is_file()
    # AL grew the labeled set by budget each round
    dl0 = json.loads((work / "round_0/data_list.json").read_text())
    dl1 = json.loads((work / "round_1/data_list.json").read_text())
    assert len(dl0["labeled_image_idx"]) == 2
    assert len(dl1["labeled_image_idx"]) == 4
    assert set(dl0["labeled_image_idx"]) <= set(dl1["labeled_image_idx"])
    # config snapshot + sanity overlays + log exist
    assert (work / "config.json").is_file()
    assert (work / "config.txt").is_file()
    assert any((work / "sanity").glob("*.png"))
    # test CSV has per-case rows with the per-class columns
    header = (work / "test_mean_round_1.csv").read_text().splitlines()[0]
    assert "all-DSC" in header and "anterior lip-DSC" in header


def test_supervised_mode_uses_all_data(fugc_root, tmp_path):
    trainer = _tiny_trainer(
        fugc_root, tmp_path, active_learning=False, num_iters=2, valid_freq_iter=10
    )
    trainer.initialize()
    trainer.run_training()
    dl = json.loads((trainer.work_path / "round_0/data_list.json").read_text())
    assert len(dl["labeled_image_idx"]) == 8
    assert len(dl["pool_image_idx"]) == 0


def test_test_only_path(fugc_root, tmp_path):
    trainer = _tiny_trainer(fugc_root, tmp_path, active_learning=False)
    trainer.initialize()
    result = trainer.perform_real_test()
    assert set(result) == {"dsc", "hd", "asd", "jc"}
    assert np.isfinite(result["dsc"])


def test_checkpoint_roundtrip(fugc_root, tmp_path):
    # valid_freq_iter=1 so a validation (and hence best_model) happens
    trainer = _tiny_trainer(
        fugc_root, tmp_path, num_iters=2, num_rounds=1, valid_freq_iter=1
    )
    trainer.initialize()
    trainer.run_training()
    ckpt = trainer.work_path / "round_0/best_model"
    assert (ckpt / "model.msgpack").is_file()

    trainer2 = _tiny_trainer(fugc_root, tmp_path / "w2", num_iters=1, num_rounds=1)
    trainer2.initialize()
    before = np.asarray(
        trainer2.state.params["decoder"]["seg_output"]["kernel"]
    ).copy()
    trainer2.load_model_checkpoint(ckpt)
    after = np.asarray(trainer2.state.params["decoder"]["seg_output"]["kernel"])
    loaded = np.asarray(trainer.state.params["decoder"]["seg_output"]["kernel"])
    np.testing.assert_array_equal(after, loaded)
    assert not np.array_equal(before, after)


def test_acdc_volume_mode(tmp_path):
    """Volume-mode validation: (1, D, H, W, C) volumes through the bucketed
    on-device metrics program, with rolled CSV spacing."""
    from synth_data import make_acdc

    make_acdc(tmp_path / "data", n_slices=6, n_vols=2, size=(32, 32), depth=3)
    config = _config(
        tmp_path / "data",
        dataset="ACDC",
        in_channels=3,
        num_classes=3,
        valid_mode="volumn",
        num_rounds=1,
        num_iters=2,
        valid_freq_iter=1,
        budget=2,
    )
    trainer = ALTrainer(work_path=tmp_path / "work", config=config, verbose=False)
    import dataclasses

    orig = trainer._unet_config

    def small_cfg():
        return dataclasses.replace(orig(), channels_list=(4, 8))

    trainer._unet_config = small_cfg
    trainer.initialize()
    trainer.run_training()
    assert (trainer.work_path / "test_mean_round_0.csv").is_file()
    # per-class columns for RV/Myo/LV
    header = (trainer.work_path / "test_mean_round_0.csv").read_text().splitlines()[0]
    assert "RV-DSC" in header and "LV-HD" in header


def test_resume_restores_counters_and_data_list(fugc_root, tmp_path):
    """--resume semantics (al_trainer.py:1694-1733): counters offset by 1,
    labeled/pool split restored, optimizer state reloaded."""
    trainer = _tiny_trainer(
        fugc_root, tmp_path, num_iters=2, num_rounds=1, valid_freq_iter=1
    )
    trainer.initialize()
    trainer.run_training()
    ckpt = trainer.work_path / "round_0/final_model"
    assert (ckpt / "training_state.json").is_file()
    assert (ckpt / "opt_state.msgpack").is_file()
    saved = json.loads((ckpt / "training_state.json").read_text())

    trainer2 = _tiny_trainer(
        fugc_root, tmp_path / "w2", num_iters=2, num_rounds=1, valid_freq_iter=1
    )
    trainer2.resume = str(ckpt)
    trainer2.initialize()
    trainer2.on_train_start()  # performs the resume
    assert trainer2.current_iter == saved["current_iter"] + 1
    assert trainer2.current_round == saved["current_round"] + 1
    assert (
        trainer2.active_dataset.data_list()["labeled_image_idx"]
        == saved["data_list"]["labeled_image_idx"]
    )
    assert int(trainer2.state.step) == saved["current_iter"] + 1
