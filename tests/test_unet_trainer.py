"""K-fold UNetTrainer + SemiTrainer end-to-end on synthetic FUGC."""

import dataclasses

import numpy as np

from synth_data import make_fugc


def _shrink(trainer):
    orig = trainer._unet_config

    def small():
        return dataclasses.replace(orig(), channels_list=(4, 8))

    trainer._unet_config = small
    return trainer


def test_kfold_unet_trainer(tmp_path):
    from mia_tpu.training.unet_trainer import UNetTrainer

    make_fugc(tmp_path / "data", n_train=10, size=(32, 32))
    config = dict(
        seed=5,
        dataset="fugc",
        data_path=str(tmp_path / "data"),
        in_channels=3,
        num_classes=2,
        image_size=32,
        batch_size=2,
        valid_mode="slice",
        valid_freq_iter=1,
        lr_warmup_iter=1,
        do_augment=False,
        do_normalize=True,
        dropout_prob=0.0,
    )
    trainer = _shrink(
        UNetTrainer(
            work_path=tmp_path / "work",
            config=config,
            verbose=False,
            num_folds=2,
            valid_rate=0.2,
            fold="all",
            num_epochs=1,
        )
    )
    trainer.initialize()

    # split generation: disjoint, all folds cover the same case set
    splits = trainer._get_split_dicts([f"c{i}" for i in range(10)])
    assert len(splits) == 2
    for s in splits:
        assert not (set(s["train"]) & set(s["valid"]))
        assert len(s["valid"]) == 2
        trainer._assert_no_data_leak(s)

    trainer.run_training()
    work = trainer.work_path
    for f in range(2):
        # per-fold checkpoints in the fugc2025_predict ensemble layout
        assert (work / f"fold_{f}/model.msgpack").is_file()
        assert (work / f"fold_{f}/round_0/best_model/model.msgpack").is_file()
        assert (work / f"fold_{f}/test_mean_round_0.csv").is_file()


def test_semi_trainer_split_and_run(tmp_path):
    from mia_tpu.training.unet_trainer import SemiTrainer

    make_fugc(tmp_path / "data", n_train=10, size=(32, 32))
    config = dict(
        seed=5,
        dataset="fugc",
        data_path=str(tmp_path / "data"),
        in_channels=3,
        num_classes=2,
        image_size=32,
        batch_size=2,
        valid_mode="slice",
        num_iters=2,
        valid_freq_iter=10,
        lr_warmup_iter=1,
        do_normalize=True,
        do_oversample=True,
        dropout_prob=0.0,
    )
    trainer = _shrink(
        SemiTrainer(
            work_path=tmp_path / "work",
            config=config,
            verbose=False,
            labeled_ratio=0.25,
            valid_rate=0.2,
        )
    )
    trainer.initialize()
    trainer.run_training()
    # labeled/unlabeled/valid split by ratio (semi_trainer.py:245-282)
    split = trainer.split_dict
    assert len(split["valid"]) == 2
    assert len(split["labeled"]) == 2  # 25% of the remaining 8
    assert len(split["unlabeled"]) == 6
    assert (trainer.work_path / "round_0/final_model/model.msgpack").is_file()
