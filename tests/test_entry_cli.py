"""Console-entry argv paths: al_train --test-only and cpcsam_train."""

import dataclasses

import numpy as np

from synth_data import make_acdc, make_fugc


def test_al_train_test_only_cli(tmp_path):
    from mia_tpu.entry.activelearning.train import train_entry
    import mia_tpu.training.al_trainer as alt

    make_fugc(tmp_path / "data", n_train=6, size=(32, 32))

    # shrink the UNet via config hook
    orig = alt.ALTrainer._unet_config

    def small(self):
        return dataclasses.replace(orig(self), channels_list=(4, 8))

    alt.ALTrainer._unet_config = small
    try:
        trainer = train_entry(
            [
                "--data-path", str(tmp_path / "data"), "--dataset", "fugc",
                "--in-channels", "3", "--num-classes", "2", "--image-size", "32",
                "--batch-size", "2", "--valid-mode", "slice", "--test-only",
                "--work-path", str(tmp_path / "w"), "--quiet", "--dropout-prob", "0",
            ]
        )
    finally:
        alt.ALTrainer._unet_config = orig
    assert (trainer.work_path / "test_mean_round_0.csv").is_file()


def test_cpcsam_train_cli(tmp_path):
    from mia_tpu.entry.cpcsam.train import train_entry
    import mia_tpu.models.sam.build_sam as bs
    from mia_tpu.training import cpcsam_trainer as ct

    make_acdc(tmp_path / "data", n_slices=8, n_vols=1, size=(32, 32), depth=2)

    orig = bs._VIT_SPECS["vit_b"]
    bs._VIT_SPECS["vit_b"] = dict(embed_dim=32, depth=1, num_heads=2, global_idx=(0,))
    ct.PATIENTS_TO_SLICES["ACDC"]["1"] = 4
    try:
        trainer = train_entry(
            [
                "--data-path", str(tmp_path / "data"), "--labeled-num", "1",
                "--image-size", "32", "--batch-size", "4", "--lora-rank", "2",
                "--min-iter", "1", "--max-iter", "1", "--warmup-iter", "100",
                "--valid-freq-iter", "100", "--lr-warmup-iter", "1",
                "--num-epochs", "1", "--work-path", str(tmp_path / "w"), "--quiet",
            ]
        )
    finally:
        bs._VIT_SPECS["vit_b"] = orig
        ct.PATIENTS_TO_SLICES["ACDC"]["1"] = 32
    assert (trainer.work_path / "final_model/lora.msgpack").is_file()
    assert (trainer.work_path / "test_mean.csv").is_file()
    assert np.isfinite(trainer.epoch_train_outputs[0]["loss"][0])
