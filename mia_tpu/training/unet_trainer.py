"""K-fold supervised FUGC trainer + LA2018-style semi scaffold.

The reference's ``UNetTrainer`` (``src/training/unet_trainer.py``) and
``SemiTrainer`` (``semi_trainer.py``) are STALE — written against an older
UNet/dataset API and unable to run (SURVEY.md §2.1). Per the build plan,
these implement the *intended* behavior on the working TPU core:

- ``UNetTrainer``: cross-fold split generation over the train set with a
  no-data-leak assertion (``unet_trainer.py:205-244, 385-413``), one
  supervised run per fold, per-fold ``fold_<i>/`` checkpoints in the layout
  ``fugc2025_predict`` consumes.
- ``SemiTrainer``: labeled/unlabeled/valid split by ``labeled_ratio``
  (``semi_trainer.py:245-282``); the reference's loop is purely supervised
  on the labeled split — matched here.

Both reuse the ALTrainer functional core (jitted train/eval programs) with
active learning disabled.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..data import ActiveDataset, BatchLoader, ExtendableDataset
from .al_trainer import ALTrainer


class UNetTrainer(ALTrainer):
    def __init__(
        self,
        *,
        num_folds: int = 5,
        valid_rate: float = 0.2,
        fold: int | str = "all",
        num_epochs: int | None = None,
        split_dicts: dict | None = None,
        **kwargs,
    ):
        kwargs.setdefault("config", {})
        if isinstance(kwargs["config"], dict):
            kwargs["config"].setdefault("active_learning", False)
        super().__init__(**kwargs)
        self.num_folds = num_folds
        self.valid_rate = valid_rate
        self.fold = fold
        self.num_epochs = num_epochs
        self.split_dicts = split_dicts

    # -- splits ---------------------------------------------------------
    def _get_split_dicts(self, case_names: list[str]) -> list[dict]:
        """Random cross-fold splits (``unet_trainer.py:385-413``): each fold
        holds out a disjoint ``valid_rate`` block."""
        if self.split_dicts is not None:
            return self.split_dicts
        rng = np.random.default_rng(self.seed)
        order = list(rng.permutation(case_names))
        n_valid = max(1, int(len(order) * self.valid_rate))
        splits = []
        for f in range(self.num_folds):
            lo = (f * n_valid) % len(order)
            valid = order[lo : lo + n_valid]
            if len(valid) < n_valid:  # wrap around
                valid = valid + order[: n_valid - len(valid)]
            train = [c for c in order if c not in set(valid)]
            splits.append({"train": train, "valid": valid})
        return splits

    @staticmethod
    def _assert_no_data_leak(split_dict: dict):
        """Train/valid must be disjoint (``unet_trainer.py:234-244``)."""
        overlap = set(split_dict["train"]) & set(split_dict["valid"])
        assert not overlap, f"data leak between train and valid: {overlap}"

    # -- per-fold data --------------------------------------------------
    def get_data(self):
        base_train = self.get_dataset("train")
        base_valid_view = self.get_dataset("train")
        split = self._fold_split
        self._assert_no_data_leak(split)

        ex_labeled = ExtendableDataset(base_train, list(split["train"]))
        ex_pool = ExtendableDataset(base_train, [])
        active_dataset = ActiveDataset(ex_labeled, ex_pool)
        valid_dataset = ExtendableDataset(base_valid_view, list(split["valid"]))
        valid_dataset.CLASSES = getattr(base_valid_view, "CLASSES", {})

        valid_loader = BatchLoader(
            valid_dataset,
            batch_size=self.config.valid_batch_size,
            shuffle=False,
            drop_last=False,
            device_put=False,
        )
        return base_train, base_train, valid_dataset, active_dataset, valid_loader

    def on_round_start(self):
        # supervised: the labeled set is fixed by the fold split
        super_data_list = self.work_path / f"round_{self.current_round}/data_list.json"
        self.active_dataset.save_data_list(super_data_list)
        self.train_dataloader = self.get_train_dataloader(self.active_dataset)
        self.current_epoch = 0
        self.current_iter = 0
        self.current_patience = 0
        import jax.numpy as jnp

        self.state = self.state.replace(step=jnp.zeros((), jnp.int32))
        default = -np.inf if self.config.maximum_save_metric else np.inf
        self._best_valid_metric = default
        self._cur_valid_metric = default
        self.logger.info(f"Fold {self._fold_index}: train "
                         f"{len(self.active_dataset.labeled_dataset)} / valid "
                         f"{len(self.valid_dataset)}")

    def run_training(self):
        base = self.get_dataset("train")
        splits = self._get_split_dicts(base.case_names())
        folds = range(self.num_folds) if self.fold == "all" else [int(self.fold)]
        root_work = self.work_path
        for f in folds:
            self._fold_index = f
            self._fold_split = splits[f]
            self.work_path = root_work / f"fold_{f}"
            self.work_path.mkdir(parents=True, exist_ok=True)
            if self.num_epochs is not None:
                iters_per_epoch = max(
                    len(self._fold_split["train"]) // self.config.batch_size, 1
                )
                self.config.num_iters = self.num_epochs * iters_per_epoch
            self._build_model(round_key=f)
            self.train()
            # alias best checkpoint into the predict-ensemble layout
            best = self.work_path / "round_0/best_model/model.msgpack"
            if best.is_file():
                (self.work_path / "model.msgpack").write_bytes(best.read_bytes())
        self.work_path = root_work


class SemiTrainer(ALTrainer):
    """Labeled-ratio split scaffold (``semi_trainer.py:51, 245-282``); the
    training loop is supervised on the labeled split, like the reference."""

    def __init__(self, *, labeled_ratio: float = 0.1, valid_rate: float = 0.2, **kwargs):
        kwargs.setdefault("config", {})
        if isinstance(kwargs["config"], dict):
            kwargs["config"].setdefault("active_learning", False)
        super().__init__(**kwargs)
        self.labeled_ratio = labeled_ratio
        self.valid_rate = valid_rate

    def get_random_split_dict(self, case_names: list[str]) -> dict:
        rng = np.random.default_rng(self.seed)
        order = list(rng.permutation(case_names))
        n_valid = max(1, int(len(order) * self.valid_rate))
        n_labeled = max(1, int((len(order) - n_valid) * self.labeled_ratio))
        return {
            "valid": order[:n_valid],
            "labeled": order[n_valid : n_valid + n_labeled],
            "unlabeled": order[n_valid + n_labeled :],
        }

    def get_data(self):
        base = self.get_dataset("train")
        split = self.get_random_split_dict(base.case_names())
        assert not (set(split["labeled"]) & set(split["valid"]))

        ex_labeled = ExtendableDataset(base, list(split["labeled"]))
        ex_pool = ExtendableDataset(base, list(split["unlabeled"]))
        active_dataset = ActiveDataset(ex_labeled, ex_pool)
        valid_dataset = ExtendableDataset(self.get_dataset("train"), list(split["valid"]))
        valid_dataset.CLASSES = getattr(base, "CLASSES", {})
        valid_loader = BatchLoader(
            valid_dataset,
            batch_size=self.config.valid_batch_size,
            shuffle=False,
            drop_last=False,
            device_put=False,
        )
        self.split_dict = split
        return base, base, valid_dataset, active_dataset, valid_loader

    def on_round_start(self):
        self.active_dataset.save_data_list(
            self.work_path / f"round_{self.current_round}/data_list.json"
        )
        self.train_dataloader = self.get_train_dataloader(self.active_dataset)
        self.current_epoch = 0
        self.current_iter = 0
        self.current_patience = 0
        import jax.numpy as jnp

        self.state = self.state.replace(step=jnp.zeros((), jnp.int32))
        default = -np.inf if self.config.maximum_save_metric else np.inf
        self._best_valid_metric = default
        self._cur_valid_metric = default
