"""Phase-timed AL round (bench.py::bench_al_round config) — where does the
steady-state round wall clock go?

Usage:  MIA_COMPILATION_CACHE=~/.cache/mia_pc python scripts/profile_al_round.py
Prints a per-round breakdown: select / build+loader / train steps / valid
epochs / round-end (ckpt save + real test + CSV) / other.
"""

from __future__ import annotations

import os
import shutil
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, "tests")
sys.path.insert(0, ".")

from synth_data import make_fugc  # noqa: E402

from mia_tpu.training.al_trainer import ALTrainer  # noqa: E402


def main():
    root = Path("/tmp/profile_al_round")
    shutil.rmtree(root, ignore_errors=True)
    root.mkdir(parents=True)
    make_fugc(root / "data", n_train=200, n_val=4, n_test=2, size=(384, 512))

    rounds = []

    class ProfiledALTrainer(ALTrainer):
        _t = defaultdict(float)  # initialize() calls _build_model pre-round

        def on_round_start(self):
            self._t = defaultdict(float)
            self._round_t0 = time.perf_counter()
            t0 = time.perf_counter()
            super().on_round_start()
            self._t["round_start(select+build+loader)"] = time.perf_counter() - t0

        def _build_model(self, round_key=0):
            t0 = time.perf_counter()
            out = super()._build_model(round_key=round_key)
            self._t["  round_start/_build_model"] += time.perf_counter() - t0
            return out

        def _setup_active_selector(self):
            super()._setup_active_selector()
            inner = self.active_selector.select_next_batch
            me = self

            def timed(*a, **k):
                t0 = time.perf_counter()
                out = inner(*a, **k)
                me._t["  round_start/select"] += time.perf_counter() - t0
                return out

            self.active_selector.select_next_batch = timed

        def train_step(self, batch):
            t0 = time.perf_counter()
            super().train_step(batch)
            self._t["train_steps"] += time.perf_counter() - t0

        def valid(self):
            t0 = time.perf_counter()
            super().valid()
            self._t["valid_epochs"] += time.perf_counter() - t0

        def on_round_end(self):
            t0 = time.perf_counter()
            ckpt_path = self.work_path / f"round_{self.current_round}/final_model"
            self.save_state_dict(ckpt_path, True)
            self._restore_best(
                self.work_path / f"round_{self.current_round}/best_model"
            )
            self._t["round_end/save+restore"] = time.perf_counter() - t0
            t0 = time.perf_counter()
            self.perform_real_test()
            self._t["round_end/real_test"] = time.perf_counter() - t0
            self.current_round += 1
            total = time.perf_counter() - self._round_t0
            self._t["TOTAL"] = total
            self._t["other"] = total - sum(
                v for k, v in self._t.items()
                if k not in ("TOTAL", "other") and not k.startswith(" ")
            )
            rounds.append(dict(self._t))

    trainer = ProfiledALTrainer(
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
            num_rounds=int(os.environ.get("MIA_PROFILE_ROUNDS", "2")),
            budget=20,
            active_selector_name="entropy",
            num_iters=50,
            valid_freq_iter=50,
            do_augment=True,
            do_normalize=True,
            do_oversample=True,
            compute_dtype="bfloat16",
            log_every_iters=int(os.environ.get("MIA_LOG_EVERY", "1")),
        ),
        verbose=False,
    )
    trainer.initialize()
    t0 = time.perf_counter()
    trainer.run_training()
    wall = time.perf_counter() - t0

    for i, r in enumerate(rounds):
        print(f"--- round {i} ---")
        for k, v in sorted(r.items(), key=lambda kv: -kv[1]):
            print(f"  {k:40s} {v:7.2f} s")
    print(f"total run_training wall: {wall:.1f} s")


if __name__ == "__main__":
    main()
