"""Regenerate tests/slow_tests.txt from a measured pytest durations log.

The two-tier test suite (VERDICT r4 weak #5) puts every test whose
measured call+setup+teardown time is >= THRESHOLD seconds into the slow
tier — except a curated KEEPS set of one-per-subsystem smokes that stay
fast regardless of cost, so `pytest -m "not slow"` still touches every
subsystem. Tests with explicit @pytest.mark.slow decorators need no
entry here.

Usage:
    python -m pytest tests/ -q --durations=0 > /tmp/durations.log   # ~80 min
    python scripts/retier_tests.py /tmp/durations.log

New tests default to the FAST tier until a timing run lands them here.
"""

from __future__ import annotations

import collections
import re
import sys
from pathlib import Path

THRESHOLD_S = 3.0

# One-per-subsystem smokes pinned to the fast tier regardless of cost.
KEEPS = {
    "tests/test_activelearning.py::test_selectors_end_to_end[random]",
    "tests/test_al_trainer.py::test_test_only_path",
    "tests/test_attention_kernel.py::test_fused_rel_packed_matches_headmajor",
    "tests/test_unet_trainer.py::test_semi_trainer_split_and_run",
    "tests/test_parallel_extras.py::test_eval_program_sharded_matches_single_device",
    "tests/test_metrics.py::test_metric_percase_vs_golden",
    "tests/test_ops.py::TestDistance::test_surface_stats_match_medpy_convention",
    "tests/test_unet.py::test_einsum_upsample_matches_conv_transpose[2-shape0]",
    "tests/test_demo_cli.py::test_serve_entry_drives_ui_cycle_against_stub_gradio",
    "tests/test_export.py::test_unet_export_roundtrip",
}

# Redundant-coverage tests below threshold that still get demoted (their
# subsystem keeps a cheaper representative in the fast tier).
EXTRA_SLOW_PREFIXES = (
    "tests/test_unpartition_residual.py::",  # default-off kernel (PERF §23)
    # default-off upscaler lowering (PERF §27)
    "tests/test_mask_decoder.py::test_upscaler_tap_matches_interleave",
)
EXTRA_SLOW = {
    # duplicates of transforms-level warp/filter goldens
    "tests/test_ops.py::test_connected_components_spiral_iteration_bound",
    "tests/test_ops.py::TestDistance::test_edt_3d",
    "tests/test_ops.py::TestWarp::test_affine_matches_torch_grid_sample[30.0-translate0-1.0-shear0]",
    "tests/test_ops.py::TestFilters::test_simulate_low_res_matches_torch[scales0]",
    # windowed-attention kernel is opt-in (MIA_WINDOWED_ATTN, off by default)
    "tests/test_attention_kernel.py::test_windowed_attention_gate",
    "tests/test_attention_kernel.py::test_fused_attention_forward[256-128]",
    # warp-kernel deep checks; axis-aligned/bitexact reps stay fast
    "tests/test_transforms.py::TestPallasWarp::test_vmap_batches",
    "tests/test_transforms.py::TestPallasWarp::test_label_values_preserved",
    "tests/test_transforms.py::TestPallasWarp::test_rotation_within_one_source_pixel_of_twopass",
    "tests/test_transforms.py::TestTwopassWarp::test_rotation_flip_rate_bounded",
    # one representative per (dtype, pad) family stays fast
    "tests/test_ln_window.py::test_ln_window_gradients[28-28]",
    "tests/test_ln_window.py::test_ln_window_forward[float32-28-28]",
    "tests/test_ln_window.py::test_ln_window_forward[float32-30-18]",
    "tests/test_ln_window.py::test_ln_window_forward[bfloat16-32-32]",
    "tests/test_ln_window.py::test_ln_window_forward[bfloat16-28-28]",
    "tests/test_tp.py::test_tp_forward_matches_single_device[mesh_shape1]",
    "tests/test_tp.py::test_tp_forward_matches_single_device[mesh_shape2]",
    # second-round cuts (module-fixture/compile shifting measured in the
    # assembled fast tier, 2026-08-21): the first fast test of a module
    # inherits its module fixture + first-compile cost
    "tests/test_sam.py::test_dualmask_prompted[all]",
    "tests/test_demo_cli.py::test_demo_batched_inference",
    "tests/test_mask_decoder.py::test_hyper_product_auto_resolves_einsum_off_tpu",
    "tests/test_training.py::test_eval_step_sharded",
    "tests/test_metrics.py::test_per_class_metrics",
    "tests/test_ops.py::TestDistance::test_edt_matches_scipy[spacing1]",
    "tests/test_ops_conv.py::test_grads_match_nn_conv[3-2-8-16-hw1]",
    "tests/test_ops.py::TestMorphology::test_connected_components_partition[2]",
    "tests/test_ops.py::TestFilters::test_simulate_low_res_matches_torch[scales1]",
    "tests/test_attention_kernel.py::test_fused_attention_gradients",
    "tests/test_ops.py::TestWarp::test_affine_matches_torch_grid_sample[-12.5-translate1-0.8-shear1]",
    "tests/test_tp.py::test_tp_forward_matches_single_device[mesh_shape0]",
}


def main(log_path: str) -> None:
    per_test: dict[str, float] = collections.defaultdict(float)
    pat = re.compile(r"([\d.]+)s (?:call|setup|teardown)\s+(\S+)")
    for line in Path(log_path).read_text().splitlines():
        m = pat.match(line.strip())
        if m:
            per_test[m.group(2)] += float(m.group(1))

    newly = sorted(
        set(
            k
            for k, v in per_test.items()
            if v >= THRESHOLD_S and k not in KEEPS
        )
        | set(
            k
            for k in per_test
            if k.startswith(EXTRA_SLOW_PREFIXES) and k not in KEEPS
        )
        | (EXTRA_SLOW & set(per_test))
    )
    fast = sum(v for k, v in per_test.items() if k not in newly)
    out = Path(__file__).parent.parent / "tests" / "slow_tests.txt"
    header = (
        "# Measured-slow tests (>= {thr} s call time) promoted to the slow\n"
        "# tier by tests/conftest.py::pytest_collection_modifyitems. One\n"
        "# nodeid per line; curated fast-tier keeps are simply absent.\n"
        "# Regenerate with scripts/retier_tests.py <durations.log>.\n"
    ).format(thr=THRESHOLD_S)
    out.write_text(header + "\n".join(newly) + "\n")
    print(
        f"{len(newly)} slow entries -> {out}; projected fast-tier call "
        f"time {fast:.0f}s over {len(per_test) - len(newly)} tests"
    )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/durations.log")
