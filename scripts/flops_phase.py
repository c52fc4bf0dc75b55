"""Print XLA-optimized FLOPs of the CPC-SAM phase programs (small config).

A/B harness for trace-time gradient pruning (docs/PERF.md): compares the
post-optimization FLOP count that XLA itself reports, so dead-code
elimination of frozen-weight dW matmuls is visible without runtime noise.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mia_tpu.memories import init_feature_memory
from mia_tpu.training.cpcsam_trainer import CPCSAMConfig, CPCSAMTrainer

cfg = CPCSAMConfig(
    batch_size=2,
    labeled_batch_ratio=0.5,
    image_size=128,
    num_classes=3,
    compute_dtype="bfloat16",
    max_iter=100,
    warmup_iter=5,
    use_contrastive_loss=False,
    use_adv_loss=False,
)
tr = CPCSAMTrainer(work_path="/tmp/flops_cpcsam", config=cfg, verbose=False)
tr.initialize()
tr._setup_loss()
tr._setup_optimizer()
tr._make_programs()
tr.memory = init_feature_memory(cfg.num_classes, 2 * (256 // 16))
rng = np.random.default_rng(0)
images = jnp.asarray(rng.random((cfg.batch_size, 128, 128, 3), np.float32))
labels = jnp.asarray(
    rng.integers(0, cfg.num_classes + 1, (cfg.batch_size, 128, 128)), jnp.int32
)
key = jax.random.PRNGKey(0)
for name, fn in (("phase1", tr._step_phase1), ("phase2", tr._step_phase2)):
    c = fn.lower(
        tr.params, tr.opt_state, tr.memory, images, labels, key, jnp.asarray(0)
    ).compile().cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0]
    print(name, "flops=%.4g" % c.get("flops", float("nan")),
          "bytes=%.4g" % c.get("bytes accessed", float("nan")))
