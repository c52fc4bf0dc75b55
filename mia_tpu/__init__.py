"""mia_tpu — TPU-native active-learning medical image segmentation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
trnKhanh/medical-image-analysis (FUGC 2025-winning PyTorch stack):

- round-based active learning of a 2D UNet (``mia_tpu.training.ALTrainer``)
- fused on-device augmentation pipeline (``mia_tpu.transforms``)
- Dice+CE training with poly-warmup LR (``mia_tpu.losses``, ``mia_tpu.training``)
- on-device Dice/HD/HD95/ASD/Jaccard metrics (``mia_tpu.metrics``)
- jit-compiled pool-acquisition engine: random / entropy / confidence /
  margin / coreset k-center / weighted k-means++ / BADGE
  (``mia_tpu.activelearning``)
- multi-chip scaling via ``jax.sharding`` meshes (``mia_tpu.parallel``)

Design: functional core (pure jitted programs for train/eval/score), thin
imperative host shell for the AL round loop, checkpointing, and logging.
All device code uses NHWC layout and static shapes.
"""

__version__ = "0.1.0"
