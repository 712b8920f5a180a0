"""Fine-tuning support: sharded train steps for adapting the model zoo.

The reference has no training loop (SURVEY.md intro); this module exists for
adapting the 2D models to new domains (e.g. contrastive CLIP tuning on scene
vocabulary, SAM decoder tuning on lifted pseudo-labels) and provides the
dp x tp sharded train step exercised by the multi-chip dry run.
"""

from beyondff_tpu.training.trainer import TrainState, clip_contrastive_loss, make_sharded_train_step  # noqa: F401
