"""Grounding-DINO in JAX: Swin backbone, BERT text encoder, deformable
feature enhancer, language-guided query selection, cross-modality decoder.

Replaces the pip ``groundingdino`` package and its CUDA
MultiScaleDeformableAttention op (reference: tools/segmentation_2d.py:3-8,
SURVEY.md §2.3): deformable attention is expressed as XLA bilinear gathers
(:mod:`beyondff_tpu.models.gdino.deformable`).
"""

from beyondff_tpu.models.gdino.model import GroundingDINO, GDINOConfig, PRESETS  # noqa: F401
