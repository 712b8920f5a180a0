"""JAX model zoo: CLIP, SAM, EfficientSAM, Grounding-DINO, YOLO-World.

Every model the reference consumes from PyTorch pip packages
(SURVEY.md §2.3) is rebuilt here as a flax module with a checkpoint converter
from the corresponding public torch weights. Inference entry points are
jit-compiled, batched, and bf16-ready.
"""
