"""Host-side utilities: stage IO contracts, resume checkpoints, timing."""
