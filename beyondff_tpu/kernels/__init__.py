"""Pallas TPU kernels for the pipeline's hot ops.

Kernels here slot in behind the same signatures as their XLA counterparts in
:mod:`beyondff_tpu.core` and :mod:`beyondff_tpu.models`; selection is
automatic on TPU and falls back to XLA elsewhere (tests exercise kernels in
interpreter mode).
"""
