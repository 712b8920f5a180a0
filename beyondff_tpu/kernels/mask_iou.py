"""Fused boolean-mask pairwise IoU as a Pallas TPU kernel.

The aggregation and refinement stages compute (I, I) IoU matrices over
(I, N) boolean point masks with N in the 100k-300k range (reference does this
as a cuBLAS float matmul after materializing float casts,
tools/projection_2d_to_3d.py:149-166). This kernel streams int8 mask tiles
HBM -> VMEM once, computes the intersection matmul on the MXU in the same
pass as the per-row area reduction, and emits IoU directly — no float copy of
the masks ever hits HBM.

Grid: (I/TI, I/TJ, N/TN). The N axis is innermost so the (TI, TJ) accumulator
stays resident in VMEM across the whole contraction; areas accumulate on the
first row/column of tiles only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_I = 128
TILE_N = 2048


def _iou_kernel(a_ref, b_ref, out_ref, inter_ref, area_a_ref, area_b_ref):
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        inter_ref[:] = jnp.zeros_like(inter_ref)
        area_a_ref[:] = jnp.zeros_like(area_a_ref)
        area_b_ref[:] = jnp.zeros_like(area_b_ref)

    a = a_ref[:].astype(jnp.float32)  # (TI, TN)
    b = b_ref[:].astype(jnp.float32)  # (TJ, TN)
    inter_ref[:] += jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    area_a_ref[:] += jnp.sum(a, axis=1, keepdims=True)  # (TI, 1)
    area_b_ref[:] += jnp.sum(b, axis=1, keepdims=True)  # (TJ, 1)

    @pl.when(k == nk - 1)
    def _():
        union = area_a_ref[:] + area_b_ref[:].T - inter_ref[:]
        out_ref[:] = inter_ref[:] / union


@functools.partial(jax.jit, static_argnames=("interpret",))
def pairwise_iou_pallas(a: jnp.ndarray, b: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """(Ia, N) x (Ib, N) int8/bool masks -> (Ia, Ib) float32 IoU.

    Row counts must be multiples of TILE_I and N a multiple of TILE_N
    (callers pad; padded rows yield nan = 0/0, padded columns contribute 0).
    """
    ia, n = a.shape
    ib = b.shape[0]
    a8 = a.astype(jnp.int8)
    b8 = b.astype(jnp.int8)
    grid = (ia // TILE_I, ib // TILE_I, n // TILE_N)
    return pl.pallas_call(
        _iou_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_I, TILE_N), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_I, TILE_N), lambda i, j, k: (j, k), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_I, TILE_I), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ia, ib), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TILE_I, TILE_I), jnp.float32),
            pltpu.VMEM((TILE_I, 1), jnp.float32),
            pltpu.VMEM((TILE_I, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * ia * ib * n, bytes_accessed=(ia + ib) * n + 4 * ia * ib,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a8, b8)


def pad_and_iou(a, b=None, interpret: bool = False) -> jnp.ndarray:
    """Convenience wrapper: pads shapes to tile multiples and slices back."""
    import numpy as np

    a = jnp.asarray(a)
    b_arr = a if b is None else jnp.asarray(b)
    ia, n = a.shape
    ib = b_arr.shape[0]
    pi = -ia % TILE_I
    pj = -ib % TILE_I
    pn = -n % TILE_N
    a_p = jnp.pad(a, ((0, pi), (0, pn)))
    b_p = a_p if b is None else jnp.pad(b_arr, ((0, pj), (0, pn)))
    out = pairwise_iou_pallas(a_p, b_p, interpret=interpret)
    return out[:ia, :ib]
