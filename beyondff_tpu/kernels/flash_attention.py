"""Blockwise (flash) attention as a Pallas TPU kernel.

Softmax attention over long token sequences (SAM/EfficientSAM global blocks
run 4096 tokens at ViT-H width) without materializing the (S, S) score matrix
in HBM: the kv axis streams through VMEM with an online max/denominator
rescale, so memory is O(S*D) and the MXU sees back-to-back matmuls.

Used by the model zoo on TPU for attention blocks without positional bias
(CLIP towers, EfficientSAM, text encoders). :func:`attend_relpos` extends the
kernel with SAM's decomposed rel-pos bias, but measured on v5e it does NOT
beat XLA (global 4096-token attention is VPU-softmax-bound: XLA dense+bias
5.6 ms, plain flash 5.3 ms, rel-pos flash 9.6 ms at (16, 4096, 80) — the
bias-expansion selector matmul adds MXU work without removing the VPU
bottleneck), so SAM keeps the XLA path unless BFF_SAM_RELPOS_FLASH is set.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 256
BLOCK_KV = 512
_NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, scale):
    kv_idx = pl.program_id(2)
    nkv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # (BQ, D)
    k = k_ref[0]  # (BKV, D)
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (BQ, BKV)

    m_prev = m_ref[:]  # (BQ, 1)
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)  # (BQ, BKV)
    correction = jnp.exp(m_prev - m_new)  # (BQ, 1)
    l_ref[:] = l_ref[:] * correction + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * correction + jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = m_new

    @pl.when(kv_idx == nkv - 1)
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "scale"))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    interpret: bool = False, scale: float = None) -> jnp.ndarray:
    """q, k, v: (BH, S, D) -> (BH, S, D). S must divide by the block sizes
    (use :func:`attend` for automatic padding); scale defaults to D^-0.5.
    """
    bh, s, d = q.shape
    scale = d ** -0.5 if scale is None else scale
    bq = min(BLOCK_Q, s)
    bkv = min(BLOCK_KV, s)
    grid = (bh, s // bq, s // bkv)
    return pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * s * s * d, bytes_accessed=4 * bh * s * d * 3,
            transcendentals=bh * s * s,
        ),
        interpret=interpret,
    )(q, k, v)


def attend(q, k, v, interpret: bool = False):
    """Padding wrapper: pads S to block multiples (masked keys) and the head
    dim to the 128-lane tile (zero features change nothing)."""
    bh, s, d = q.shape
    if s < BLOCK_Q:
        # small sequences: plain XLA attention is optimal
        scale = d ** -0.5
        logits = jnp.einsum("bqd,bkd->bqk", q * scale, k)
        w = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(q.dtype)
        return jnp.einsum("bqk,bkd->bqd", w, v)
    scale = d ** -0.5  # from the ORIGINAL head dim
    pad_d = (-d) % 128
    if pad_d:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_d)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_d)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_d)))
    pad = (-s) % BLOCK_KV
    if pad:
        qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
        kp = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
        out = _flash_masked(qp, kp, vp, s, interpret, scale)[:, :s]
    else:
        out = flash_attention(q, k, v, interpret=interpret, scale=scale)
    return out[..., :d] if pad_d else out


def _relpos_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, m_ref, l_ref,
                   acc_ref, *, scale, kw, kh):
    """Flash attention with SAM's decomposed relative-position bias.

    bias[q, k] = bias_h[q, k // kw] + bias_w[q, k % kw] where ``k`` walks a
    (kh, kw) grid in raster order (reference: segment_anything
    modeling/image_encoder.py add_decomposed_rel_pos). ``bias_ref`` holds the
    two thin factors concatenated as (BQ, kh+kw); the per-block (BQ, BKV)
    bias is reconstructed with ONE one-hot selector matmul in the inputs'
    dtype — no gathers (Mosaic has none), no f32 MXU work, and the (S, S)
    bias/score matrices never touch HBM.
    """
    kv_idx = pl.program_id(2)
    nkv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # (BQ, D)
    k = k_ref[0]  # (BKV, D)
    v = v_ref[0]
    bkv = k.shape[0]

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (BQ, BKV)

    # selector rows 0..kh-1 expand bias_h over this kv block's grid rows,
    # rows kh..kh+kw-1 tile bias_w over grid columns:
    #   E[r, j]    = ((kv_idx*BKV + j) // kw == r)
    #   E[kh+c, j] = (j % kw == c)
    col = jax.lax.broadcasted_iota(jnp.int32, (kh + kw, bkv), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (kh + kw, bkv), 0)
    # float arithmetic instead of an i1-vector select (Mosaic can't truncate
    # wide vectors to i1)
    is_h = (row < kh).astype(jnp.float32)
    one_h = ((kv_idx * bkv + col) // kw == row).astype(jnp.float32)
    one_w = (col % kw == row - kh).astype(jnp.float32)
    sel = is_h * one_h + (1.0 - is_h) * one_w
    s = s + jax.lax.dot_general(
        bias_ref[0], sel.astype(bias_ref.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)
    corr = jnp.exp(m_prev - m_new)
    l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * corr + jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = m_new

    @pl.when(kv_idx == nkv - 1)
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("kw", "interpret", "scale"))
def flash_attention_relpos(q, k, v, bias_cat, kw: int,
                           scale: float = None, interpret: bool = False):
    """Flash attention over a (kh, kw) raster-ordered token grid with SAM's
    decomposed rel-pos bias.

    q, k, v: (BH, S, D) with S = kh*kw; bias_cat: (BH, S, kh+kw) — the thin
    factors q·Rh[dy] and q·Rw[dx] concatenated on the last axis. The kv block
    size is clamped to a multiple of kw so each block covers whole grid rows.
    """
    bh, s, d = q.shape
    kh = s // kw
    scale = d ** -0.5 if scale is None else scale
    # larger blocks than the plain kernel: the selector matmul adds per-step
    # work, so amortize grid-step overhead harder (VMEM still comfortable at
    # 512x1024 with d<=128)
    bq = min(2 * BLOCK_Q, s)
    bkv = min(2 * BLOCK_KV, s)
    bkv = max(kw, (bkv // kw) * kw)  # whole grid rows per kv block
    if s % bkv or s % bq:
        raise ValueError(f"S={s} must divide by block sizes ({bq}, {bkv})")
    grid = (bh, s // bq, s // bkv)
    return pl.pallas_call(
        functools.partial(_relpos_kernel, scale=scale, kw=kw, kh=kh),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            # full (BQ, kh+kw) factor block (last dim = full array dim, which
            # Mosaic always accepts); the selector matmul picks/ tiles it
            pl.BlockSpec((1, bq, kh + kw), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * s * s * d, bytes_accessed=4 * bh * s * d * 3,
            transcendentals=bh * s * s,
        ),
        interpret=interpret,
    )(q, k, v, bias_cat)


def relpos_shapes_ok(kh: int, kw: int) -> bool:
    """True when a (kh, kw) grid satisfies the rel-pos kernel's static block
    constraints (whole grid rows per kv block, S divisible by both blocks)."""
    s = kh * kw
    if s < BLOCK_Q:
        return False
    bq = min(BLOCK_Q, s)
    bkv = min(BLOCK_KV, s)
    bkv = max(kw, (bkv // kw) * kw)
    return s % bq == 0 and s % bkv == 0 and kw <= bkv


def attend_relpos(q, k, v, bias_h, bias_w, kw: int, interpret: bool = False):
    """Pads the head dim to the 128-lane tile and dispatches to
    :func:`flash_attention_relpos` (S itself must already divide by the
    block sizes — SAM's 64x64 global grid does)."""
    d = q.shape[-1]
    scale = d ** -0.5
    pad_d = (-d) % 128
    if pad_d:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_d)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_d)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_d)))
    bias_cat = jnp.concatenate([bias_h, bias_w], axis=-1).astype(q.dtype)
    out = flash_attention_relpos(q, k, v, bias_cat, kw,
                                 scale=scale, interpret=interpret)
    return out[..., :d] if pad_d else out


def _flash_masked(q, k, v, valid_len: int, interpret: bool, scale: float = None):
    """Flash attention where keys >= valid_len are masked out."""
    bh, s, d = q.shape
    scale = d ** -0.5 if scale is None else scale
    bq = min(BLOCK_Q, s)
    bkv = min(BLOCK_KV, s)
    grid = (bh, s // bq, s // bkv)

    def kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref):
        kv_idx = pl.program_id(2)
        nkv = pl.num_programs(2)

        @pl.when(kv_idx == 0)
        def _():
            m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
            l_ref[:] = jnp.zeros_like(l_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        qq = q_ref[0]
        kk = k_ref[0]
        vv = v_ref[0]
        s_mat = jax.lax.dot_general(
            qq, kk, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        key_pos = kv_idx * bkv + jax.lax.broadcasted_iota(jnp.int32, s_mat.shape, 1)
        s_mat = jnp.where(key_pos < valid_len, s_mat, _NEG_INF)

        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s_mat, axis=1, keepdims=True))
        p = jnp.exp(s_mat - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * corr + jax.lax.dot_general(
            p.astype(vv.dtype), vv, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = m_new

        @pl.when(kv_idx == nkv - 1)
        def _():
            o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)
