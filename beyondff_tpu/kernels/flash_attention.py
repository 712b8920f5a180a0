"""Blockwise (flash) attention as a Pallas TPU kernel.

Softmax attention over long token sequences (SAM/EfficientSAM global blocks
run 4096 tokens at ViT-H width) without materializing the (S, S) score matrix
in HBM: the kv axis streams through VMEM with an online max/denominator
rescale, so memory is O(S*D) and the MXU sees back-to-back matmuls.

Used by the model zoo on TPU for attention blocks without positional bias
(CLIP towers, EfficientSAM, text encoders); SAM's decomposed rel-pos blocks
keep the XLA path until the bias recomputation is fused here too.
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
